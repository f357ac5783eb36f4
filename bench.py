"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric: crawl-round throughput — URLs scheduled+deduped per second
over the synthetic bench corpus (the north-star metric of BASELINE.json),
plus per-query wall times for the headline queries() entries at
$SPARK_GRAFT_SF_DIR.

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] cores (default 32)
  BENCH_HOSTS/BENCH_PAGES/BENCH_HOT   crawl corpus tier (default 500x1000, hot 10
                       -> ~510k pages; the corpus parquet is cached in /tmp)
  BENCH_ROUNDS         crawl rounds to run (default 8)

NOTE (round 2): the crawl now routes fetches like the reference
(301/302 redirects recorded-not-followed, MIME allowlist, size gate), so
~31% of pages contribute no out-links and the BFS frontier is thinner than
round 1's at the same corpus — the r1 headline (6200 URLs/s over 6 rounds)
is not comparable to r2+ numbers. Default rounds raised 6 -> 8 so the
steady-state frontier amortizes the fixed per-round cost.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "window_topk_orders",
    "agg_distinct_events",
    "sessionize_events",
    "host_budget_window",
    "seen_anti_join",
    "tfidf_postings",
    "term_search_top100",
    "dedup_exact_docs",
    "minhash_lsh_dups",
    "simhash_dups",
    "ngram_jaccard_dups",
    "embedding_cosine_topk",
    "ann_ivf_topk",
    "asof_last_click",
    "fetch_routing_crawl",
    "pagerank_5iter",
]


def corpus_parquet(hosts: int, pages: int, hot: int, spark=None) -> str:
    """Deterministic corpus cached on disk across bench runs. With a spark
    session the build is distributed (per-host seeding -> identical rows)."""
    from cis455crawler_spark.sources.corpus import (
        CorpusSpec,
        write_pages_parquet,
        write_pages_parquet_spark,
    )

    # cache key carries the generator seed AND a generator-version tag: a
    # change to the corpus generator must invalidate pre-existing /tmp
    # caches, or benchmarks silently compare runs over different corpora
    spec = CorpusSpec(hosts=hosts, pages_per_host=pages, hot_factor=hot)
    from cis455crawler_spark.sources import corpus as corpus_mod

    gen_ver = getattr(corpus_mod, "GENERATOR_VERSION", 1)
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_corpus_h{hosts}_p{pages}_x{hot}_s{spec.seed}_g{gen_ver}.parquet",
    )
    if not os.path.exists(path):
        if spark is not None:
            write_pages_parquet_spark(spark, spec, path)
        else:
            write_pages_parquet(spec, path)
    return path


def crawl_throughput(spark, rounds: int, hosts: int, pages: int, hot: int) -> dict:
    from cis455crawler_spark.plans.crawl import CrawlConfig, run_crawl
    from cis455crawler_spark.sources.corpus import CorpusSpec, seed_urls

    spec = CorpusSpec(hosts=hosts, pages_per_host=pages, hot_factor=hot)
    # pre-partition pages on the join key ONCE (the sandbox analogue of
    # Iceberg bucketing): every round's fetch join then reuses this
    # partitioning and only the small scheduled side shuffles — without it the
    # full html column reshuffles every round. DISK_ONLY, not heap: a
    # deserialized 5 GB html cache makes GC scale with mutator threads and
    # INVERTS core-count scaling; disk blocks ride the OS page cache instead.
    from pyspark import StorageLevel

    pages_df = (
        spark.read.parquet(corpus_parquet(hosts, pages, hot, spark=spark))
        .repartition(64, "url")
        .persist(StorageLevel.DISK_ONLY)
    )
    pages_df.count()
    # spin up every Python worker + fault the html cache blocks before the
    # clock starts — an unwarmed first round costs ~30 s of worker/disk/JIT
    # startup on this VM (measured), which is harness noise, not engine cost
    from cis455crawler_spark.functions.html import parse_page_udf

    pages_df.limit(50_000).select(parse_page_udf("html")).count()

    state_dir = tempfile.mkdtemp(prefix="bench_crawl_")
    cfg = CrawlConfig(
        max_rounds=rounds, max_pages=10_000_000, round_duration_s=3600, compact_every=0
    )
    t0 = time.time()
    _, metrics = run_crawl(spark, pages_df, seed_urls(spec, n_seeds=hosts), state_dir, cfg)
    wall = time.time() - t0
    shutil.rmtree(state_dir, ignore_errors=True)
    pages_df.unpersist()

    processed = sum(m["scheduled"] + m["deduped"] for m in metrics)
    return {
        "rounds": len(metrics),
        "urls_scheduled_deduped": processed,
        "wall_s": round(wall, 3),
        "throughput_per_s": round(processed / wall, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    hosts = int(os.environ.get("BENCH_HOSTS", "500"))
    pages = int(os.environ.get("BENCH_PAGES", "1000"))
    hot = int(os.environ.get("BENCH_HOT", "10"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "8"))

    import __spark_entry__ as entry_mod
    from cis455crawler_spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="bench")
    # warmup: JVM + parquet footers
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qtimes: dict[str, float] = {}
    qs = entry_mod.queries()
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        # noop sink, not count(): a bare count lets Catalyst prune every
        # unreferenced projection, so map-heavy queries would be under-timed
        df.write.format("noop").mode("overwrite").save()
        qtimes[name] = round(time.time() - t0, 3)

    crawl = crawl_throughput(spark, rounds, hosts, pages, hot)

    out = {
        "metric": "urls_scheduled_deduped_per_sec",
        "value": crawl["throughput_per_s"],
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "crawl": crawl,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
