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
  BENCH_RECRAWL        1 (default) also runs a generation-2 conditional
                       recrawl over the unchanged corpus and reports its
                       throughput (the 304/If-Modified-Since economy — the
                       most scale-relevant number the engine produces);
                       0 skips it
  BENCH_PASSES         query timing passes (default 2, ABBA-interleaved:
                       pass 1 in list order, pass 2 reversed; reported time
                       is the per-query MIN, so one co-tenant noise spike
                       can't masquerade as a regression — VERDICT r2)

NOTE (round 2): the crawl routes fetches like the reference (301/302
redirects recorded-not-followed, MIME allowlist, size gate), so ~31% of
pages contribute no out-links and the BFS frontier is thinner than round
1's at the same corpus — the r1 headline (6200 URLs/s over 6 rounds) is
not comparable to r2+ numbers.
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
    "agg_distinct_events",
    "sessionize_events",
    "host_budget_window",
    "seen_anti_join",
    "tfidf_postings",
    "term_search_top100",
    "meta_title_rank",
    "search_serve_e2e",
    "dedup_exact_docs",
    "minhash_lsh_dups",
    "simhash_dups",
    "ngram_jaccard_dups",
    "dedup_clusters",
    "dup_span_stats",
    "curate_corpus_e2e",
    "embedding_cosine_topk",
    "ann_ivf_topk",
    "lm_bigram_quality",
    "asof_last_click",
    "fetch_routing_crawl",
    "pagerank_5iter",
    "hits_hubs_auth",
    "anchor_text_postings",
    "boilerplate_strip",
    "cdx_capture_index",
    # round-3 continuation ops
    "bm25_postings_score",
    "phrase_search_adjacent",
    "chunk_documents_windows",
    "pack_token_spans_gpt",
    "training_pipeline_e2e",
    "ann_quantized_topk",
    "trustrank_seeds",
    # round-4 continuation ops
    "semantic_dedup_docs",
    "crawl_trap_hosts",
    "change_rate_poisson_urls",
    "token_zipf_coverage",
    "shard_shuffle_train",
    "postings_varint_size",
    "reciprocal_link_ratio",
    "pld_rollup_hosts",
    # round-4 second continuation ops
    "paragraph_dedup_corpus",
    "line_dedup_docs",
    "text_normalize_nfc",
    "soft404_detect",
    "url_template_mine",
    "cache_ttl_recrawl",
    "wand_block_maxscore",
    "term_dict_frontcode",
    "salsa_hub_auth",
    "mirror_host_detect",
    "containment_dups",
    "bpe_pair_stats",
    "redirect_chains",
    "index_shard_plan16",
    "term_cooccur_pmi",
    "kmv_distinct_hosts",
    "cocitation_pairs_graph",
    "spam_mass_graph",
    "more_like_this_docs",
    "ndcg_eval",
    "robots_delay_budget",
    "degree_assortativity_graph",
    "weighted_sample_docs",
    "script_mix_docs",
    "budget_allocation_hosts",
    "robots_compliance_audit",
    "snapshot_diff_hosts",
    "event_burstiness_types",
    "data_mix_report",
    "url_structure_stats",
    "anchor_consensus_graph",
]


def corpus_parquet(
    hosts: int, pages: int, hot: int, spark=None, words: tuple = (20, 60)
) -> str:
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
    spec = CorpusSpec(
        hosts=hosts, pages_per_host=pages, hot_factor=hot,
        words_min=words[0], words_max=words[1],
    )
    from cis455crawler_spark.sources import corpus as corpus_mod

    gen_ver = getattr(corpus_mod, "GENERATOR_VERSION", 1)
    # fat-page tiers get their own cache entries; the default tier keeps its
    # pre-existing cache name
    wtag = "" if words == (20, 60) else f"_w{words[0]}-{words[1]}"
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_corpus_h{hosts}_p{pages}_x{hot}_s{spec.seed}_g{gen_ver}{wtag}.parquet",
    )
    if not os.path.exists(path):
        if spark is not None:
            write_pages_parquet_spark(spark, spec, path)
        else:
            write_pages_parquet(spec, path)
    return path


def crawl_throughput(
    spark, rounds: int, hosts: int, pages: int, hot: int, recrawl: bool = True,
    words: tuple = (20, 60),
) -> tuple[dict, dict | None]:
    from cis455crawler_spark.plans.crawl import CrawlConfig, run_crawl
    from cis455crawler_spark.sources.corpus import CorpusSpec, seed_urls

    spec = CorpusSpec(
        hosts=hosts, pages_per_host=pages, hot_factor=hot,
        words_min=words[0], words_max=words[1],
    )
    # pre-partition pages on the join key ONCE (the sandbox analogue of
    # Iceberg bucketing): every round's fetch join then reuses this
    # partitioning and only the small scheduled side shuffles — without it the
    # full html column reshuffles every round. DISK_ONLY, not heap: a
    # deserialized 5 GB html cache makes GC scale with mutator threads and
    # INVERTS core-count scaling; disk blocks ride the OS page cache instead.
    from pyspark import StorageLevel

    pages_df = (
        spark.read.parquet(corpus_parquet(hosts, pages, hot, spark=spark, words=words))
        .repartition(64, "url")
        .persist(StorageLevel.DISK_ONLY)
    )
    pages_df.count()
    # spin up every Python worker + fault the html cache blocks before the
    # clock starts — an unwarmed first round costs ~30 s of worker/disk/JIT
    # startup on this VM (measured), which is harness noise, not engine cost.
    # noop sink, NOT count(): count lets Catalyst prune the UDF projection
    # away entirely, leaving workers cold (ADVICE r2)
    from cis455crawler_spark.functions.html import parse_page_udf

    pages_df.limit(50_000).select(parse_page_udf("html")).write.format(
        "noop"
    ).mode("overwrite").save()

    state_dir = tempfile.mkdtemp(prefix="bench_crawl_")
    cfg = CrawlConfig(
        max_rounds=rounds, max_pages=10_000_000, round_duration_s=3600, compact_every=0
    )
    seeds = seed_urls(spec, n_seeds=hosts)

    def _gen(metrics: list[dict], wall: float) -> dict:
        processed = sum(m["scheduled"] + m["deduped"] for m in metrics)
        return {
            "rounds": len(metrics),
            "urls_scheduled_deduped": processed,
            "wall_s": round(wall, 3),
            "throughput_per_s": round(processed / wall, 1),
            "parsed_pages": sum(m["parsed_pages"] for m in metrics),
            "not_modified": sum(m["not_modified"] for m in metrics),
        }

    t0 = time.time()
    _, metrics = run_crawl(spark, pages_df, seeds, state_dir, cfg)
    gen1 = _gen(metrics, time.time() - t0)

    gen2 = None
    if recrawl:
        # generation 2 over the UNCHANGED corpus: every stored page answers
        # 304 and reuses its stored out_links — zero re-parses (O-X9)
        t0 = time.time()
        _, m2 = run_crawl(spark, pages_df, seeds, state_dir, cfg, recrawl=True)
        gen2 = _gen(m2, time.time() - t0)
        gen2["speedup_vs_gen1"] = round(
            gen1["wall_s"] / gen2["wall_s"], 3
        ) if gen2["wall_s"] else None

    shutil.rmtree(state_dir, ignore_errors=True)
    pages_df.unpersist()
    return gen1, gen2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    hosts = int(os.environ.get("BENCH_HOSTS", "500"))
    pages = int(os.environ.get("BENCH_PAGES", "1000"))
    hot = int(os.environ.get("BENCH_HOT", "10"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "8"))
    # BENCH_WORDS="12000,13000" -> ~100 KB html bodies (the fat-page recrawl
    # economy tier); default keeps the tiny synthetic pages
    words = tuple(
        int(x) for x in os.environ.get("BENCH_WORDS", "20,60").split(",")
    )

    recrawl = os.environ.get("BENCH_RECRAWL", "1") == "1"
    passes = int(os.environ.get("BENCH_PASSES", "2"))

    import __spark_entry__ as entry_mod
    from cis455crawler_spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="bench")
    # warmup: JVM + parquet footers
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = entry_mod.queries()
    names = [n for n in BENCH_QUERIES if n in qs]

    def _time_one(name: str) -> float:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        # noop sink, not count(): a bare count lets Catalyst prune every
        # unreferenced projection, so map-heavy queries would be under-timed
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # ABBA-interleaved best-of-N (default 2): pass 0 in list order, pass 1
    # reversed, ... — a co-tenant noise spike hits DIFFERENT queries in each
    # pass, and the per-query MIN is reported (VERDICT r2 bench ambiguity)
    runs: dict[str, list[float]] = {n: [] for n in names}
    for p in range(max(passes, 1)):
        order = names if p % 2 == 0 else list(reversed(names))
        for name in order:
            runs[name].append(_time_one(name))
    qtimes = {n: min(ts) for n, ts in runs.items()}

    crawl, crawl_gen2 = crawl_throughput(
        spark, rounds, hosts, pages, hot, recrawl=recrawl, words=words
    )

    out = {
        "metric": "urls_scheduled_deduped_per_sec",
        "value": crawl["throughput_per_s"],
        "unit": "sec",
        "queries": qtimes,
        "query_passes": {n: ts for n, ts in runs.items()},
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "crawl": crawl,
        "crawl_recrawl_gen2": crawl_gen2,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
