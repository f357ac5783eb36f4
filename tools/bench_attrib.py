"""Round-4 attribution bench (VERDICT r3 next-round #5 and #1).

Two questions, one JSON line each section:

1. headline-dip attribution: is the r2->r3 gen-1 dip (3675 -> 3127 URLs/s)
   added work (meta extraction joined the parse kernel in r3), noise, or a
   regression? ABBA-interleaved full gen-1 crawls over the SAME bench
   corpus: A = current parse kernel (hrefs+text+meta), B = meta-less kernel
   (r2 shape), A B B A, plus a kernel-only microbench (noop-sink Arrow pass
   over the corpus html with and without the meta kernel).

2. bloom prefilter at 4x bucket count: gen-1 bloom-enabled crawls at
   num_buckets=32 (default) and 128 — the partition-local probe's cost must
   stay flat-to-better as the bucket count scales (more, smaller bitmaps;
   one probe task each).

Usage:  python tools/bench_attrib.py [--rounds 8]
Prints one JSON line. Run alone on the VM (co-tenant noise ±30-50%).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402


def metaless_parse_udf():
    """The round-2 parse kernel shape: hrefs+text only, meta column NULL —
    same struct schema so the crawl plan is otherwise identical."""
    from cis455crawler_spark.functions.html import extract_hrefs_py, extract_text_py

    @pandas_udf(
        T.StructType(
            [
                T.StructField("hrefs", T.ArrayType(T.StringType())),
                T.StructField("text", T.StringType()),
                T.StructField("meta", T.StringType()),
            ]
        )
    )
    def parse_metaless(html: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "hrefs": html.map(extract_hrefs_py),
                "text": html.map(extract_text_py),
                "meta": None,
            }
        )

    return parse_metaless


def one_crawl(spark, pages_df, seeds, rounds: int, kernel=None, **cfg_kw) -> dict:
    import cis455crawler_spark.plans.crawl as crawl_mod
    from cis455crawler_spark.plans.crawl import CrawlConfig, run_crawl

    orig = crawl_mod.parse_page_udf
    if kernel is not None:
        crawl_mod.parse_page_udf = kernel
    try:
        state = tempfile.mkdtemp(prefix="attrib_")
        cfg = CrawlConfig(
            max_rounds=rounds, max_pages=10_000_000, round_duration_s=3600,
            compact_every=0, **cfg_kw,
        )
        t0 = time.time()
        _, metrics = run_crawl(spark, pages_df, seeds, state, cfg)
        wall = time.time() - t0
        shutil.rmtree(state, ignore_errors=True)
        processed = sum(m["scheduled"] + m["deduped"] for m in metrics)
        return {
            "urls": processed,
            "wall_s": round(wall, 2),
            "per_s": round(processed / wall, 1),
        }
    finally:
        crawl_mod.parse_page_udf = orig


def kernel_micro(spark, pages_df, kernel, label: str) -> float:
    t0 = time.time()
    pages_df.select(kernel("html").alias("p")).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.time() - t0, 2)


def main() -> None:
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) if "--rounds" in sys.argv else 8
    hosts, pages, hot = 500, 1000, 10

    from bench import corpus_parquet
    from cis455crawler_spark.functions.html import parse_page_udf
    from cis455crawler_spark.session import get_spark
    from cis455crawler_spark.sources.corpus import CorpusSpec, seed_urls
    from pyspark import StorageLevel

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      app_name="bench_attrib")
    spec = CorpusSpec(hosts=hosts, pages_per_host=pages, hot_factor=hot)
    pages_df = (
        spark.read.parquet(corpus_parquet(hosts, pages, hot, spark=spark))
        .repartition(64, "url")
        .persist(StorageLevel.DISK_ONLY)
    )
    pages_df.count()
    metaless = metaless_parse_udf()
    # warm workers + page cache (noop sink; count() would prune the UDF)
    pages_df.limit(50_000).select(parse_page_udf("html")).write.format("noop").mode(
        "overwrite"
    ).save()
    seeds = seed_urls(spec, n_seeds=hosts)

    # --- kernel-only microbench (full corpus, ABBA) ---
    k_full_1 = kernel_micro(spark, pages_df, parse_page_udf, "full")
    k_less_1 = kernel_micro(spark, pages_df, metaless, "metaless")
    k_less_2 = kernel_micro(spark, pages_df, metaless, "metaless")
    k_full_2 = kernel_micro(spark, pages_df, parse_page_udf, "full")

    # --- crawl-level ABBA: A=current kernel, B=metaless (r2 shape) ---
    a1 = one_crawl(spark, pages_df, seeds, rounds)
    b1 = one_crawl(spark, pages_df, seeds, rounds, kernel=metaless)
    b2 = one_crawl(spark, pages_df, seeds, rounds, kernel=metaless)
    a2 = one_crawl(spark, pages_df, seeds, rounds)

    # --- bloom prefilter at 1x and 4x bucket count ---
    bl32 = one_crawl(spark, pages_df, seeds, rounds, use_bloom=True, num_buckets=32)
    bl128 = one_crawl(spark, pages_df, seeds, rounds, use_bloom=True, num_buckets=128)

    best = lambda x, y: max(x["per_s"], y["per_s"])
    out = {
        "metric": "attribution",
        "rounds": rounds,
        "kernel_noop_s": {
            "full_meta": [k_full_1, k_full_2],
            "metaless": [k_less_1, k_less_2],
        },
        "crawl_full_meta": [a1, a2],
        "crawl_metaless": [b1, b2],
        "best_full_per_s": best(a1, a2),
        "best_metaless_per_s": best(b1, b2),
        "meta_overhead_pct": round(
            100.0 * (best(b1, b2) - best(a1, a2)) / best(b1, b2), 1
        ),
        "bloom_buckets_32": bl32,
        "bloom_buckets_128": bl128,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
