"""spark-submit entry point — the north_rule's shipping shape:

    python tools/make_dist.py                       # builds dist/cis455crawler_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/cis455crawler_spark.zip \\
        tools/submit_crawl.py <state_dir> [hosts] [pages_per_host] [max_rounds]

The script imports the engine ONLY from the shipped zip (it must not rely on
the repo being present on the executors' or driver's PYTHONPATH), generates
the deterministic corpus, runs a crawl, and prints one JSON summary line.
On a real cluster the corpus/pages source would be the Iceberg pages table;
everything else is identical.

tests/test_submit.py drives this end-to-end via a real spark-submit
subprocess against local[4].
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    state_dir = sys.argv[1]
    hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    pages_per_host = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    max_rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    # deliberately NOT adding the repo to sys.path: the package must resolve
    # from the --py-files zip that spark-submit placed on the driver path
    from pyspark.sql import SparkSession

    from cis455crawler_spark.plans.crawl import CrawlConfig, run_crawl
    from cis455crawler_spark.sources.corpus import (
        CorpusSpec,
        pages_spark_df,
        seed_urls,
    )

    spark = SparkSession.builder.appName("cis455crawler_spark_submit").getOrCreate()
    spec = CorpusSpec(hosts=hosts, pages_per_host=pages_per_host)
    pages = pages_spark_df(spark, spec)
    store, metrics = run_crawl(
        spark,
        pages,
        seed_urls(spec, n_seeds=hosts),
        state_dir,
        CrawlConfig(max_rounds=max_rounds, round_duration_s=3600, compact_every=0),
    )
    summary = {
        "rounds": len(metrics),
        "scheduled": sum(m["scheduled"] for m in metrics),
        "parsed_pages": sum(m["parsed_pages"] for m in metrics),
        "seen_rows": store.read("seen").count(),
        "final_round": store.current_round(),
    }
    print("SUBMIT_SUMMARY " + json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
