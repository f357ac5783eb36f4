"""Two-parallelism scaling evidence (sandbox proxy for the north_rule's
N -> 4N executor criterion): run the SAME crawl-round job at local[8] and
local[32] on identical input and report throughput at both plus the
scaling efficiency = (thr_32 / thr_8) / 4.

Writes BENCH.md and updates the scaling section in BASELINE.md is left to
the author; this prints JSON to stdout.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import crawl_throughput  # noqa: E402


def run_at(cores: int, rounds: int, hosts: int, pages: int, hot: int) -> dict:
    from pyspark.sql import SparkSession

    from cis455crawler_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(cores=cores, app_name=f"bench_scaling_{cores}")
    res = crawl_throughput(spark, rounds, hosts, pages, hot)
    spark.stop()
    return res


def main() -> None:
    hosts = int(os.environ.get("BENCH_HOSTS", "200"))
    pages = int(os.environ.get("BENCH_PAGES", "400"))
    hot = int(os.environ.get("BENCH_HOT", "10"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "4"))
    lo = int(os.environ.get("BENCH_CORES_LO", "8"))
    hi = int(os.environ.get("BENCH_CORES_HI", "32"))

    r_lo = run_at(lo, rounds, hosts, pages, hot)
    r_hi = run_at(hi, rounds, hosts, pages, hot)
    ratio = r_hi["throughput_per_s"] / r_lo["throughput_per_s"]
    eff = ratio / (hi / lo)
    print(
        json.dumps(
            {
                "cores_lo": lo,
                "cores_hi": hi,
                "thr_lo": r_lo["throughput_per_s"],
                "thr_hi": r_hi["throughput_per_s"],
                "speedup": round(ratio, 3),
                "scaling_efficiency": round(eff, 3),
                "lo": r_lo,
                "hi": r_hi,
            }
        )
    )


if __name__ == "__main__":
    main()
