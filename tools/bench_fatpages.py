"""Fat-page recrawl-economy tier (VERDICT r4 punch #5): gen-1 full crawl vs
gen-2 conditional recrawl over ~100 KB html bodies.

At the default tiny-synthetic-page tier, gen-2's MERGE/304-compare overhead
roughly cancels its parse savings (gen-2 ≈ 0.93x gen-1) because there is
almost nothing to parse. Real pages are 10-100 KB, parse dominates, and the
304 path should win outright — this script measures exactly that claim.

Usage: python tools/bench_fatpages.py   (env FAT_HOSTS/FAT_PAGES/FAT_ROUNDS/
FAT_WORDS override the tier; defaults 40x250 pages, 12000-13000 words/body
≈ 100 KB html). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import crawl_throughput  # noqa: E402
from cis455crawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    hosts = int(os.environ.get("FAT_HOSTS", "40"))
    pages = int(os.environ.get("FAT_PAGES", "250"))
    rounds = int(os.environ.get("FAT_ROUNDS", "8"))
    words = tuple(
        int(x) for x in os.environ.get("FAT_WORDS", "12000,13000").split(",")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cpus, app_name="bench_fatpages")

    gen1, gen2 = crawl_throughput(
        spark, rounds, hosts, pages, hot=1, recrawl=True, words=words
    )
    out = {
        "metric": "fatpage_recrawl_economy",
        "tier": {"hosts": hosts, "pages_per_host": pages, "words": list(words)},
        "gen1": gen1,
        "gen2": gen2,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
