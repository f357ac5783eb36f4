"""Host-keyed politeness scheduler — the core window operator of the rebuild.

Re-expresses the reference's crawl-delay gate (one fetch per delay window per
host, XPathCrawlerThread.java:440-448 + DomainRules.java:17-40) as a
round-synchronous per-host budget pop:

    budget(host) = max(1, floor(round_duration / crawl_delay))   delay > 0
                 = unlimited                                     otherwise

Skew handling (north_rule: "explicit salting of hot hosts"): a plain
Window.partitionBy(host) puts an entire hot host into one task. We pop in two
phases — the classic salted top-k:

  phase 1: row_number over (host, salt) with salt = xxhash64(url) % S,
           keep rank <= budget per salt bucket. Any URL outside its bucket's
           top-budget cannot be in the host's global top-budget (same total
           order), so this is a lossless reduction to <= S*budget rows/host.
  phase 2: row_number over (host) on the reduced set -> exact top-budget.

Rows cut in either phase are the politeness-deferred set (the reference's
re-enqueue, carried to the next round's frontier).

Within-round order is 'url ascending' — the rebuild's canonical determinization
of the reference's 20-thread nondeterministic within-round order
(XPathCrawler.java:32,173-180); round-granular BFS equality is the invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def host_budget(crawl_delay, round_duration_s: int):
    """Budget column from a crawl_delay column; NULL = unlimited."""
    d = F.coalesce(crawl_delay, F.lit(0))
    return F.when(
        d > 0, F.greatest(F.lit(1), F.floor(F.lit(round_duration_s) / d)).cast("int")
    ).otherwise(F.lit(None).cast("int"))


def pop_host_batches(
    df: DataFrame,
    budget_col: str = "budget",
    order_col: str = "url",
    salt_buckets: int = 8,
    priority_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split df into (scheduled, deferred) under per-host budgets.

    df must carry `host`, `order_col`, and `budget_col` (int, NULL=unlimited).
    With `priority_col`, the per-host pop order becomes (priority DESC,
    order_col ASC) — a host-keyed priority queue (the indegree/OPIC-style
    frontier ordering) instead of the default url-ascending BFS
    determinization. The salted two-phase pop stays lossless for any
    deterministic total order: both phases rank by the SAME order, so a row
    outside its salt bucket's top-budget cannot be in the host's global
    top-budget. The salt always hashes order_col (the unique row key), never
    the priority value — hot priority ties spread across buckets.

    Returns DataFrames with the scheduler's internal columns dropped.
    """
    internal = ["_salt", "_rn1", "_rn2"]
    order = (
        [F.desc(priority_col), F.asc(order_col)] if priority_col else [order_col]
    )
    unlimited = df.filter(F.col(budget_col).isNull())
    limited = df.filter(F.col(budget_col).isNotNull())

    salted = limited.withColumn(
        "_salt", F.pmod(F.xxhash64(order_col), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    phase1 = salted.withColumn("_rn1", F.row_number().over(w1))
    survivors = phase1.filter(F.col("_rn1") <= F.col(budget_col))
    cut1 = phase1.filter(F.col("_rn1") > F.col(budget_col))

    w2 = Window.partitionBy("host").orderBy(*order)
    phase2 = survivors.withColumn("_rn2", F.row_number().over(w2))
    scheduled_lim = phase2.filter(F.col("_rn2") <= F.col(budget_col))
    cut2 = phase2.filter(F.col("_rn2") > F.col(budget_col))

    scheduled = unlimited.unionByName(
        scheduled_lim.drop(*internal), allowMissingColumns=False
    )
    deferred = cut1.drop(*internal).unionByName(cut2.drop(*internal))
    return scheduled, deferred
