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


def allocate_budget_hamilton(
    demands: DataFrame,
    total_budget: int,
    host_col: str = "host",
    demand_col: str = "demand",
    rank_buckets: int = 64,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a global crawl
    budget across hosts: each host first gets floor(B * d / D) slots,
    then the leftover L = B - Σfloor goes to the L hosts with the largest
    remainders (B*d mod D), ties to the lexicographically smaller host.
    The classic property: every allocation is within 1 of the exact
    proportional quota, and the total is EXACTLY B — which per-host
    rounding cannot guarantee. All integer arithmetic (requires
    B * max_demand < 2^63; ANSI mode makes an overflow loud).

    The only global structure is the remainder RANKING, and a global
    row_number window would put every host in one task. Two-phase global
    rank instead (the engine's standard shape): bucket by remainder range
    (bucket = rem * NB DIV D — ORDER-ALIGNED with the rank), rank within
    bucket by (rem DESC, host ASC), add the broadcast count of all rows
    in higher buckets. Identical to the single-window answer for any
    bucket count (pytest-pinned), ~uniform bucket sizes for ~uniform
    remainders.

    Returns (host, demand, base, extra, allocation) — Σallocation = B."""
    b = int(total_budget)
    d = demands.select(
        F.col(host_col).alias("host"),
        F.col(demand_col).cast("long").alias("demand"),
    ).filter(F.col("demand") > 0)
    tot = d.agg(F.sum("demand").alias("_dd"))
    q = d.crossJoin(F.broadcast(tot)).selectExpr(
        "host",
        "demand",
        f"(demand * CAST({b} AS BIGINT)) DIV _dd AS base",
        f"(demand * CAST({b} AS BIGINT)) % _dd AS rem",
        "_dd",
    )
    q = q.withColumn(
        "_bkt",
        F.expr(f"(rem * CAST({int(rank_buckets)} AS BIGINT)) DIV _dd"),
    )
    w = Window.partitionBy("_bkt").orderBy(F.desc("rem"), F.asc("host"))
    ranked = q.withColumn("_rnk_local", F.row_number().over(w))
    # tiny rollup: rows per bucket -> for each bucket, how many rows sit in
    # STRICTLY HIGHER buckets (higher bucket = higher remainder)
    per_bkt = ranked.groupBy("_bkt").agg(F.count("*").alias("_n"))
    w_off = (
        Window.orderBy(F.desc("_bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bkt.withColumn(
        "_above", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("_bkt", "_above")
    leftover = q.agg(
        (F.lit(b) - F.sum("base")).cast("long").alias("_left")
    )
    return (
        ranked.join(F.broadcast(offsets), "_bkt")
        .crossJoin(F.broadcast(leftover))
        .select(
            "host",
            "demand",
            "base",
            F.when(
                F.col("_above") + F.col("_rnk_local") <= F.col("_left"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("extra"),
        )
        .withColumn("allocation", F.col("base") + F.col("extra"))
    )
