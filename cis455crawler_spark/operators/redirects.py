"""Redirect-chain resolution: collapse multi-hop 301/302 chains to their
final target, with a bounded hop count and unresolved/loop marking.

The crawl plan follows ONE redirect hop per round (CrawlConfig
(follow_redirects), mirroring the reference's single-Location handling at
XPathCrawlerThread.java:148-175); this operator is the batch analogue a
frontier-maintenance pass runs over the accumulated redirect table —
Mercator-style, which treats chains longer than a small bound as errors.

Shape: the redirect map is (url -> target), corpus-sized (10^9 rows for a
big crawl), so resolution is `max_hops` UNROLLED key joins — each hop one
sort-merge join on the current target, no iteration-until-fixpoint (a
fixpoint loop on a 10^9-row table is unbounded work when loops exist; a
bounded unroll is what production frontier maintenance does). The final
left-semi probe marks chains still pointing at a redirect after the hop
budget: genuine loops (a<->b) and over-long chains both land there, which
is exactly the set a crawler refuses to follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirect_chains(
    redirects: DataFrame,
    url_col: str = "url",
    target_col: str = "target",
    max_hops: int = 3,
) -> DataFrame:
    """(url, final_url, hops, unresolved) for every redirect source.

    hops counts the redirect edges actually followed (1..max_hops);
    unresolved=true when final_url is ITSELF still a redirect source
    after max_hops (loop or over-long chain).

    The map is deduplicated up front: a source refetched across crawl
    rounds contributes identical rows that would otherwise fan out
    multiplicatively (d duplicates -> up to d^max_hops output rows)
    through the per-hop joins. A source with CONFLICTING targets (the
    site retargeted its redirect between fetches) keeps one row per
    distinct target — callers maintaining a redirect ledger should feed
    the latest-fetch snapshot, not the append log."""
    if max_hops < 1:
        # the unroll below always follows the first hop; silently exceeding
        # a requested 0-hop bound is worse than refusing it (salsa()'s
        # iterations guard is the precedent)
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    r = redirects.select(
        F.col(url_col).alias("url"), F.col(target_col).alias("target")
    ).distinct()
    cur = r.select(
        "url",
        F.col("target").alias("final_url"),
        F.lit(1).alias("hops"),
    )
    for _ in range(max_hops - 1):
        step = r.select(
            F.col("url").alias("final_url"), F.col("target").alias("_t")
        )
        cur = cur.join(step, "final_url", "left").select(
            "url",
            F.coalesce("_t", F.col("final_url")).alias("final_url"),
            (
                F.col("hops")
                + F.when(F.col("_t").isNotNull(), 1).otherwise(0)
            ).alias("hops"),
        )
    still = r.select(F.col("url").alias("final_url")).distinct().withColumn(
        "_redir", F.lit(True)
    )
    return (
        cur.join(still, "final_url", "left")
        .select(
            "url",
            "final_url",
            "hops",
            F.coalesce("_redir", F.lit(False)).alias("unresolved"),
        )
    )
