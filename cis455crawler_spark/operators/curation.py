"""Domain-level corpus curation: per-host quality rollups and blocklist
filtering — the step RefinedWeb/C4 run BEFORE per-document filtering (bad
hosts are cheaper to drop wholesale than to score page by page).

Spark shape at 100 TB: one partial-aggregated groupBy(host) over cheap
per-row quality columns (map-side combine keeps the shuffle at
|hosts| << |pages|), then the host verdict — a tiny table even at
Common-Crawl scale (~10^8 hosts vs 10^10 pages) — broadcasts back as the
filter join. A hot host (10^6+ pages) is exactly one aggregation key, not a
join-explosion risk, because only its pre-aggregated stats row crosses the
shuffle; compare the salted two-phase window in operators/scheduler.py,
which the POP path needs because it keeps per-row ordering — a rollup
doesn't.

Reference tie-in: the reference crawler has no domain filtering (it
schedules per-host for politeness only, XPathCrawler.java's host queues);
this module is part of the beyond-reference training-data pipeline layer
(SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score, token_count
from ..functions.urls import host_of


def host_quality_rollup(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(host, n_docs, avg_quality, total_tokens, avg_tokens) per host —
    one map-side-combinable aggregation over pure-JVM quality columns."""
    return (
        docs.select(
            host_of(F.col(url_col)).alias("host"),
            quality_score(F.col(text_col)).alias("q"),
            token_count(F.col(text_col)).alias("t"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("q"), 6).alias("avg_quality"),
            F.sum("t").alias("total_tokens"),
            F.round(F.avg("t"), 6).alias("avg_tokens"),
        )
    )


def host_blocklist(
    rollup: DataFrame,
    min_avg_quality: float = 0.5,
    min_avg_tokens: float = 0.0,
) -> DataFrame:
    """(host) rows failing the domain-quality gate. Tiny by construction
    (subset of the host rollup) — always broadcastable."""
    return rollup.filter(
        (F.col("avg_quality") < min_avg_quality)
        | (F.col("avg_tokens") < min_avg_tokens)
    ).select("host")


def apply_host_blocklist(
    docs: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop every document whose host is blocklisted — broadcast anti-join,
    no shuffle of the corpus side."""
    keyed = docs.withColumn("_host", host_of(F.col(url_col)))
    return keyed.join(
        F.broadcast(blocklist.withColumnRenamed("host", "_host")),
        "_host",
        "left_anti",
    ).drop("_host")
