"""Temporal burstiness analytics over event streams.

Burst detection (the practical reduction of Kleinberg, KDD 2002) over an
event log: a type whose daily volume spikes far above its own average is
bursting — the crawl-ops uses are real (an `error` event type bursting on
one day = an outage window to exclude from change-rate estimation; a
`fetch` burst = a trap neighborhood found that day).

    burstiness(type) = max_daily / avg_daily        (>= 1.0 by definition)

Shape: one map-side-combinable groupBy(type, day), then a groupBy(type)
rollup carrying the peak day via struct-max (deterministic tie-break:
highest count, then latest day — the same rule on every engine). Days are
bounded (years x 365), so per-type state is tiny regardless of event
volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_burstiness(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(event_type, n_days, total, avg_daily, max_daily, burstiness,
    peak_day) per event type; peak_day formatted yyyy-MM-dd."""
    daily = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.date_format(F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("cnt").alias("total"),
            F.round(F.sum("cnt") / F.count("*"), 6).alias("avg_daily"),
            F.max("cnt").alias("max_daily"),
            F.round(
                F.max("cnt") / (F.sum("cnt") / F.count("*")), 6
            ).alias("burstiness"),
            F.max(F.struct(F.col("cnt"), F.col("day")))["day"].alias(
                "peak_day"
            ),
        )
    )
