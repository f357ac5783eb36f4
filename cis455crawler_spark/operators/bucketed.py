"""Shared time-bucket carry machinery for skew-proof running computations.

Several operators decompose a per-key running computation (running last,
lag boundary, cumulative sum) into equal-width TIME buckets so that no
single task ever sorts a hot key's whole history (the r4/r5 skew-sweep
pattern — see operators/asof.py and streaming/events.py docstrings for the
exactness arguments):

    phase A  window over (key, bucket)            — bounded task size
    phase B  per-(key, bucket) summary (groupBy   — map-side combinable)
    phase C  per-key carry over STRICTLY EARLIER buckets
             (window over <= time_buckets summary rows — bounded)
    final    combine in-bucket result with the carry-in

This module owns the pieces the decompositions share, so fixes (NULL-ts
parking, null-safe key join-backs, collision-free internal names) apply to
every user at once instead of being re-proven per copy:

  * ``internal_tag``       — an internal-column prefix guaranteed absent
                             from the caller's frames
  * ``assign_time_buckets``— equal-width bucket ids via one fused 1-row
                             min/max aggregate (broadcast crossJoin);
                             NULL/degenerate rows park in bucket 0
  * ``carry_window``       — the bounded strictly-earlier-buckets window
  * ``null_safe_carry_cond``— eqNullSafe join-back keys (partitionBy groups
                             NULL keys; plain equality would drop them)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def internal_tag(base: str, *frames: DataFrame) -> str:
    """A column-name prefix that no column of ``frames`` starts with, so
    every ``{tag}_*`` internal name is collision-free by construction."""
    taken = {c for df in frames for c in df.columns}
    tag = base
    while any(c.startswith(tag) for c in taken):
        tag += "x"
    return tag


def assign_time_buckets(
    df: DataFrame, tnum: Column, time_buckets: int, bucket_col: str
) -> DataFrame:
    """Add ``bucket_col`` = equal-width bucket id in ``[0, time_buckets)`` of
    the monotone numeric column expression ``tnum``.

    Bounds come from ONE 1-row min/max aggregate fused in via broadcast
    crossJoin (the repo's stats-fusion pattern — no driver collect). NULL
    ``tnum`` rows and a degenerate span park in bucket 0, where phase C's
    carry-in is NULL by construction (no earlier bucket) — reproducing the
    single-window nulls-first behaviour exactly.

    The stats columns derive from ``bucket_col``, so a caller-supplied
    collision-free name (see ``internal_tag``) covers them too."""
    if time_buckets < 1:
        raise ValueError(f"time_buckets must be >= 1, got {time_buckets}")
    tmin, tmax = f"{bucket_col}_tmin", f"{bucket_col}_tmax"
    stats = df.agg(F.min(tnum).alias(tmin), F.max(tnum).alias(tmax))
    span = F.col(tmax) - F.col(tmin)
    bucket = (
        F.when(
            tnum.isNotNull() & (span > 0),
            F.least(
                F.floor((tnum - F.col(tmin)) * time_buckets / span),
                F.lit(time_buckets - 1),
            ),
        )
        .otherwise(0)
        .cast("int")
    )
    return (
        df.crossJoin(F.broadcast(stats)).withColumn(bucket_col, bucket).drop(tmin, tmax)
    )


def carry_window(keys: list[str], bucket_col: str) -> WindowSpec:
    """Per-key window over strictly earlier buckets — at most one summary row
    per non-empty bucket, so the frame is bounded by ``time_buckets``."""
    return (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )


def null_safe_carry_cond(
    keys: list[str], key_aliases: list[str], bucket_col: str, carry_bucket_col: str
) -> Column:
    """Join-back condition matching each row to its (key, bucket) carry row.
    Keys compare eqNullSafe: partitionBy groups NULL keys, so plain equality
    would silently drop NULL-key rows that the single-window paths fill
    correctly. eqNullSafe keys remain hash-joinable."""
    cond = F.col(bucket_col) == F.col(carry_bucket_col)
    for k, ka in zip(keys, key_aliases):
        cond = cond & F.col(k).eqNullSafe(F.col(ka))
    return cond
