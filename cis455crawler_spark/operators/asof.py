"""As-of (point-in-time) join — a training-pipeline operator the reference
lacks (its joins are all equi/semi/anti, SURVEY.md §2.4), added as a
first-class composition of stock DataFrame ops.

Semantics: for each left row, attach the latest right row whose timestamp is
<= the left row's timestamp (backward as-of, inclusive), within the same
partition key(s).

Scale shape: the naive formulation — an inequality join
``l.key = r.key AND r.ts <= l.ts`` + max-per-group — explodes to
O(|l| x |r|/keys) intermediate rows and forces a sort-merge on a range
predicate. This implementation uses the union+window trick instead:

    tag left rows side=1, right rows side=0
    union  -> ONE shuffle on (key)   (same shuffle a groupBy would need)
    window last(right_value, ignorenulls=True)
           over (partition by key order by ts, side rows unbounded preceding)
    keep side=1 rows

Cost is O(|l| + |r|) rows through a single shuffle + sort — the plan a
hand-written merge-asof would produce, expressed declaratively so AQE can
still coalesce/skew-split partitions. Right rows sort before left rows at
equal timestamps, which yields the inclusive (<=) bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of-backward join. Returns all left columns plus
    ``{prefix}{right_ts}`` and ``{prefix}{c}`` for each right value column."""
    right_value_cols = right_value_cols or []

    carried = [right_ts, *right_value_cols]
    r = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_rv_{c}") for c in carried],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(r.schema[f"_rv_{c}"].dataType).alias(f"_rv_{c}") for c in carried],
    )
    # align schemas: right side gets nulls for left-only columns
    left_only = [c for c in l.columns if c not in r.columns]
    r_full = r.select(
        *[F.lit(None).cast(l.schema[c].dataType).alias(c) for c in left_only],
        *r.columns,
    )
    unioned = l.unionByName(r_full)

    w = (
        Window.partitionBy(*on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in carried
        ],
    )
    drop = ["_ats", "_side", *[f"_rv_{c}" for c in carried]]
    return filled.filter(F.col("_side") == 1).drop(*drop)
