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

    # internal working columns must not collide with caller columns
    tag = "_asof"
    taken = set(left.columns) | set(right.columns)
    while any(c.startswith(tag) for c in taken):
        tag += "x"
    ats, side = f"{tag}_ts", f"{tag}_side"

    def rv(c: str) -> str:
        return f"{tag}_rv_{c}"

    carried = [right_ts, *right_value_cols]
    # NULL-timestamp right rows never match (pandas merge_asof / SQL ASOF
    # semantics) — unfiltered they'd sort first (nulls-first ascending) and
    # be carried forward onto every left row of the key group
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias(ats),
        F.lit(0).alias(side),
        *[F.col(c).alias(rv(c)) for c in carried],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias(ats),
        F.lit(1).alias(side),
        *[F.lit(None).cast(r.schema[rv(c)].dataType).alias(rv(c)) for c in carried],
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
        .orderBy(ats, side)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(rv(c), ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in carried
        ],
    )
    drop = [ats, side, *[rv(c) for c in carried]]
    return filled.filter(F.col(side) == 1).drop(*drop)
