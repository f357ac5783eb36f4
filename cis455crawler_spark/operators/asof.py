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

Cost is O(|l| + |r|) rows through a single shuffle + sort. Right rows sort
before left rows at equal timestamps, which yields the inclusive (<=) bound.

Hot keys: a window partitioned on the key alone puts a hot key's ENTIRE
history in one task (the r4/r5 skew-sweep anti-pattern — spans, scheduler,
indexer df, exact dedup all had it). With ``time_buckets`` set (the default),
the fill runs as the bucketed two-phase decomposition chunking.py uses for
its global cumsum:

    phase A  window over (key, time_bucket)      — tasks bounded at
             |key history| / buckets
    phase B  per-(key, bucket) END-OF-BUCKET value of each carried column
             (groupBy — map-side combinable)
    phase C  carry-in per bucket = last non-null phase-B value over STRICTLY
             EARLIER buckets (window per key over <= buckets rows — bounded)
    final    coalesce(in-bucket fill, carry-in)

Buckets are equal-width in time between the union's min/max timestamp (one
1-row stats aggregate fused in via broadcast crossJoin — the repo's
stats-fusion pattern). The decomposition is exact: buckets are monotone in
ts, so in-bucket-last-else-previous-bucket-carry == global running last.
A hot key bursting at ONE instant still lands in one bucket — that residue
is inherent to as-of ordering and documented here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

from .bucketed import (
    assign_time_buckets,
    carry_window,
    internal_tag,
    null_safe_carry_cond,
)


def _ts_numeric(col, dtype):
    """Monotone numeric image of a timestamp-ish column, for bucketing only."""
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    if isinstance(dtype, DateType):
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    prefix: str = "asof_",
    time_buckets: int | None = 64,
) -> DataFrame:
    """Left as-of-backward join. Returns all left columns plus
    ``{prefix}{right_ts}`` and ``{prefix}{c}`` for each right value column.

    ``time_buckets``: split each key's fill into this many time ranges so no
    single task ever sorts a hot key's whole history (see module docstring).
    ``None`` selects the single-window path (fewer stages — fine when key
    cardinality is known high / groups known small)."""
    if time_buckets is not None and time_buckets < 1:
        raise ValueError(f"time_buckets must be >= 1 or None, got {time_buckets}")
    right_value_cols = right_value_cols or []

    # internal working columns must not collide with caller columns — the
    # tag prefix also covers assign_time_buckets' stats columns, which
    # derive from bkt (operators/bucketed.py)
    tag = internal_tag("_asof", left, right)
    ats, side, bkt = f"{tag}_ts", f"{tag}_side", f"{tag}_bkt"

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
    drop = [ats, side, *[rv(c) for c in carried]]

    if time_buckets is None:
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
        return filled.filter(F.col(side) == 1).drop(*drop)

    # ---- bucketed two-phase fill (operators/bucketed.py machinery) ----
    tnum = _ts_numeric(F.col(ats), unioned.schema[ats].dataType)
    # NULL left timestamps can never match anything; park them in bucket 0
    # where the carry-in is NULL by construction (no earlier bucket), which
    # reproduces the single-window nulls-first behaviour exactly.
    u = assign_time_buckets(unioned, tnum, time_buckets, bkt)

    # phase A: running last WITHIN (key, bucket) — task size bounded
    w_in = (
        Window.partitionBy(*on, bkt)
        .orderBy(ats, side)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    infill = [
        F.last(rv(c), ignorenulls=True).over(w_in).alias(f"{tag}_in_{c}")
        for c in carried
    ]
    a = u.select("*", *infill)

    # phase B: end-of-bucket value per carried column. Carried values are
    # non-null only on right rows and travel together per row, but a right
    # VALUE column may itself be NULL — mirror last(ignorenulls) by ranking
    # only rows where that column is non-null (max_by skips NULL ordering).
    # NOTE the union/bucketing lineage is EVALUATED PER PHASE (window,
    # summary, and the two 1-row stats broadcasts): column pruning gives
    # each consumer a different projection, so no exchange is reusable, and
    # materializing instead was MEASURED slower at bench scale (lazy
    # localCheckpoint of the union: 2.79 s vs 1.56 s recompute, 2M x 200k
    # rows — re-scanning a columnar source is cheaper than writing blocks,
    # the same verdict as dedup_fuzzy's cache-vs-checkpoint measurement).
    # Callers composing as-of AFTER an expensive non-scan pipeline should
    # pre-materialize their inputs (localCheckpoint) before calling.
    summary = u.groupBy(*on, bkt).agg(
        *[
            F.max_by(
                rv(c),
                F.when(F.col(rv(c)).isNotNull(), F.struct(F.col(ats), F.col(side))),
            ).alias(f"{tag}_end_{c}")
            for c in carried
        ]
    )
    # phase C: carry-in = last non-null end-of-bucket value over strictly
    # earlier buckets; <= time_buckets rows per key, bounded by construction
    w_carry = carry_window(on, bkt)
    carry = summary.select(
        *[F.col(k).alias(f"{tag}_k_{k}") for k in on],
        F.col(bkt).alias(f"{tag}_cbkt"),
        *[
            F.last(f"{tag}_end_{c}", ignorenulls=True)
            .over(w_carry)
            .alias(f"{tag}_carry_{c}")
            for c in carried
        ],
    )

    cond = null_safe_carry_cond(on, [f"{tag}_k_{k}" for k in on], bkt, f"{tag}_cbkt")
    filled = a.join(carry, cond).select(
        "*",
        *[
            F.coalesce(F.col(f"{tag}_in_{c}"), F.col(f"{tag}_carry_{c}")).alias(
                f"{prefix}{c}"
            )
            for c in carried
        ],
    )
    drop += (
        [bkt, f"{tag}_cbkt"]
        + [f"{tag}_k_{k}" for k in on]
        + [f"{tag}_in_{c}" for c in carried]
        + [f"{tag}_carry_{c}" for c in carried]
    )
    return filled.filter(F.col(side) == 1).drop(*drop)
