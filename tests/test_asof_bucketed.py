"""Bucketed two-phase as-of fill == single-window fill (operators/asof.py).

The round-5 rewrite splits each key's running-last fill into time buckets so
a hot key never sorts its whole history in one task. These tests prove the
decomposition exact against the single-window path (the one already
differential-tested vs pandas.merge_asof in test_pipeline_ops) on skewed,
NULL-heavy, and boundary-tie data, and pin the plan shape.
"""

import re

import pytest
from pyspark.sql import functions as F

from cis455crawler_spark.operators.asof import asof_join_backward


def _mk(spark, n_left=3_000, n_right=2_000, hot_frac=0.8, seed_mod=97):
    """Synthetic clicks/purchases with one hot user and tie-heavy timestamps
    (ts collisions across sides exercise the side tiebreak at boundaries)."""
    left = spark.range(n_left).select(
        F.when(F.col("id") % 10 < int(hot_frac * 10), F.lit(0))
        .otherwise(F.col("id") % 23)
        .alias("user_id"),
        ((F.col("id") * 37) % seed_mod).cast("double").alias("ts"),
        F.col("id").alias("event_id"),
    )
    right = spark.range(n_right).select(
        F.when(F.col("id") % 10 < int(hot_frac * 10), F.lit(0))
        .otherwise(F.col("id") % 23)
        .alias("user_id"),
        ((F.col("id") * 53) % seed_mod).cast("double").alias("ts"),
        # every 7th right VALUE is NULL: last(ignorenulls) must skip it in
        # BOTH paths (the carried ts stays non-null, the value carries older)
        F.when(F.col("id") % 7 != 0, (F.col("id") % 11).cast("double")).alias("v"),
    )
    return left, right


def _sorted(df):
    cols = sorted(df.columns)
    return [tuple(r[c] for c in cols) for r in df.orderBy(*cols).collect()]


@pytest.mark.parametrize("buckets", [1, 3, 64, 500])
def test_bucketed_equals_single_window(spark, buckets):
    left, right = _mk(spark)
    base = asof_join_backward(
        left, right, on=["user_id"], right_value_cols=["v"], time_buckets=None
    )
    got = asof_join_backward(
        left, right, on=["user_id"], right_value_cols=["v"], time_buckets=buckets
    )
    assert _sorted(got) == _sorted(base)


def test_null_left_ts_and_degenerate_span(spark):
    """NULL left timestamps match nothing in both paths; a single-instant
    corpus (span == 0) collapses to one bucket and still fills correctly."""
    left = spark.createDataFrame(
        [(1, None, 10), (1, 5.0, 11), (2, 5.0, 12)], ["k", "ts", "eid"]
    )
    right = spark.createDataFrame([(1, 5.0, 1.5), (2, 6.0, 2.5)], ["k", "ts", "v"])
    for buckets in (None, 8):
        rows = {
            r["eid"]: (r["asof_ts"], r["asof_v"])
            for r in asof_join_backward(
                left, right, on=["k"], right_value_cols=["v"], time_buckets=buckets
            ).collect()
        }
        assert rows[10] == (None, None)       # NULL ts: no match
        assert rows[11] == (5.0, 1.5)         # inclusive <= at equal ts
        assert rows[12] == (None, None)       # right ts 6.0 > left 5.0

    # span == 0: every row lands at ts 5.0
    left0 = spark.createDataFrame([(1, 5.0, 1)], ["k", "ts", "eid"])
    right0 = spark.createDataFrame([(1, 5.0, 9.0)], ["k", "ts", "v"])
    out = asof_join_backward(
        left0, right0, on=["k"], right_value_cols=["v"], time_buckets=16
    ).collect()
    assert out[0]["asof_v"] == 9.0


def test_null_key_rows_survive(spark):
    """partitionBy groups NULL keys, so the bucketed carry join-back must be
    null-safe — a plain equi-join would drop every NULL-key left row."""
    left = spark.createDataFrame(
        [(None, 10.0, 1), (None, 20.0, 2), (7, 15.0, 3)],
        "k int, ts double, eid int",
    )
    right = spark.createDataFrame(
        [(None, 9.0, 1.0), (None, 12.0, 2.0), (7, 14.0, 3.0)],
        "k int, ts double, v double",
    )
    for buckets in (None, 8):
        out = asof_join_backward(
            left, right, on=["k"], right_value_cols=["v"], time_buckets=buckets
        )
        rows = {r["eid"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}
        assert len(rows) == 3, (buckets, rows)  # NULL-key rows kept
        assert rows[1] == (9.0, 1.0)
        assert rows[2] == (12.0, 2.0)
        assert rows[3] == (14.0, 3.0)


def test_plan_has_no_bare_key_window(spark):
    """Default path: every window over the union partitions on
    (key..., bucket) or ranks <= buckets summary rows per key — no window
    spec may partition on the join key alone."""
    left, right = _mk(spark, n_left=100, n_right=100)
    out = asof_join_backward(left, right, on=["user_id"], right_value_cols=["v"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for s in specs:
        head = [p.strip().split("#")[0] for p in s.split(",")[:2]]
        # key-only windows order by the bucket (phase C, bounded rows);
        # data windows carry the bucket as the second partition key (phase A)
        assert "_asof_bkt" in head or head[0] != "user_id" or "_asof_bkt" in s, specs


def test_time_buckets_validation(spark):
    left, right = _mk(spark, n_left=10, n_right=10)
    with pytest.raises(ValueError):
        asof_join_backward(left, right, on=["user_id"], time_buckets=0)


def test_caller_columns_cannot_collide_with_internals(spark):
    """Regression: the bucketed path's stats/bucket columns must inherit the
    tag collision-avoidance — callers may legitimately own columns named
    _asof_tmin/_asof_tmax/_asof_bkt (e.g. output of a previous as-of pass)."""
    left, right = _mk(spark, n_left=300, n_right=200)
    left = (
        left.withColumn("_asof_tmin", F.lit(1.0))
        .withColumn("_asof_tmax", F.lit(2.0))
        .withColumn("_asof_bkt", F.lit(9))
    )
    base = asof_join_backward(
        left, right, on=["user_id"], right_value_cols=["v"], time_buckets=None
    )
    got = asof_join_backward(
        left, right, on=["user_id"], right_value_cols=["v"], time_buckets=8
    )
    assert set(got.columns) == set(base.columns)
    assert _sorted(got) == _sorted(base)
