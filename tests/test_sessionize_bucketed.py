"""Bucketed two-phase sessionize == single-window sessionize
(streaming/events.py), plus the strict oracle stays covered by
sessionize_events in the driver gate.
"""

import re

import pytest
from pyspark.sql import functions as F

from cis455crawler_spark.streaming.events import sessionize


def _events(spark, n=4_000, hot_frac=0.8):
    """One hot user (80% of rows), lumpy inter-arrival gaps so sessions
    break both inside buckets and exactly at bucket boundaries."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 < int(hot_frac * 10), F.lit(0))
        .otherwise(F.col("id") % 17)
        .alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            # bursts of ~40 close events, then a multi-hour jump
            + (F.col("id") % 40) * 60
            + (F.col("id") / 40).cast("long") * 7200
        ).alias("ts"),
        (F.col("id") % 9).cast("double").alias("value"),
        F.lit("fetch").alias("event_type"),
    )


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.mark.parametrize("buckets", [1, 5, 64, 300])
def test_bucketed_equals_single_window(spark, buckets):
    ev = _events(spark)
    base = sessionize(ev, gap_minutes=30, time_buckets=None)
    got = sessionize(ev, gap_minutes=30, time_buckets=buckets)
    assert _rows(got) == _rows(base)


def test_boundary_carry(spark):
    """Two sessions for one user; many buckets slice the first session into
    bucket-boundary fragments that must NOT open new sessions."""
    rows = [(1, 1_700_000_000 + i * 60, 1.0) for i in range(30)]
    rows += [(1, 1_700_000_000 + 100_000 + i * 60, 1.0) for i in range(5)]
    ev = spark.createDataFrame(rows, ["user_id", "sec", "value"]).select(
        "user_id", F.timestamp_seconds("sec").alias("ts"), "value"
    )
    for buckets in (None, 16, 200):
        out = sessionize(ev, gap_minutes=30, time_buckets=buckets).collect()
        assert len(out) == 2, (buckets, out)
        n_by_seq = {r["session_seq"]: r["n_events"] for r in out}
        assert sorted(n_by_seq.values()) == [5, 30]


def test_null_user_rows_survive(spark):
    """NULL user_id is one group under partitionBy; the bucketed carry
    join-backs must be null-safe or those events vanish."""
    rows = [(None, 1_700_000_000 + i * 60, 1.0) for i in range(4)]
    rows += [(None, 1_700_000_000 + 90_000, 1.0)]  # second NULL-user session
    rows += [(3, 1_700_000_000, 1.0)]
    ev = spark.createDataFrame(
        rows, "user_id long, sec long, value double"
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"), "value")
    for buckets in (None, 16):
        out = sessionize(ev, gap_minutes=30, time_buckets=buckets).collect()
        by_user = {}
        for r in out:
            by_user.setdefault(r["user_id"], []).append(r["n_events"])
        assert sorted(by_user[None]) == [1, 4], (buckets, out)
        assert by_user[3] == [1]


def test_plan_has_no_bare_user_window(spark):
    """Default path: no window spec partitions on user_id alone over event
    rows — every data window carries _bkt; user-only windows are the bounded
    per-bucket carries."""
    out = sessionize(_events(spark, n=100))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for s in specs:
        head2 = [p.strip().split("#")[0] for p in s.split(",")[:2]]
        assert "_bkt" in head2 or "_bkt" in s, specs


def test_time_buckets_validation(spark):
    with pytest.raises(ValueError):
        sessionize(_events(spark, n=10), time_buckets=0)


def test_caller_columns_cannot_collide_with_internals(spark):
    """Regression: internal carry columns are tag-prefixed, so an events
    feed that already carries _tmin/_bkt/_cp_uid (say, precomputed window
    bounds from an upstream metrics job) must not break the bucketed path."""
    ev = (
        _events(spark, n=400)
        .withColumn("_tmin", F.lit(0.0))
        .withColumn("_bkt", F.lit(7))
        .withColumn("_cp_uid", F.lit(1))
    )
    base = sessionize(ev, gap_minutes=30, time_buckets=None)
    got = sessionize(ev, gap_minutes=30, time_buckets=6)
    assert _rows(got) == _rows(base)
