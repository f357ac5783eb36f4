"""Equivalence + shape guards for operators/similarity.topk_two_phase.

Round 5 promoted the salted two-phase top-k from similarity's private helper
to the public primitive behind the flagship frontier pop, host_budget_window,
spellcheck_suggest, and every ANN rank.  Its losslessness claim — "a row
outside its (part, salt) bucket top-k cannot be in the part's global top-k"
— holds only for deterministic total orders, so these tests drive it with
tie-heavy data, hot keys, k larger than the group, and k == 1, and compare
against the naive per-partition window it replaced.
"""

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from cis455crawler_spark.operators.similarity import topk_two_phase


def _naive_topk(df, part_col, order_cols, k, rn_name):
    w = Window.partitionBy(part_col).orderBy(*order_cols)
    return df.withColumn(rn_name, F.row_number().over(w)).filter(F.col(rn_name) <= k)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.mark.parametrize("k", [1, 3, 10, 50])
def test_matches_naive_window_on_skewed_ties(spark, k):
    """One hot part (80% of rows) + heavy score ties: the two-phase result
    must equal the naive window row-for-row, ranks included, because the
    order (score, uid) is total."""
    n = 5_000
    df = spark.range(n).select(
        F.when(F.col("id") % 5 < 4, F.lit("hot")).otherwise(
            F.concat(F.lit("p"), (F.col("id") % 37).cast("string"))
        ).alias("part"),
        (F.col("id") % 7).alias("score"),  # 7 distinct scores -> deep ties
        F.col("id").alias("uid"),
    )
    order = [F.asc("score"), F.asc("uid")]
    got = _rows(topk_two_phase(df, "part", order, k, "rn", "uid"),
                ["part", "uid", "rn"])
    want = _rows(_naive_topk(df, "part", order, k, "rn"), ["part", "uid", "rn"])
    assert got == want


def test_k_exceeds_group_size(spark):
    """Groups smaller than k must come back whole with dense ranks 1..n."""
    df = spark.createDataFrame(
        [Row(part="a", score=i, uid=i) for i in range(3)]
        + [Row(part="b", score=0, uid=100)],
    )
    out = topk_two_phase(df, "part", ["score", "uid"], 10, "rn", "uid")
    got = _rows(out, ["part", "uid", "rn"])
    assert got == [("a", 0, 1), ("a", 1, 2), ("a", 2, 3), ("b", 100, 1)]


def test_desc_order_and_expression_columns(spark):
    """Column objects (F.desc) in order_cols — the ANN call shape."""
    df = spark.range(1_000).select(
        (F.col("id") % 4).alias("q_id"),
        (F.col("id") % 13).cast("double").alias("cosine"),
        F.col("id").alias("vec_id"),
    )
    order = [F.desc("cosine"), F.asc("vec_id")]
    got = _rows(topk_two_phase(df, "q_id", order, 5, "rn", "vec_id"),
                ["q_id", "vec_id", "rn"])
    want = _rows(_naive_topk(df, "q_id", order, 5, "rn"), ["q_id", "vec_id", "rn"])
    assert got == want


def test_helper_columns_dropped_and_plan_salted(spark):
    """No _salt/_rn1 residue in the output schema; the optimized plan carries
    the salted phase-1 window and exactly twice as many window specs as
    salted ones (phase pairs), mirroring test_skew_shapes' ANN pin."""
    import re

    df = spark.range(100).select(
        (F.col("id") % 3).alias("part"), F.col("id").alias("uid")
    )
    out = topk_two_phase(df, "part", ["uid"], 2, "rn", "uid")
    assert set(out.columns) == {"part", "uid", "rn"}
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    salted = [s for s in specs if "_salt" in s]
    assert salted and len(specs) == 2 * len(salted), specs


def test_flagship_pop_is_two_phase(spark):
    """__spark_entry__.entry() promise: the frontier pop never ranks a hot
    host in one task — its plan must carry the salted phase-1 window."""
    import __spark_entry__ as e

    plan = e.entry(spark)._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan, plan
