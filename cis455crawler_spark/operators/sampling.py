"""Systematic weighted sampling — exact-integer, engine-portable
weight-proportional selection for corpus subsampling.

Sampling k items with probability proportional to an integer weight
(quality score, token count, domain quota) is the standard corpus
subsetting step. The popular reservoir methods (Efraimidis–Spirakis
priority keys) need u^(1/w) — a libm pow whose last-ulp behavior differs
across engines, so the selection is not exactly reproducible. Systematic
(cumulative/"wheel") sampling is: lay the items on a 0..D wheel (D =
total weight, each item owning a [cum-w, cum) arc), drop k evenly spaced
pointers, and select each item once per pointer in its arc:

    copies(item) = floor(cum * k / D) - floor((cum - w) * k / D)

Pure integer arithmetic — bit-identical on Spark, DuckDB, and Python —
and every item with w >= D/k is guaranteed selected (multiplicity for the
heavy ones), the property quota-style subsampling wants. Determinism
comes from the id ordering of the wheel; a pre-shuffled order (e.g.
md5-keyed, operators' shard_shuffle pattern) de-correlates neighbors.

Scale shape: the cumulative sum is the pack_token_spans two-phase pattern
(per-bucket window + tiny broadcast bucket offsets — no global window);
the rest is a projection. ANSI mode turns cum*k overflow (k*D >= 2^63)
into a loud error instead of silent wrap — the bound is documented, not
guessed past.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .chunking import global_cumsum


def systematic_weighted_sample(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    bucket_col=None,
) -> DataFrame:
    """(id, weight, cum, n_copies) for items with n_copies >= 1.

    `bucket_col` must be monotone in id_col (range bucketing); default
    id DIV 64 suits dense integer ids. Requires k * total_weight < 2^63.
    """
    if bucket_col is None:
        bucket_col = (F.col(id_col) / 64).cast("long")
    base = df.select(
        F.col(id_col).alias("id"),
        bucket_col.alias("bucket"),
        F.col(weight_col).cast("long").alias("n"),
    ).filter(F.col("n") > 0)
    placed = global_cumsum(base, inclusive=True).select(
        "id", F.col("n").alias("w"), "cum"
    )
    # D = the last wheel position — read from the checkpointed cumsum
    # rather than re-aggregating the source lineage
    total = placed.agg(F.max("cum").alias("_d"))
    # DIV (integral division), never '/': float division rounds past
    # 2^53 and the whole point of the wheel formula is exactness
    kk = int(k)
    sel = placed.crossJoin(F.broadcast(total)).selectExpr(
        "id",
        "w AS weight",
        "cum",
        f"CAST((cum * CAST({kk} AS BIGINT)) DIV _d"
        f" - ((cum - w) * CAST({kk} AS BIGINT)) DIV _d AS BIGINT)"
        " AS n_copies",
    )
    return sel.filter(F.col("n_copies") >= 1)
