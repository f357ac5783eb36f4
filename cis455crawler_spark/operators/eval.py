"""Retrieval-quality evaluation: NDCG@k over ranked result lists.

The serve path (operators/search.py) produces ranked lists; this is the
standard offline judge for them (Järvelin & Kekäläinen, TOIS 2002):

    DCG@k  = Σ_{i<=k} (2^rel_i - 1) / log2(i + 1)
    NDCG@k = DCG@k / IDCG@k          (IDCG = DCG of the ideal ordering)

Engine shape: both the actual and the ideal ordering are row_number
windows partitioned by query — a partition holds ONE query's result list
(<= a few hundred rows by construction; result lists are bounded by the
serve path's top-k), so unlike corpus-keyed windows this cannot build a
straggler. One groupBy(query) finishes the job. Tie-break on doc_id in
the ideal ordering keeps IDCG deterministic on every engine.

Zero-relevance queries (IDCG = 0) report NDCG 0.0 — evaluating a query
with no relevant documents is defined as total failure, not NULL, so
downstream averages don't silently drop the worst cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ndcg_at_k(
    results: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "relevance",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, n_results, dcg, idcg, ndcg) per query.

    `results`: one row per (query, doc) with the serve rank (1-based,
    smaller = better) and a graded relevance label (0 = irrelevant)."""
    q = F.col(query_col)
    gain = (F.pow(F.lit(2.0), F.col(rel_col)) - 1.0)
    actual_pos = F.row_number().over(
        Window.partitionBy(query_col).orderBy(F.asc(rank_col), F.asc(id_col))
    )
    ideal_pos = F.row_number().over(
        Window.partitionBy(query_col).orderBy(
            F.desc(rel_col), F.asc(id_col)
        )
    )
    scored = results.select(
        q.alias("query_id"),
        gain.alias("g"),
        actual_pos.alias("apos"),
        ideal_pos.alias("ipos"),
    )
    per_q = scored.groupBy("query_id").agg(
        F.count("*").alias("n_results"),
        F.sum(
            F.when(
                F.col("apos") <= k, F.col("g") / F.log2(F.col("apos") + 1)
            ).otherwise(0.0)
        ).alias("dcg"),
        F.sum(
            F.when(
                F.col("ipos") <= k, F.col("g") / F.log2(F.col("ipos") + 1)
            ).otherwise(0.0)
        ).alias("idcg"),
    )
    return per_q.select(
        "query_id",
        "n_results",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(
                0.0
            ),
            6,
        ).alias("ndcg"),
    )
