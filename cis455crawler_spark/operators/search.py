"""Serve-path search: terms -> postings semi-join -> intersection scoring ->
top-100 -> page join -> snippet.

Re-expresses the reference's fan-out serve path
(/root/reference/SearchEngine/src/FrontEnd/topSearch.java:129-453 +
Extract/src/fetch/Ext.java:72-250 + FetchDocs.java:60-150) as one DataFrame
query. Scoring: +1 per posting occurrence, +100 for docs containing EVERY
query term (Ext.java:138-170); cutoff top-100 (Ext.java:176).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS

TOP_K = 100  # Ext.java:176
INTERSECTION_BONUS = 100  # Ext.java:153-170


def search(
    postings_df: DataFrame,
    query: str,
    pages: DataFrame | None = None,
    top_k: int = TOP_K,
) -> DataFrame:
    """(doc_id, score[, rank]) for a free-text query."""
    terms = [t for t in query.lower().split() if t and t not in STOPWORDS]
    terms = list(dict.fromkeys(terms))
    n_terms = len(terms)
    if n_terms == 0:
        return postings_df.sparkSession.createDataFrame([], "doc_id string, score long")

    spark = postings_df.sparkSession
    terms_df = spark.createDataFrame([(t,) for t in terms], "word string")
    hits = postings_df.join(F.broadcast(terms_df), "word", "inner")
    scored = hits.groupBy("doc_id").agg(
        F.count("*").alias("n_hits"), F.countDistinct("word").alias("n_words")
    )
    scored = scored.select(
        "doc_id",
        (
            F.col("n_hits")
            + F.when(F.col("n_words") == n_terms, F.lit(INTERSECTION_BONUS)).otherwise(0)
        ).alias("score"),
    )
    out = scored.orderBy(F.desc("score"), "doc_id").limit(top_k)
    if pages is not None:
        out = out.join(pages, "doc_id", "inner")
    return out


def snippet(text_col, query: str, before: int = 20, after: int = 50):
    """First-occurrence snippet per query word, '...'-joined
    (FetchDocs.java:125-150): window [-20,+50] around locate(word)."""
    parts = []
    for w in dict.fromkeys(query.lower().split()):
        pos = F.locate(w, F.lower(text_col))
        frag = F.when(
            pos > 0,
            F.substring(
                text_col, F.greatest(pos - before, F.lit(1)).cast("int"), before + after
            ),
        )
        parts.append(frag)
    return F.concat_ws("...", *[p for p in parts])
