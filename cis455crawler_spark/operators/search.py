"""Serve-path search: terms -> postings semi-join -> intersection scoring ->
top-100 -> page join -> snippet.

Re-expresses the reference's fan-out serve path
(/root/reference/SearchEngine/src/FrontEnd/topSearch.java:129-453 +
Extract/src/fetch/Ext.java:72-250 + FetchDocs.java:60-150) as one DataFrame
query. Scoring: +1 per posting occurrence, +100 for docs containing EVERY
query term (Ext.java:138-170); cutoff top-100 (Ext.java:176).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, tokenize

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


def positional_postings(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, word, positions ARRAY<INT> ascending, 1-based) — the
    position-aware index the reference never builds (its WordIndexEntity,
    FileManagement.java:429-446, keeps only rank parallel arrays, so its
    serve path cannot answer phrase queries). Positions index the
    stopword-FILTERED token stream: both this and the DuckDB oracle count
    after removal, so the adjacency test is engine-independent.

    One explode + one groupBy(doc,word) shuffle; positions stay as a sorted
    array per (doc,word) — the classic positional-postings layout, list
    length bounded by per-doc term frequency, never by corpus size."""
    from ..functions.text import remove_stopwords

    toks = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.posexplode(remove_stopwords(tokenize(F.col(text_col)))).alias(
            "pos0", "word"
        ),
    )
    return toks.groupBy("doc_id", "word").agg(
        F.sort_array(F.collect_list(F.col("pos0") + 1)).alias("positions")
    )


def phrase_search(
    pos_postings: DataFrame, phrase: str, doc_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_matches) for an exact phrase over positional_postings().

    Adjacency as array algebra, no per-row Python: the candidate start-set
    begins as term 0's positions and is narrowed per term by
    array_intersect(shift(acc, +1), positions_i). Each step is one equi-join
    on doc_id against a single-word slice of the index — the slice is tiny
    relative to the index (one word's postings), so AQE broadcasts it; k-term
    phrases cost k-1 such joins, independent of corpus size."""
    # the phrase goes through the SAME analyzer as the index (tokenize()'s
    # [^a-z0-9]+ split + stopword drop) — a whitespace-only split would turn
    # 'fast, spark' into the never-indexed token 'fast,' and match nothing
    terms = [
        t
        for t in re.split(r"[^a-z0-9]+", phrase.lower())
        if t and t not in STOPWORDS
    ]
    if not terms:
        # typed empty result with the INPUT's doc_id type (int vs long must
        # survive so callers can union across phrases)
        return (
            pos_postings.select(doc_col)
            .limit(0)
            .withColumn("n_matches", F.lit(0).cast("int"))
        )
    acc = (
        pos_postings.filter(F.col("word") == terms[0])
        .select(F.col(doc_col), F.col("positions").alias("starts"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = pos_postings.filter(F.col("word") == t).select(
            F.col(doc_col), F.col("positions").alias(f"_p{i}")
        )
        # acc's starts are already shifted to term i-1's positions, so term i
        # sits exactly one past them — shift by +1 each step, not by +i
        acc = (
            acc.join(nxt, doc_col, "inner")
            .select(
                F.col(doc_col),
                F.array_intersect(
                    F.transform(F.col("starts"), lambda x: x + 1),
                    F.col(f"_p{i}"),
                ).alias("starts"),
            )
            .filter(F.size("starts") > 0)
        )
    return acc.select(F.col(doc_col), F.size("starts").alias("n_matches"))


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


def more_like_this_sparse(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 50,
    threshold: float = 0.5,
):
    """Related-document pairs by tf-idf cosine over the inverted index —
    the serve path's "more like this" (Lucene's MoreLikeThis does exactly
    this: tf-idf vectors, frequent terms dropped, cosine over shared
    terms).

        w(d,t)    = tf * ln(N / df)          (capped vocabulary only)
        cos(a,b)  = Σ w(a,t)·w(b,t) / (‖a‖·‖b‖)

    Terms with df > max_df carry ~zero idf AND explode the shared-term
    self-join (a stopword-grade term pairs every doc with every doc) —
    dropped before pairing, the same df-cap shape as the containment /
    mirror passes; the norms are over the same capped vectors so the
    cosine stays a true cosine of what was compared. One shared-term
    join bounded by max_df^2 per term, two map-side-combinable aggs.

    Returns (id_a, id_b, shared_terms, cosine) with id_a < id_b,
    cosine >= threshold."""
    from ..functions.text import remove_stopwords, tokenize

    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(remove_stopwords(tokenize(F.col(text_col)))).alias(
                "word"
            ),
        )
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    capped = (
        tf.join(dfreq.filter(F.col("df") <= max_df), "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
        )
        # three consumers (norms + self-join both sides)
        .localCheckpoint(eager=False)
    )
    norms = capped.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(
            F.count("*").alias("shared_terms"),
            F.sum(F.col("a.w") * F.col("b.w")).alias("dot"),
        )
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("norm").alias("norm_b"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "cosine",
            F.round(F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "shared_terms", "cosine")
    )
