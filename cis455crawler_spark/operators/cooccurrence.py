"""Term co-occurrence PMI over a bounded top-V vocabulary.

Pointwise mutual information between terms that co-occur in documents
(Church & Hanks, CL 1990) — the classic distributional-similarity /
related-terms signal a search serve path uses for query suggestion, and a
corpus-analytics staple. Unbounded pairwise co-occurrence is O(doc_len^2)
per document and vocabulary^2 overall — intractable and useless at web
scale (the tail is noise). The standard bounding: restrict to the top-V
frequent terms (V a few thousand in production, broadcast-sized by
construction), then per-document distinct-term pairs are <= V^2 and the
pair aggregation is one map-side-combinable groupBy.

    pmi(a,b) = ln( p(a,b) / (p(a) p(b)) )
             = ln( n_ab * N / (n_a * n_b) )   over document counts

Top-V selection tie-breaks on the term itself (count DESC, word ASC) so
the vocabulary — and therefore the whole result — is deterministic on any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_vocab(tokens: DataFrame, v: int = 30) -> DataFrame:
    """(word, n_docs) for the V most document-frequent terms,
    deterministic tie-break (n_docs DESC, word ASC)."""
    return (
        tokens.groupBy("word")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("word"))
        .limit(v)
    )


def cooccurrence_pmi(
    tokens: DataFrame, v: int = 30, min_pairs: int = 2
) -> DataFrame:
    """(word_a, word_b, n_ab, n_a, n_b, pmi) for top-V term pairs
    co-occurring in >= min_pairs documents; word_a < word_b. `tokens` is
    the exploded (doc_id, word) stream; N = total distinct documents in
    it (the PMI universe)."""
    vocab = top_vocab(tokens, v)
    hits = (
        tokens.join(F.broadcast(vocab.select("word")), "word")
        .select("doc_id", "word")
        .distinct()
    )
    a = hits.alias("a")
    b = hits.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .groupBy(
            F.col("a.word").alias("word_a"), F.col("b.word").alias("word_b")
        )
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    n_total = tokens.agg(
        F.countDistinct("doc_id").alias("n_docs_total")
    )
    va = vocab.select(
        F.col("word").alias("word_a"), F.col("n_docs").alias("n_a")
    )
    vb = vocab.select(
        F.col("word").alias("word_b"), F.col("n_docs").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(va), "word_a")
        .join(F.broadcast(vb), "word_b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "word_a",
            "word_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.log(
                    F.col("n_ab")
                    * F.col("n_docs_total")
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
