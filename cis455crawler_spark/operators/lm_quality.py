"""Bigram language-model quality scoring (perplexity proxy) — the CCNet /
RefinedWeb-style corpus-quality signal: score each document by the average
negative log-probability of its token bigrams under a model trained on the
corpus itself. Low cross-entropy = in-distribution fluent text; high =
gibberish, boilerplate explosions, wrong-language shards.

No analogue in the reference (ssn2013/cis455Crawler ranks purely by tf-idf,
Indexer/src/edu/upenn/cis455/mapreduce/job/Indexer.java:212-232); this is a
beyond-reference training-data-pipeline operator (SURVEY.md §2.11).

Spark shape, sized for 100 TB:
- Tokenization is the engine's shared JVM regex tokenizer (functions/text.py)
  so DuckDB/Python oracles reproduce it exactly — zero Python in the path.
- Bigrams are generated JVM-side with ``transform(sequence(...))`` over the
  token array (no posexplode + self-join on pos+1, which would cost an extra
  shuffle keyed by (doc, pos)).
- Training = two groupBy counts (bigram, context). Both enjoy map-side
  partial aggregation; the Zipf head (stopword bigrams) is absorbed there,
  so the shuffle carries ~distinct-bigram rows, not corpus rows.
- Scoring = equi-join of the doc bigram stream against the two count tables
  on the bigram/context string key. Hot keys (e.g. "of the") are exactly the
  AQE skew-join case; no salting needed because the build side per key is
  ONE row. Vocabulary size is a 1-row aggregate fused via crossJoin (the
  repo's standard scalar-fusion pattern, plans/crawl.py).
- Determinism across engines: per-bigram log-probs are quantized to integer
  micro-nats BEFORE the per-doc sum, so the aggregation is exact integer
  arithmetic — float summation order (Spark shuffle nondeterminism vs
  DuckDB's serial fold) can never flip the strict value-hash gate.

At the 10^10-doc regime the bigram table itself can be pruned with a
``HAVING count >= k`` tail cut (hapax bigrams carry ~0 mass but most of the
cardinality); kept exact here because the oracle must match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

#: Laplace smoothing mass added to every bigram count.
ALPHA = 1.0


def doc_bigrams(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, bg) rows — one per adjacent token pair, JVM-side.

    ``bg`` is the two tokens joined by a single space; tokens cannot contain
    spaces (the tokenizer splits on non-alphanumerics), so the string is a
    lossless composite key that both Spark and SQL oracles can group/join on
    without struct-encoding differences.
    """
    pairs = F.when(
        F.size(F.col("__t")) >= 2,
        F.expr(
            "transform(sequence(0, size(__t) - 2),"
            " i -> concat(__t[i], ' ', __t[i + 1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col), tokenize(F.col(text_col)).alias("__t"))
        .select(id_col, F.explode(pairs).alias("bg"))
    )


def bigram_lm_score(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", alpha: float = ALPHA) -> DataFrame:
    """Per-document bigram cross-entropy under a corpus-trained add-alpha LM.

    Returns ``(id_col, n_bigrams BIGINT, xent DOUBLE)`` where
    ``xent = avg(-ln P(w2|w1))`` and
    ``P(w2|w1) = (c(w1 w2) + alpha) / (c(w1 ·) + alpha * V)``,
    with ``c(w1 ·)`` the count of bigrams starting with w1 and V the corpus
    vocabulary size. Documents with fewer than two tokens produce no row.

    One DAG: train and score share the exploded bigram stream. ``big`` has
    THREE consumers (bigram counts, context counts, scoring join) that group
    on different keys, so no exchange is reusable between them — without the
    cache the tokenize+explode map work over the whole corpus runs three
    times. Cached once, each consumer re-reads the materialized rows; AQE
    picks broadcast for the count sides when they fit.
    """
    big = doc_bigrams(docs, id_col, text_col).cache()
    bc = big.groupBy("bg").agg(F.count("*").alias("c_big"))
    cc = (
        big.groupBy(F.split("bg", " ").getItem(0).alias("w1"))
        .agg(F.count("*").alias("c_ctx"))
    )
    vocab = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    lp_micro = F.round(
        -F.log((F.col("c_big") + F.lit(alpha))
               / (F.col("c_ctx") + F.lit(alpha) * F.col("v"))) * 1e6
    ).cast("long")
    scored = (
        big.join(bc, "bg")
        .withColumn("w1", F.split("bg", " ").getItem(0))
        .join(cc, "w1")
        .crossJoin(vocab)
        .select(id_col, lp_micro.alias("lp_micro"))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.sum("lp_micro").alias("__s"))
        .select(
            id_col,
            "n_bigrams",
            F.round(F.col("__s") / 1e6 / F.col("n_bigrams"), 6).alias("xent"),
        )
    )
