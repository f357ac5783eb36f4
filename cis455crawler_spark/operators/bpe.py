"""BPE merge-pair statistics: the core aggregation of byte-pair-encoding
tokenizer training (Sennrich, Haddow, Birch — ACL 2016).

BPE training is: build a word-frequency table, count adjacent symbol
pairs weighted by word frequency, merge the top pair, repeat. The
repeat-loop is inherently sequential (each merge changes the next
counts), but the EXPENSIVE part — the corpus-wide pair count — is one
Spark aggregation, and the word-frequency table it runs over is
vocabulary-sized (millions of rows for a 100 TB corpus, because the
corpus collapses to distinct words first). That is exactly how
production BPE trainers work: one distributed pass builds the word
table, then the merge loop runs over that compact table.

This module implements the distributed passes: the word table (corpus →
vocab collapse, map-side combinable) and the first-merge pair count over
it (char-level symbols). Both are pure Column expressions — substr over
a sequence, explode, groupBy — in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def word_frequency_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n_words) corpus word-frequency table — the 100TB -> vocab
    collapse every BPE trainer starts with. One map-side-combinable
    groupBy; stopwords KEPT (a tokenizer must see them)."""
    return (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_words"))
    )


def bpe_pair_counts(word_freq: DataFrame) -> DataFrame:
    """(pair, n_vocab, total_count) adjacent character-pair counts over
    the word-frequency table — the statistic whose argmax is BPE merge #1.
    total_count weights each in-word occurrence by the word's corpus
    frequency; n_vocab counts distinct words containing the pair."""
    n = F.length("word")
    # Column.substr takes Column offsets (F.substring is int-only)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.col("word").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = word_freq.select(
        "n_words", F.explode(pairs).alias("pair"), F.col("word")
    )
    return ex.groupBy("pair").agg(
        F.countDistinct("word").alias("n_vocab"),
        F.sum("n_words").alias("total_count"),
    )
