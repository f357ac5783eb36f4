"""Corpus-wide token-span operators for a training-data pipeline:
exact duplicate-span detection and benchmark decontamination.

Duplicate-span detection is the distributed analogue of suffix-array exact
substring dedup (Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better"): instead of a global suffix array — which needs a
corpus-wide sort of every suffix — each document emits rolling k-token span
fingerprints (pure JVM: shingles + hash), and one shuffle on the
fingerprint counts corpus-wide occurrences. That is the scale-honest shape:
cross-document comparison is inherently one shuffle on the span key, with
map-side partial aggregation and AQE skew-splitting on boilerplate spans.

Decontamination is the GPT-3-style n-gram overlap check (Brown et al. 2020
§C): a document is contaminated when any of its 13-gram fingerprints
appears in the benchmark set. The benchmark side is small by construction
(thousands of eval documents vs. a web corpus), so it broadcasts; the
corpus side never shuffles on the gram key — explode, broadcast semi-join,
then one groupBy on doc_id.

No counterpart in the reference crawler (it deduplicates whole URLs, not
spans); these extend the engine for LLM-corpus curation per SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles, tokenize


def span_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 10,
    digest: str = "md5",
) -> DataFrame:
    """(id, pos, fp) — one row per rolling `span`-token window of each
    document. Documents shorter than `span` emit their whole token
    sequence as a single span; token-less documents emit nothing.
    digest='md5' is oracle-verifiable; 'xxhash64' is the cheaper
    production key (64-bit collisions are ~n^2/2^64 — negligible below
    ~10^9 distinct spans; use md5 beyond that)."""
    toks = tokenize(F.col(text_col))
    grams = shingles(toks, span)
    hash_fn = F.md5 if digest == "md5" else F.xxhash64
    return (
        df.select(F.col(id_col).alias("id"), F.posexplode(grams).alias("pos", "gram"))
        .filter(F.col("gram") != "")
        .select("id", "pos", hash_fn(F.col("gram")).alias("fp"))
    )


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 10,
    digest: str = "md5",
) -> DataFrame:
    """Per-document exact-substring duplication profile: how many of the
    document's `span`-token windows occur more than once in the whole
    corpus (including same-document repeats).

    Shape (skew-proof, VERDICT r3 #3): pre-aggregate to (id, fp) counts —
    map-side partial aggregation collapses same-document boilerplate
    repeats BEFORE the shuffle — then groupBy(fp) for corpus totals
    (again map-side combinable: a span repeated 10^8 times arrives at the
    reduce task as one partial row per map task, not 10^8 rows), and one
    equi-join back on fp whose residual skew AQE's skew-join splits.
    The earlier Window.partitionBy("fp") put every occurrence of a hot
    fingerprint in ONE task — AQE splits skewed joins, not window
    partitions — so a boilerplate span was a guaranteed straggler."""
    fps = span_fingerprints(df, text_col, id_col, span, digest)
    per_doc = fps.groupBy("id", "fp").agg(F.count("*").alias("n_in_doc"))
    totals = per_doc.groupBy("fp").agg(F.sum("n_in_doc").alias("n_fp"))
    tagged = per_doc.join(totals, "fp")
    return (
        tagged.groupBy("id")
        .agg(
            F.sum("n_in_doc").alias("n_spans"),
            F.sum(
                F.when(F.col("n_fp") > 1, F.col("n_in_doc")).otherwise(0)
            ).alias("n_dup_spans"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_spans",
            "n_dup_spans",
            F.round(F.col("n_dup_spans") / F.col("n_spans"), 6).alias("dup_span_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    digest: str = "md5",
) -> DataFrame:
    """Per-document benchmark-overlap profile: n_contam_grams = how many
    DISTINCT n-grams of the document appear anywhere in `benchmark`
    (a DataFrame with the same text column); contaminated = 1 if any do.

    The benchmark gram set is deduplicated then BROADCAST — the corpus
    side joins map-side with zero shuffle on the gram key and aggregates
    once on doc_id. Filter `contaminated == 0` downstream to drop eval
    leakage from a training corpus."""
    bench_fps = F.broadcast(
        span_fingerprints(benchmark, text_col, id_col, n, digest)
        .select("fp")
        .distinct()
    )
    doc_fps = span_fingerprints(docs, text_col, id_col, n, digest)
    hits = (
        doc_fps.join(bench_fps, "fp", "left_semi")
        .groupBy("id")
        .agg(F.count_distinct("fp").alias("n_contam_grams"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_contam_grams", F.lit(0)).alias("n_contam_grams"),
            F.when(F.coalesce("n_contam_grams", F.lit(0)) > 0, 1)
            .otherwise(0)
            .alias("contaminated"),
        )
    )
