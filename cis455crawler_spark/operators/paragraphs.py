"""Paragraph-level corpus curation: CCNet-style corpus-wide paragraph
dedup and C4-style within-document line dedup.

CCNet (Wenzek et al., LREC 2020) deduplicates Common Crawl at the
*paragraph* level: every paragraph is hashed, hashes are counted over the
whole corpus, and paragraphs that occur in many documents (navigation bars,
cookie banners, boilerplate footers) are dropped from every document that
contains them. C4 (Raffel et al., JMLR 2020 §2.2) additionally removes
*repeated lines within one page* keeping only the first occurrence.

Both are expressed as pure DataFrame plans:

- ``explode_paragraphs`` — one shuffle-free projection: split + slice +
  explode inside whole-stage codegen. No Python.
- ``paragraph_dedup_stats`` — ONE shuffle on the paragraph hash with
  map-side partial aggregation (a footer repeated 10^8 times collapses to
  one (hash, partial-count) row per map task before the shuffle), then a
  hash-join of the per-paragraph doc-frequency back onto the exploded
  paragraphs. The join is skew-safe under AQE (the hot hash joins N rows
  to ONE dimension row, exactly the shape AQE skew-split handles), and the
  final per-document rollup shuffles on doc_id, which is near-uniform by
  construction.
- ``dedup_lines_within_doc`` — doc-local only: both aggregations group by
  (doc_id, ...) so the shuffle key includes doc_id and no corpus-wide hot
  key can form.

No counterpart in the reference crawler (it dedups whole URLs/pages, not
paragraphs); these extend the engine for LLM-corpus curation per
SURVEY.md §6 / §2.11.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import bind_once


def explode_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_per_para: int = 5,
) -> DataFrame:
    """(id, para_idx, para) — one row per fixed-width token window.

    Real pipelines split on blank lines; the driver's synthetic documents
    are single-line, so paragraph structure is synthesized as consecutive
    non-overlapping ``tokens_per_para``-token windows (the trailing partial
    window is kept). The shape downstream operators see — (doc, ordinal,
    paragraph-text) — is identical either way, and a newline-splitting
    front-end is a one-line swap of this function.
    """
    k = tokens_per_para

    # bind the token array once per row: the per-window lambda below slices
    # it, and an unbound `arr` expression would re-split the whole document
    # per window (HOF bodies re-evaluate captured expressions per element —
    # the shingles() O(n^2) trap, functions/text.py bind_once)
    def _over_arr(arr: Column) -> Column:
        n_para = F.ceil(F.size(arr) / F.lit(float(k))).cast("int")
        idxs = F.when(n_para > 0, F.sequence(F.lit(0), n_para - 1)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idxs,
            lambda i: F.struct(
                i.cast("bigint").alias("para_idx"),
                F.array_join(F.slice(arr, i * k + 1, k), " ").alias("para"),
            ),
        )

    pairs = bind_once(
        F.filter(F.split(F.col(text_col), " +"), lambda x: x != ""), _over_arr
    )
    return (
        docs.select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, "p.para_idx", "p.para")
    )


def paragraph_dedup_stats(
    paras: DataFrame,
    max_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide paragraph dedup (CCNet): drop every paragraph whose
    doc-frequency reaches ``max_docs``; per document report

      (id, n_para, n_kept, kept_md5)

    where kept_md5 is md5 of the surviving paragraphs re-joined with
    newlines in original order (NULL when every paragraph was dropped).
    """
    # THREE consumers (doc-frequency count, the kept join, per-doc totals):
    # materialize the hashed paragraphs once, lazily (no cache leak), and
    # compute ALL of them from this frame so the upstream paragraph explode
    # never re-runs
    with_h = paras.withColumn("h", F.md5("para")).localCheckpoint(eager=False)
    doc_freq = with_h.groupBy("h").agg(
        F.countDistinct(id_col).alias("para_df")
    )
    kept = with_h.join(doc_freq, "h").filter(F.col("para_df") < max_docs)
    kept_stats = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("para_idx", "para"))),
                    lambda s: s["para"],
                ),
                "\n",
            )
        ).alias("kept_md5"),
    )
    totals = with_h.groupBy(id_col).agg(F.count("*").alias("n_para"))
    return (
        totals.join(kept_stats, id_col, "left")
        .select(
            id_col,
            "n_para",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "kept_md5",
        )
    )


def dedup_lines_within_doc(
    paras: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-document repeated-line removal (C4): keep only the FIRST
    occurrence of each distinct paragraph inside a document; per document
    report (id, n_para, n_uniq, kept_md5) with kept_md5 over the survivors
    in original order. Doc-local: every shuffle key contains doc_id.
    """
    firsts = (
        paras.groupBy(id_col, F.md5("para").alias("h"))
        .agg(
            F.min("para_idx").alias("para_idx"),
            # all rows in the group share the same para text (same md5):
            # min() is a deterministic way to pick it without a join-back
            F.min("para").alias("para"),
        )
    )
    totals = paras.groupBy(id_col).agg(F.count("*").alias("n_para"))
    uniq = firsts.groupBy(id_col).agg(
        F.count("*").alias("n_uniq"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("para_idx", "para"))),
                    lambda s: s["para"],
                ),
                "\n",
            )
        ).alias("kept_md5"),
    )
    return totals.join(uniq, id_col)
