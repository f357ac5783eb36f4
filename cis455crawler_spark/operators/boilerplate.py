"""Per-host boilerplate line removal (beyond reference) — the CCNet/RefinedWeb
template-stripping pass every web-text training pipeline runs between crawl
and dedup: nav bars, cookie banners, footers, and share widgets repeat on
most pages of a host; left in, they dominate n-gram statistics, poison
MinHash/SimHash signatures (template overlap masquerades as content overlap),
and waste tokens in the training mix.

Definition used (the CCNet line-level rule): a LINE is boilerplate for host H
when it appears in >= min_frac of H's documents (and at least min_docs of
them). Detection and stripping are pure built-in DataFrame ops:

    docs -> explode lines (distinct per doc)        [one shuffle: host,line]
         -> count per (host, line) vs docs-per-host -> boilerplate set
    docs -> posexplode lines -> left-join the set (mark) -> ONE groupBy(doc)
         computing kept lines + totals + ordered re-assembly together

100-TB notes: the frequency aggregation keys on (host, line) — fine-grained,
partial+final, no skew pivot (a mega-host spreads over its distinct lines).
The boilerplate set is tiny relative to the corpus (lines crossing the
min_frac bar), so AQE turns the mark join into a broadcast; at extreme corpus
sizes group on xxhash64(line) instead and keep one exemplar line per hash
(64-bit collisions are immaterial for a >=50%-frequency test). Documents
re-assemble via collect_list(struct(pos,line)) — bounded by a single
document's line count, the same per-doc bound the parse UDF already holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boilerplate_lines(
    docs: DataFrame,
    host_col: str = "host",
    doc_col: str = "doc_id",
    text_col: str = "text",
    min_frac: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """(host, line, n_docs_with_line, n_docs) — the lines to strip per host.

    A line repeated inside ONE document counts once (distinct per doc): the
    frequency test is "how many of the host's documents carry this line",
    not raw occurrence count."""
    host = F.col(host_col)
    lines = (
        docs.select(
            host.alias("host"),
            F.col(doc_col).alias("doc_id"),
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
            ).alias("line"),
        )
        .where(F.trim(F.col("line")) != "")
        .distinct()
    )
    host_docs = docs.groupBy(host.alias("host")).agg(
        F.countDistinct(doc_col).alias("n_docs")
    )
    freq = lines.groupBy("host", "line").agg(
        F.count("*").alias("n_docs_with_line")
    )
    return (
        freq.join(host_docs, "host")
        .where(
            (F.col("n_docs_with_line") >= min_docs)
            & (F.col("n_docs_with_line") >= F.lit(min_frac) * F.col("n_docs"))
        )
        .select("host", "line", "n_docs_with_line", "n_docs")
    )


def strip_boilerplate(
    docs: DataFrame,
    host_col: str = "host",
    doc_col: str = "doc_id",
    text_col: str = "text",
    min_frac: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """(doc_id, host, clean_text, n_lines, n_stripped) — every input document
    with its host's boilerplate lines removed, remaining lines re-joined in
    original order. Documents whose every line is boilerplate (and NULL-text
    documents) come back with clean_text = '' (kept, not dropped — dropping
    is a downstream quality filter's decision).

    Two passes over the text column total: boilerplate_lines' frequency
    explode, then ONE mark-and-aggregate pass (left join the boilerplate
    set, one groupBy computing kept lines, totals, and the ordered
    re-assembly together — no separate anti-join + totals scans)."""
    bp = boilerplate_lines(
        docs,
        host_col=host_col,
        doc_col=doc_col,
        text_col=text_col,
        min_frac=min_frac,
        min_docs=min_docs,
    ).select("host", "line", F.lit(1).alias("_bp"))

    exploded = docs.select(
        F.col(host_col).alias("host"),
        F.col(doc_col).alias("doc_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    ).where(F.trim(F.col("line")) != "")

    marked = exploded.join(bp, ["host", "line"], "left").withColumn(
        "_keep", F.when(F.col("_bp").isNull(), 1).otherwise(0)
    )
    rebuilt = marked.groupBy("doc_id", "host").agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(F.struct("pos", "_keep", "line"))),
                    lambda s: s["_keep"] == 1,
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.sum("_keep").alias("n_lines"),
        F.count("*").alias("n_total"),
    )

    base = docs.select(
        F.col(doc_col).alias("doc_id"), F.col(host_col).alias("host")
    )
    return base.join(rebuilt, ["doc_id", "host"], "left").select(
        "doc_id",
        "host",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        (
            F.coalesce("n_total", F.lit(0)) - F.coalesce("n_lines", F.lit(0))
        ).alias("n_stripped"),
    )
