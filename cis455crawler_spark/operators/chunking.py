"""Training-data sequence preparation: token chunking and sequence packing.

Beyond the reference (its Indexer consumes whole documents,
Indexer/src/edu/upenn/cis455/mapreduce/job/Indexer.java:143-148) — these are
the ops an LLM-training pipeline runs between a curated corpus and a data
loader:

* chunk_documents — fixed-size token windows with overlap (context-window
  chunking). Per-doc local: one tokenize pass, window slices built with
  sequence/transform/slice inside the row, exploded once. No shuffle at all —
  the plan is scan -> project -> generate, embarrassingly parallel at any
  corpus size.

* pack_token_spans — GPT-style sequence packing: documents are concatenated
  in a deterministic global order and cut every `seq_len` tokens; each doc's
  token range maps onto one or more (seq_id, offset) spans. The global
  prefix-sum is the scale problem: a bare window cumsum is one partition.
  Here it is two-phase — per-bucket window cumsums run in parallel, and the
  bucket base offsets come from a tiny groupBy(bucket) rollup (num_buckets
  rows, broadcast) prefix-summed by a second window over that tiny frame.
  The caller supplies the bucket as a MONOTONE function of the order key
  (range bucketing, e.g. doc_id DIV 64) — same contract as the seen table's
  bucket layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize


def chunk_documents(
    docs: DataFrame,
    size: int = 128,
    stride: int = 96,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk) — token windows of `size` starting
    every `stride` tokens (overlap = size - stride). Stopwords are KEPT
    (training text, not an index). The final window is the remainder (may be
    shorter than `size`); empty/NULL texts yield no chunks."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        # gapped windows would leave tokens uncovered AND the chunk-count
        # formula would emit empty tail chunks — reject rather than guess
        raise ValueError("stride must be <= size (windows must cover the stream)")
    base = docs.select(
        F.col(doc_col).alias("doc_id"), tokenize(F.col(text_col)).alias("_toks")
    )
    n = F.size("_toks")
    # number of stride-starts that still have at least one token:
    # ceil((n - size)/stride) extra windows after the first
    n_chunks = (
        F.when(
            n > 0,
            F.lit(1)
            + F.greatest(F.lit(0), F.ceil((n - F.lit(size)) / F.lit(stride))),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    # NB sequence(0, -1) is a DESCENDING two-element sequence in Spark, not
    # empty — zero-chunk docs must short-circuit to an empty array
    starts = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunked = base.select(
        "doc_id",
        F.posexplode(
            F.transform(starts, lambda i: F.slice(F.col("_toks"), i * stride + 1, size))
        ).alias("chunk_id", "_ctoks"),
    )
    return chunked.select(
        "doc_id",
        "chunk_id",
        F.size("_ctoks").alias("n_tokens"),
        F.array_join("_ctoks", " ").alias("chunk"),
    )


def bucket_offsets(counts: DataFrame) -> DataFrame:
    """(bucket, base) — global start offset of each bucket's token stream.
    `counts` must have (bucket, n). The rollup is num_buckets rows: the
    single-partition window over it is over a TINY frame, not the corpus."""
    per_bucket = counts.groupBy("bucket").agg(F.sum("n").alias("_bn"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    return per_bucket.select(
        "bucket", F.coalesce(F.sum("_bn").over(w), F.lit(0)).alias("base")
    )


def global_cumsum(
    base: DataFrame, inclusive: bool = False
) -> DataFrame:
    """Two-phase corpus-scale cumulative sum — the shared scaffolding of
    pack_token_spans and systematic_weighted_sample (operators/sampling).

    `base` must carry (id, bucket, n) with bucket MONOTONE in id (range
    bucketing). Returns base + a `cum` column: the sum of n over all rows
    with smaller id (exclusive, the packing "start") or up to and
    including this row (inclusive, the sampling wheel position).
    Per-bucket windows + bucket_offsets' tiny broadcast rollup — never a
    global window. The input is materialized once with a LAZY
    localCheckpoint (two consumers; blocks freed by the context cleaner —
    no in-operator cache leak)."""
    base = base.localCheckpoint(eager=False)
    upper = Window.currentRow if inclusive else -1
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    local = base.withColumn(
        "_local", F.coalesce(F.sum("n").over(w_local), F.lit(0))
    )
    offsets = bucket_offsets(base.select("bucket", "n"))
    return local.join(F.broadcast(offsets), "bucket").select(
        "id",
        "bucket",
        "n",
        (F.col("_local") + F.col("base")).alias("cum"),
    )


def pack_token_spans(
    docs: DataFrame,
    seq_len: int = 2048,
    doc_col: str = "doc_id",
    text_col: str = "text",
    bucket_col=None,
) -> DataFrame:
    """(doc_id, n_tokens, start, seq_id, seq_offset, tok_begin, span_len) —
    map each document's token range onto fixed-`seq_len` training sequences
    under GPT-style packing (concatenate all docs in doc_id order, cut every
    seq_len tokens; doc boundaries may straddle cuts).

    `bucket_col` (Column) MUST be monotone in `doc_col` (range bucketing);
    default `doc_id DIV 64` suits dense integer ids. Per-bucket cumsums are
    parallel windows; cross-bucket bases come from bucket_offsets()'s tiny
    rollup, broadcast back in. Zero-token docs are dropped (they occupy no
    span). One row per (doc, sequence) overlap:
      seq_offset = where in the sequence the span begins (0-based)
      tok_begin  = 1-based first token of the span within the doc
      span_len   = tokens of this doc landing in this sequence."""
    if bucket_col is None:
        bucket_col = (F.col(doc_col) / 64).cast("long")
    base = docs.select(
        F.col(doc_col).alias("id"),
        bucket_col.alias("bucket"),
        F.size(tokenize(F.col(text_col))).alias("n"),
    ).filter(F.col("n") > 0)
    placed = global_cumsum(base, inclusive=False).select(
        F.col("id").alias("doc_id"),
        F.col("n").alias("n_tokens"),
        F.col("cum").alias("start"),
    )
    first_seq = F.floor(F.col("start") / seq_len)
    last_seq = F.floor((F.col("start") + F.col("n_tokens") - 1) / seq_len)
    spans = placed.select(
        "doc_id",
        "n_tokens",
        "start",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    span_begin = F.greatest(F.col("start"), F.col("seq_id") * seq_len)
    span_end = F.least(
        F.col("start") + F.col("n_tokens"), (F.col("seq_id") + 1) * seq_len
    )
    return spans.select(
        "doc_id",
        "n_tokens",
        "start",
        "seq_id",
        (span_begin - F.col("seq_id") * seq_len).cast("int").alias("seq_offset"),
        (span_begin - F.col("start") + 1).cast("int").alias("tok_begin"),
        (span_end - span_begin).cast("int").alias("span_len"),
    )
