"""Inverted-index layout analytics: delta-gap + varint size accounting.

The reference serializes postings as plain text lines ("docid:tf ..."
Indexer/FileManagement.java postings assembly; cited in operators/indexer);
a production index stores each term's sorted doc_id list as delta gaps in
LEB128-style varints (the Lucene/WAND family layout). This operator computes,
per term, exactly how many bytes that encoding needs — the sizing input for
index shard planning (bytes/posting decides how many terms fit a shard, and
the compression ratio vs raw int64 is the storage budget line).

Skew is the design constraint: a stopword-grade term can hold 10^9+ postings,
so a `Window.partitionBy(word)` lag would put that term's whole postings list
in ONE task (the same straggler shape fixed in operators/spans.py round 4).
The gap computation is therefore TWO-PHASE, the pack_token_spans pattern:

  phase 1  lag within (word, bucket) where bucket = doc_id DIV bucket_size —
           partitions are bounded by bucket_size regardless of term
           frequency, so the hot term becomes many uniform tasks;
  phase 2  per-(word,bucket) partials (inner byte sum, min/max doc_id, count)
           collapse map-side; the cross-bucket BOUNDARY gaps come from a lag
           over the bucket-level table, whose partitions hold at most
           (doc_id_range / bucket_size) rows per word — 10^4 rows at 10^10
           docs with the default 2^20 bucket, never the postings themselves.

Varint width uses an integer threshold ladder, not floor(log2(gap)/7):
log2 via ln-ratio is float and engines disagree at exact powers of two;
the ladder is branch-exact everywhere (and what an encoder actually does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def varint_bytes(gap: Column) -> Column:
    """LEB128 byte count for a positive integer gap (7 payload bits/byte).

    Integer comparisons only — deterministic on every engine. Gaps here are
    doc_id deltas >= 1; 5 bytes covers anything below 2^35 (a 10^10-doc
    corpus), beyond that an encoder would continue the ladder.
    """
    return (
        F.when(gap < 128, 1)
        .when(gap < 16384, 2)
        .when(gap < 2097152, 3)
        .when(gap < 268435456, 4)
        .otherwise(5)
    )


def postings_varint_stats(
    postings: DataFrame,
    word_col: str = "word",
    doc_col: str = "doc_id",
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Per-term varint-encoded postings size vs raw int64.

    `postings` holds distinct (word, doc_id) pairs with doc_id >= 0. The
    first posting of a term is charged as gap = doc_id + 1 (the value
    itself, 1-based so doc_id 0 costs one byte), every later one as the
    delta to its predecessor in doc_id order. Returns one row per term:
    (word, df, bytes_varint, bytes_raw = 8*df, compression_ratio).
    """
    p = postings.select(
        F.col(word_col).alias("word"),
        F.col(doc_col).alias("doc_id"),
        F.floor(F.col(doc_col) / bucket_size).alias("bucket"),
    )
    # phase 1: gaps strictly inside a bucket (bounded partitions)
    w_in = Window.partitionBy("word", "bucket").orderBy("doc_id")
    inner = p.withColumn("_prev", F.lag("doc_id").over(w_in)).withColumn(
        "_gap", F.col("doc_id") - F.col("_prev")
    )
    per_bucket = inner.groupBy("word", "bucket").agg(
        F.count("*").alias("n"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        # bucket-first rows carry a NULL lag gap — they are charged by the
        # phase-2 boundary pass, so they must contribute NOTHING here (an
        # unguarded varint_bytes(NULL) would fall through to otherwise(5))
        F.coalesce(
            F.sum(F.when(F.col("_gap").isNotNull(), varint_bytes(F.col("_gap")))),
            F.lit(0),
        ).alias("inner_bytes"),
    )
    # phase 2: boundary gap of each bucket = its min_doc minus the previous
    # bucket's max_doc (the term's first bucket anchors at doc_id + 1)
    w_b = Window.partitionBy("word").orderBy("bucket")
    bounded = per_bucket.withColumn(
        "_prev_max", F.lag("max_doc").over(w_b)
    ).withColumn(
        "boundary_bytes",
        varint_bytes(
            F.when(
                F.col("_prev_max").isNull(), F.col("min_doc") + 1
            ).otherwise(F.col("min_doc") - F.col("_prev_max"))
        ),
    )
    out = bounded.groupBy("word").agg(
        F.sum("n").alias("df"),
        (F.sum("inner_bytes") + F.sum("boundary_bytes")).alias("bytes_varint"),
    )
    return out.select(
        "word",
        "df",
        "bytes_varint",
        (F.col("df") * 8).alias("bytes_raw"),
        F.round(F.col("df") * 8 / F.col("bytes_varint"), 6).alias(
            "compression_ratio"
        ),
    )


def term_block_maxscore(
    scored_postings: DataFrame, block_size: int = 64
) -> DataFrame:
    """Block-max WAND metadata (Ding & Suel, SIGIR 2011; Broder et al.,
    CIKM 2003): per (word, doc_id-range block) the maximum impact score,
    plus the term-wide upper bound. A WAND/BMW serve path uses term_max to
    skip whole terms and block_max to skip whole blocks without scoring a
    single posting — the standard top-k pruning layer above the postings
    the engine already builds.

    Input: (doc_id, word, score) rows — bm25_postings() output. Shape:
    one groupBy(word, block) with map-side partial MAX (a 10^9-posting
    stopword collapses to one partial row per map task per block), then
    the term-wide max via agg + dimension join back on word — NOT a
    window over word (same straggler-avoidance as duplicate_span_stats)."""
    blocks = (
        scored_postings.withColumn(
            "block_id", F.floor(F.col("doc_id") / block_size).cast("bigint")
        )
        .groupBy("word", "block_id")
        .agg(
            F.max("score").alias("_block_max"),
            F.count("*").alias("block_df"),
        )
    )
    term_max = blocks.groupBy("word").agg(
        F.max("_block_max").alias("_term_max")
    )
    return (
        blocks.join(term_max, "word")
        .select(
            "word",
            "block_id",
            F.round("_block_max", 6).alias("block_max"),
            "block_df",
            F.round("_term_max", 6).alias("term_max"),
        )
    )


def term_dict_frontcode_stats(
    terms: DataFrame, term_col: str = "word", bucket_chars: int = 1
) -> DataFrame:
    """Front-coded term-dictionary sizing (the Lucene .tim block layout):
    terms sorted within a bucket share their longest common prefix with
    the previous term and store only (lcp byte, suffix-length byte,
    suffix bytes); bucket heads store the full term. Per bucket:

      (bucket, n_terms, raw_bytes, front_bytes, compression_ratio)

    raw = 1 length byte + the term; front = 2 header bytes + suffix.
    Buckets are the leading `bucket_chars` characters — block boundaries
    at bucket edges are a layout CHOICE (Lucene restarts every 16 terms;
    restarting per prefix bucket is equally valid and makes the lag
    partition-local). Term dictionaries are vocabulary-sized (millions,
    not corpus-sized), so ~36^bucket_chars-way parallelism suffices;
    raise bucket_chars for wider fan-out.

    LCP is computed engine-side with no Python: slice both char arrays to
    the shorter length (so no null padding), zip_with equality, and take
    the first mismatch position — array ops inside codegen.

    Byte sizing assumes an ASCII vocabulary (1 char == 1 byte), which this
    engine's tokenizer guarantees ([a-z0-9] tokens only). For a non-ASCII
    dictionary both the lengths and the LCP would have to move to the
    UTF-8 byte level (octet_length + byte-array LCP) — char-level numbers
    UNDER-count multibyte terms; do not reuse this as a byte estimator
    outside the engine's own token stream."""
    t = terms.select(F.col(term_col).alias("word")).distinct()
    t = t.withColumn("bucket", F.substring("word", 1, bucket_chars))
    w = Window.partitionBy("bucket").orderBy("word")
    t = t.withColumn("prev", F.lag("word").over(w))
    ca = F.split(F.col("word"), "")
    cb = F.split(F.col("prev"), "")
    minlen = F.least(F.length("word"), F.length("prev"))
    eq = F.zip_with(
        F.slice(ca, 1, minlen), F.slice(cb, 1, minlen), lambda x, y: x == y
    )
    mismatch = F.array_position(eq, False)
    lcp = F.when(F.col("prev").isNull(), F.lit(0)).otherwise(
        F.when(mismatch > 0, mismatch - 1).otherwise(minlen)
    )
    sized = t.select(
        "bucket",
        F.length("word").alias("_len"),
        lcp.cast("bigint").alias("_lcp"),
    )
    return sized.groupBy("bucket").agg(
        F.count("*").alias("n_terms"),
        F.sum(F.col("_len") + 1).alias("raw_bytes"),
        F.sum(F.lit(2) + F.col("_len") - F.col("_lcp")).alias("front_bytes"),
        F.round(
            F.sum(F.col("_len") + 1)
            / F.sum(F.lit(2) + F.col("_len") - F.col("_lcp")),
            6,
        ).alias("compression_ratio"),
    )


def index_shard_plan(
    term_stats: DataFrame, n_shards: int = 16
) -> DataFrame:
    """Index shard sizing report: hash-partition the term dictionary into
    `n_shards` shards (md5-keyed — engine-portable and stable across
    runs, unlike JVM-specific hashes) and roll up per-shard byte /
    posting / term totals plus the balance ratio vs the mean shard.

    This is the planning pass before writing a sharded index
    (write.partitionBy(shard)): the balance column is the skew check —
    hash sharding the TERM key balances term counts but a shard that
    drew several stopword-grade terms can still carry outsized bytes,
    which is why the roll-up reports bytes, not just term counts.
    Input: postings_varint_stats() output (word, df, bytes_varint, ...).
    One map-side-combinable groupBy + a broadcast 1-row mean."""
    shard = F.pmod(
        F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long"),
        F.lit(n_shards),
    ).cast("int")
    per = (
        term_stats.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("bytes_varint").alias("total_bytes"),
            F.sum("df").alias("total_postings"),
        )
    )
    # every shard gets a row — an EMPTY shard is the most imbalanced
    # outcome possible (balance 0) and must not vanish from the report;
    # the mean divides by n_shards, not by the shards that happened to
    # receive terms
    all_shards = term_stats.sparkSession.range(n_shards).select(
        F.col("id").cast("int").alias("shard")
    )
    per = all_shards.join(per, "shard", "left").select(
        "shard",
        F.coalesce("n_terms", F.lit(0)).alias("n_terms"),
        F.coalesce("total_bytes", F.lit(0)).alias("total_bytes"),
        F.coalesce("total_postings", F.lit(0)).alias("total_postings"),
    )
    mean = per.agg(
        (F.sum("total_bytes") / F.lit(n_shards)).alias("_mean_bytes")
    )
    return per.crossJoin(F.broadcast(mean)).select(
        "shard",
        "n_terms",
        "total_bytes",
        "total_postings",
        F.round(F.col("total_bytes") / F.col("_mean_bytes"), 6).alias(
            "balance"
        ),
    )
