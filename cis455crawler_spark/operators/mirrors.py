"""Mirror-host detection and asymmetric containment dedup.

Mirror detection (Bharat & Broder, WWW 1999, "Mirror, mirror on the web")
finds host PAIRS serving largely the same content — mirrors waste crawl
budget and skew link-based ranking (every mirrored page doubles its
inlinks). The Spark-first shape: fingerprint each page (md5 of extracted
text), self-join hosts THROUGH the fingerprint, count shared prints per
host pair, then divide by each host's print count for directional overlap.

The scale hazard is the fingerprint self-join: a print present on M hosts
emits M^2/2 pairs, and an empty-page print can sit on every host. Standard
mitigation (also Bharat&Broder's): drop fingerprints shared by more than
`max_hosts_per_print` hosts before pairing — such prints are boilerplate,
not mirroring evidence. After the cap, per-print pair fan-out is bounded
by max_hosts_per_print^2, so the join cannot explode regardless of corpus
size. Pair ordering (h1 < h2) halves the output and makes it deterministic.

Containment (Broder 1997's other resemblance measure) is the asymmetric
variant for quote/subset detection: C(A,B) = |S(A) ∩ S(B)| / |S(A)| — a
short doc fully quoted inside a long one scores 1.0 on containment but
low on Jaccard, so the symmetric dedups miss it. Same join shape as the
n-gram Jaccard pass (shared-shingle counting with a doc-frequency cap),
normalized by the CONTAINED side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint_md5, shingles, tokenize


def host_fingerprints(
    pages: DataFrame, host_col: str = "host", text_col: str = "text"
) -> DataFrame:
    """(host, fp) distinct content fingerprints per host — the shared
    fingerprint_md5 (lowercase + whitespace-collapse normalization), so
    mirrored pages differing only in case/whitespace still match and the
    engine has ONE page-fingerprint definition (same key exact_dedup
    uses)."""
    return pages.select(
        F.col(host_col).alias("host"),
        fingerprint_md5(F.col(text_col)).alias("fp"),
    ).distinct()


def mirror_host_pairs(
    prints: DataFrame,
    max_hosts_per_print: int = 20,
    min_shared: int = 2,
) -> DataFrame:
    """(host_a, host_b, shared, n_a, n_b, overlap_a, overlap_b) for host
    pairs sharing >= min_shared capped fingerprints; overlap_x = shared /
    |capped prints(x)| (directional: a near-complete mirror of a subset
    host shows overlap ~1.0 on the smaller side). Both the intersection
    AND the normalizing sizes are over the CAPPED print sets — a host
    whose pages are mostly boilerplate served everywhere should score
    high overlap on its few informative mirrored pages, not be diluted
    by prints the cap already ruled out as evidence (same choice as
    containment_pairs below)."""
    per_print = prints.groupBy("fp").agg(
        F.countDistinct("host").alias("n_hosts")
    )
    capped = (
        prints.join(
            per_print.filter(F.col("n_hosts") <= max_hosts_per_print), "fp"
        )
        .select("host", "fp")
        # three consumers (self-join both sides + sizes) — materialize the
        # capped prints once, lazily; blocks are freed by the context
        # cleaner (the chunking.py no-cache-leak pattern)
        .localCheckpoint(eager=False)
    )
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.host") < F.col("b.host")))
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sizes = capped.groupBy("host").agg(F.count("*").alias("n_prints"))
    return (
        # sizes is host-cardinality — millions of rows at web scale, so no
        # forced broadcast; AQE picks broadcast vs sort-merge from runtime
        # stats (the pair table is the big side either way)
        pairs.join(
            sizes.withColumnRenamed("host", "host_a").withColumnRenamed("n_prints", "n_a"),
            "host_a",
        )
        .join(
            sizes.withColumnRenamed("host", "host_b").withColumnRenamed("n_prints", "n_b"),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            "shared",
            "n_a",
            "n_b",
            F.round(F.col("shared") / F.col("n_a"), 6).alias("overlap_a"),
            F.round(F.col("shared") / F.col("n_b"), 6).alias("overlap_b"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_docs_per_shingle: int = 50,
) -> DataFrame:
    """(contained, container, shared, n_contained, containment) pairs
    where containment = |shingles(contained) ∩ shingles(container)| /
    |shingles(contained)| >= threshold, contained != container. Both the
    intersection AND the normalizing size are over the CAPPED shingle
    sets (hot boilerplate shingles removed) — containment over the
    informative shingles, which is what quoting evidence means.

    Both directions are emitted from one ordered join (each unordered doc
    pair is scored twice, once per normalization side). Hot shingles
    (df > max_docs_per_shingle) are boilerplate, not quoting evidence —
    dropped before pairing, which bounds the per-shingle fan-out exactly
    like the mirror pass."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(shingles(tokenize(F.col(text_col)), k))
        ).alias("sh"),
        # zero-token docs fall back to one "" shingle in shingles();
        # without this filter every empty-extraction page would pair with
        # every other at containment 1.0
    ).filter(F.col("sh") != "")
    per_sh = sh.groupBy("sh").agg(F.countDistinct("doc_id").alias("n_docs"))
    capped = (
        sh.join(per_sh.filter(F.col("n_docs") <= max_docs_per_shingle), "sh")
        .select("doc_id", "sh")
        # three consumers (self-join both sides + sizes): without this the
        # shingle explode + df-cap join lineage re-runs per consumer
        .localCheckpoint(eager=False)
    )
    sizes = capped.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = capped.alias("a")
    b = capped.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("contained"),
            F.col("b.doc_id").alias("container"),
        )
        .agg(F.count("*").alias("shared"))
    )
    return (
        # sizes is doc-cardinality (10^10 at target scale) — never a
        # forced broadcast; the join key is the group key, AQE decides
        shared.join(
            sizes.withColumnRenamed("doc_id", "contained").withColumnRenamed("n_sh", "n_contained"),
            "contained",
        )
        .withColumn(
            "containment", F.round(F.col("shared") / F.col("n_contained"), 6)
        )
        .filter(F.col("containment") >= threshold)
        .select("contained", "container", "shared", "n_contained", "containment")
    )
