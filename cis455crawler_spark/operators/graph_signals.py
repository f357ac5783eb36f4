"""Link-graph spam/nepotism signals (beyond reference).

The reference's Ranker is global PageRank only (Ranker.java:37-73); link-spam
demotion needs structural signals too. Reciprocal linking — A links B AND B
links A — at high rates is the classic nepotistic-link feature (Davison,
"Recognizing nepotistic links on the Web", AAAI 2000): organic endorsement is
mostly one-way, while link-exchange rings reciprocate densely. TrustRank
(operators/pagerank.py) demotes by trust distance; this is the complementary
local feature a curation gate can threshold per node or per host.

Shape: one distinct pass over the edge set, one self-equi-join on the swapped
key. Both sides shuffle on (src,dst)/(dst,src) hash — an equi-join Catalyst
plans as a plain shuffled hash/sort-merge join with AQE skew splitting; no
windows, no driver state, no all-pairs anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reciprocal_link_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-source reciprocity profile of a directed link graph.

    Self-loops drop (a page linking itself reciprocates trivially);
    duplicate edges collapse first so ratios are over the distinct graph.
    Returns (node, n_out, n_recip, recip_ratio) — n_recip counts out-edges
    whose reverse edge exists, ratio = n_recip / n_out rounded to 6.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    n_out = e.groupBy("src").agg(F.count("*").alias("n_out"))
    n_rec = recip.groupBy("src").agg(F.count("*").alias("n_recip"))
    return (
        n_out.join(n_rec, "src", "left")
        .select(
            F.col("src").alias("node"),
            "n_out",
            F.coalesce(F.col("n_recip"), F.lit(0)).alias("n_recip"),
            F.round(
                F.coalesce(F.col("n_recip"), F.lit(0)) / F.col("n_out"), 6
            ).alias("recip_ratio"),
        )
    )


def cocitation_pairs(
    edges: DataFrame, max_outdeg: int = 50, min_shared: int = 2
) -> DataFrame:
    """Co-citation counts (Small, JASIS 1973): pairs of pages cited BY
    the same page, the classic relatedness signal complementing the
    link-walk ranks (HITS/SALSA see endorsement; co-citation sees
    topical association — two pages repeatedly cited together are about
    the same thing even if they never link to each other).

    (dst_a, dst_b, cocited) with dst_a < dst_b, counting distinct citing
    pages. Scale guard: a directory/hub page citing 10^4 targets emits
    10^8 pairs and co-cites everything — not association evidence. Citing
    pages with out-degree > max_outdeg are dropped BEFORE pairing (the
    mirror/containment df-cap shape), bounding per-src fan-out at
    max_outdeg^2. Bibliographic coupling (Kessler 1963) is this operator
    on the transposed edge set — swap src/dst at the call site."""
    e = edges.select("src", "dst").distinct()
    od = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    capped = e.join(od.filter(F.col("outdeg") <= max_outdeg), "src").select(
        "src", "dst"
    )
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.src") == F.col("b.src"))
            & (F.col("a.dst") < F.col("b.dst")),
        )
        .groupBy(F.col("a.dst").alias("dst_a"), F.col("b.dst").alias("dst_b"))
        .agg(F.count("*").alias("cocited"))
        .filter(F.col("cocited") >= min_shared)
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree correlation across edges (Newman, PRL 2002): the Pearson
    correlation between the out-degree of an edge's source and the
    in-degree of its target. The web graph is famously DISassortative
    (hubs point at low-degree pages, r < 0); a crawled subgraph whose r
    drifts positive is a classic link-farm / trap-neighborhood smell, so
    this is a one-row health metric over the whole link graph.

    Numerical shape matters for the cross-engine oracle: Pearson is
    computed from EXACT integer sums (n, Σx, Σy, Σxy, Σx², Σy² — all
    64-bit longs, map-side combinable), each CAST TO DOUBLE before any
    cross-sum product — n*sxx is already past 2^63 for quite moderate
    graphs, and under ANSI mode a long product overflow kills the job.
    The double products are the same IEEE ops on every engine — never a
    built-in corr() whose streaming summation differs between engines.
    Returns one row (n_edges, mean_out, mean_in, assortativity)."""
    e = edges.select("src", "dst").distinct()
    od = e.groupBy("src").agg(F.count("*").alias("x"))
    idg = e.groupBy("dst").agg(F.count("*").alias("y"))
    xy = e.join(od, "src").join(idg, "dst")
    s = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col(c).cast("double") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
    )
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return s.select(
        F.col("n").alias("n_edges"),
        F.round(F.col("sx") / F.col("n"), 6).alias("mean_out"),
        F.round(F.col("sy") / F.col("n"), 6).alias("mean_in"),
        F.round(
            F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6
        ).alias("assortativity"),
    )
