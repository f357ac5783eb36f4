"""Distributed connected components and duplicate-cluster resolution.

Near-duplicate PAIR generators (MinHash/LSH, SimHash, exact n-gram Jaccard
— operators/dedup_fuzzy.py) do not by themselves deduplicate a corpus: if
A~B and B~C, per-pair dropping either deletes too much (both B and C) or
leaves a duplicate, and similarity is not transitive enough to shortcut.
The standard resolution (used by every large-scale dedup pipeline) is to
treat pairs as edges, compute CONNECTED COMPONENTS, and keep one canonical
document per component.

Components here use the alternating large-star / small-star algorithm
(Kiveris et al. 2014, "Connected Components in MapReduce and Beyond"),
expressed entirely in DataFrame ops:

  large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
  small-star(u): over edges oriented hi→lo, m = min(N_lo(u)); emit (v, m)
                 for every lo-neighbor v plus (u, m)

Alternating the two converges to a forest of stars centered at each
component's minimum node in O(log² n) rounds — in practice ≤5 for
near-dup graphs, whose components are low-diameter clusters. Each half-step
is one groupBy (per-center min) + one join — two shuffles on node id, both
map-side combinable; a plain min-label propagation would instead need
O(diameter) rounds, which is unbounded on chain-shaped components.
Iterative lineage is truncated with localCheckpoint exactly as
operators/pagerank.py does.

The reference crawler has no counterpart (its dedup is whole-URL exact,
O-F6 `UrlProcessingThread.java`); this extends the engine for LLM-corpus
curation per SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as distinct (hi, lo) pairs, self-loops dropped."""
    a, b = F.col(src), F.col(dst)
    return (
        edges.select(F.greatest(a, b).alias("hi"), F.least(a, b).alias("lo"))
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """(v, min(N(u) ∪ {u})) for every neighbor v > u, over canonical edges."""
    sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
        e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    # v > u >= m, so the emitted pair is already (hi=v, lo=m) and loop-free
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Per hi-center: link every lo-neighbor (and the center) to the min."""
    mins = e.groupBy("hi").agg(F.min("lo").alias("m"))
    leaves = (
        e.join(mins, "hi")
        .filter(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
    )
    centers = mins.select("hi", F.col("m").alias("lo"))
    return leaves.unionByName(centers).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    rounds_out: list | None = None,
) -> DataFrame:
    """(id, component) for every node appearing in `edges`; component is
    the minimum node id of the node's connected component (so component
    labels are themselves real node ids). Node type is whatever the edge
    columns carry — any orderable Spark type.

    Converges when a full large+small round leaves the edge set unchanged
    (checked with one count+hash aggregate per round — the same
    action-per-iteration shape as pagerank); raises after `max_iter`
    rounds, which O(log² n) convergence never reaches in practice."""
    def _sig(df: DataFrame) -> tuple[int, int]:
        # bit_xor, not sum: ANSI mode makes a long-sum of 64-bit hashes
        # throw ARITHMETIC_OVERFLOW; xor is commutative and overflow-free
        # (edges are distinct, so no xor-cancellation of repeated rows)
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("hi", "lo")), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    e = _canonical(edges, src, dst).localCheckpoint(eager=True)
    sig = _sig(e)
    for i in range(max_iter):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
        nsig = _sig(nxt)
        e = nxt
        if nsig == sig:
            if rounds_out is not None:
                rounds_out.append(i + 1)
            break
        sig = nsig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # at the fixpoint the edges form stars (hi = member, lo = component min);
    # the center itself appears only as lo, so union it in explicitly
    members = e.groupBy("hi").agg(F.min("lo").alias("component")).select(
        F.col("hi").alias("id"), "component"
    )
    centers = e.select(F.col("lo").alias("id"), F.col("lo").alias("component")).distinct()
    return (
        members.unionByName(centers)
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )


def resolve_duplicates(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster near-duplicate pairs and pick one canonical doc per cluster:
    (id_col, cluster_id, is_canonical). cluster_id is the cluster's minimum
    doc id; docs in no pair are their own singleton cluster (canonical).
    Filter `is_canonical = 1` downstream to deduplicate the corpus."""
    comp = connected_components(pairs, src=a_col, dst=b_col, max_iter=max_iter)
    return (
        ids.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("component", F.col("id")).alias("cluster_id"),
            F.when(F.coalesce("component", F.col("id")) == F.col("id"), 1)
            .otherwise(0)
            .alias("is_canonical"),
        )
    )
