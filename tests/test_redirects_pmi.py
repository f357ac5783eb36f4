"""Redirect-chain resolution, index shard planning, co-occurrence PMI."""

import math

from pyspark.sql import Row

from cis455crawler_spark.operators.cooccurrence import (
    cooccurrence_pmi,
    top_vocab,
)
from cis455crawler_spark.operators.redirects import resolve_redirect_chains


def test_redirect_chains_designed(spark):
    redirects = spark.createDataFrame(
        [
            ("a", "b"),  # a -> b -> c -> T  (3 hops, resolves)
            ("b", "c"),
            ("c", "T"),
            ("d", "T"),  # single hop
            ("x", "y"),  # 2-cycle: never resolves
            ("y", "x"),
            ("long1", "long2"),  # 4-edge chain: unresolved at max_hops=3
            ("long2", "long3"),
            ("long3", "long4"),
            ("long4", "T"),
        ],
        "url string, target string",
    )
    out = {
        r.url: (r.final_url, r.hops, r.unresolved)
        for r in resolve_redirect_chains(redirects, max_hops=3).collect()
    }
    assert out["a"] == ("T", 3, False)
    assert out["b"] == ("T", 2, False)
    assert out["d"] == ("T", 1, False)
    # cycle bounces for 3 hops and the final target is still a redirect
    assert out["x"][2] and out["y"][2]
    # long chain: after 3 hops we sit on long4, itself still a redirect
    assert out["long1"] == ("long4", 3, True)
    assert out["long2"] == ("T", 3, False)

    # max_hops < 1 must refuse, not quietly follow one hop (ADVICE r4)
    import pytest

    with pytest.raises(ValueError, match="max_hops"):
        resolve_redirect_chains(redirects, max_hops=0)


def test_index_shard_plan_balance(spark):
    from cis455crawler_spark.operators.index_layout import index_shard_plan

    stats = spark.createDataFrame(
        [("alpha", 10, 12), ("beta", 5, 7), ("gamma", 2, 3), ("delta", 1, 2)],
        "word string, df long, bytes_varint long",
    )
    rows = index_shard_plan(stats, n_shards=4).collect()
    # EVERY shard reports, including empty ones (balance 0 is the skew
    # signal the operator exists for), and the mean divides by n_shards
    assert sorted(r.shard for r in rows) == [0, 1, 2, 3]
    total_bytes = sum(r.total_bytes for r in rows)
    total_terms = sum(r.n_terms for r in rows)
    assert total_bytes == 12 + 7 + 3 + 2
    assert total_terms == 4
    mean = total_bytes / 4
    for r in rows:
        assert abs(r.balance - round(r.total_bytes / mean, 6)) < 1e-9
    assert any(r.n_terms == 0 and r.balance == 0.0 for r in rows) or all(
        r.n_terms > 0 for r in rows
    )


def test_cooccurrence_pmi_designed(spark):
    toks = spark.createDataFrame(
        [
            # doc 1: a b c ; doc 2: a b ; doc 3: a c ; doc 4: a (twice)
            (1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "a"), (4, "a"),
        ],
        "doc_id long, word string",
    )
    vocab = {r.word: r.n_docs for r in top_vocab(toks, v=2).collect()}
    # a in 4 docs; b and c tie at 2 -> 'b' wins the ASC tie-break
    assert vocab == {"a": 4, "b": 2}
    out = {
        (r.word_a, r.word_b): (r.n_ab, r.n_a, r.n_b, r.pmi)
        for r in cooccurrence_pmi(toks, v=2, min_pairs=2).collect()
    }
    # only (a,b): co-occur in docs 1,2; N=4 total docs
    want_pmi = round(math.log(2 * 4 / (4 * 2)), 6)  # = ln(1) = 0
    assert out == {("a", "b"): (2, 4, 2, want_pmi)}


def _kmv_py(groups, k=16):
    import hashlib

    out = {}
    for g, keys in groups.items():
        us = sorted(
            int(hashlib.md5(x.encode()).hexdigest()[:13], 16) / float(16**13)
            for x in set(keys)
        )
        kept = us[:k]
        est = len(kept) if len(kept) < k else (k - 1) / kept[-1]
        out[g] = (len(kept), round(est, 3))
    return out


def test_kmv_matches_python_and_salt_invariant(spark):
    from cis455crawler_spark.operators.sketches import kmv_distinct

    rows = [
        ("big", f"url-{i}") for i in range(200)
    ] + [
        ("small", f"u{i}") for i in range(5)
    ] + [
        ("big", "url-0"),  # duplicate key must not perturb the sketch
    ]
    df = spark.createDataFrame(rows, "host string, url string")
    want = _kmv_py(
        {
            "big": [f"url-{i}" for i in range(200)],
            "small": [f"u{i}" for i in range(5)],
        }
    )
    for salt in (1, 4, 32):
        got = {
            r.host: (r.n_kept, r.kmv_estimate)
            for r in kmv_distinct(
                df, "host", "url", k=16, salt_buckets=salt
            ).collect()
        }
        assert got == want, salt
    # small group: sketch is exact
    assert want["small"] == (5, 5.0)
    # big group: estimate within 50% of truth at k=16
    assert 100 < want["big"][1] < 400


def test_cocitation_cap_and_counts(spark):
    from cis455crawler_spark.operators.graph_signals import cocitation_pairs

    edges = (
        [("s1", "a"), ("s1", "b"), ("s2", "a"), ("s2", "b"), ("s2", "c")]
        # hub citing 5 targets with cap 4 -> its pairs must not appear
        + [("hub", t) for t in ("a", "b", "c", "d", "e")]
        + [("s3", "a"), ("s3", "b")]
    )
    out = {
        (r.dst_a, r.dst_b): r.cocited
        for r in cocitation_pairs(
            spark.createDataFrame(edges, "src string, dst string"),
            max_outdeg=4,
            min_shared=2,
        ).collect()
    }
    # (a,b) co-cited by s1, s2, s3 (hub excluded); nothing else reaches 2
    assert out == {("a", "b"): 3}


def test_spam_mass_designed_graph(spark):
    from cis455crawler_spark.operators.pagerank import spam_mass

    # trusted core: t1 <-> t2; spam farm: s1 <-> s2 (no inbound trust
    # path); bridge page b fed by t1
    edges = [
        ("t1", "t2"), ("t2", "t1"), ("t1", "b"), ("b", "t1"),
        ("s1", "s2"), ("s2", "s1"),
    ]
    trusted = spark.createDataFrame([("t1",), ("t2",)], "node string")
    out = {
        r.node: (r.pr, r.tr, r.spam_mass)
        for r in spam_mass(
            spark.createDataFrame(edges, "src string, dst string"),
            trusted,
            iterations=5,
        ).collect()
    }
    # spam farm keeps global PageRank but gets ZERO TrustRank -> mass 1.0
    assert out["s1"][1] == 0.0 and out["s1"][2] == 1.0
    assert out["s2"][2] == 1.0
    # trusted pages have trust-scaled rank >= their share -> mass <= 0
    assert out["t1"][2] < 0.5
    # the bridge gets trust flow-through -> far below the spam farm
    assert out["b"][2] < out["s1"][2]

    # trusted seeds that are pure sinks vanish from the ranked set
    # (remove_sink_edges): _n_trusted = 0 must yield spam_mass 0.0
    # everywhere, never NULL (ADVICE r4 zero guard)
    sink_trusted = spark.createDataFrame([("z",)], "node string")
    outz = {
        r.node: r.spam_mass
        for r in spam_mass(
            spark.createDataFrame(
                [("a", "z"), ("a", "b"), ("b", "a")], "src string, dst string"
            ),
            sink_trusted,
            iterations=3,
        ).collect()
    }
    assert outz and all(v == 0.0 for v in outz.values()), outz


def test_spam_mass_shared_prep_matches_standalone_chains(spark):
    """spam_mass builds the sink-free adjacency / outdegree / node set ONCE
    and feeds both power chains (_power_iterate(..., prepared=True)); its
    pr/tr columns must be value-identical to running pagerank() and
    trustrank() standalone on the same inputs."""
    from pyspark.sql import functions as F

    from cis455crawler_spark.operators.pagerank import (
        pagerank,
        spam_mass,
        trustrank,
    )

    # ring with chords + a spam pocket + a sink (so remove_sink_edges acts)
    edges = [(f"n{i}", f"n{(i + 1) % 9}") for i in range(9)]
    edges += [("n0", "n4"), ("n2", "n7"), ("n5", "n1")]
    edges += [("p", "q"), ("q", "p"), ("n3", "sink")]
    e = spark.createDataFrame(edges, "src string, dst string")
    trusted = spark.createDataFrame([("n0",), ("n4",)], "node string")

    sm = spam_mass(e, trusted, iterations=4).select("node", "pr", "tr")
    ref = (
        pagerank(e, 4)
        .select("node", F.round("rank", 6).alias("pr"))
        .join(
            trustrank(e, trusted, 4).select(
                "node", F.round("rank", 6).alias("tr")
            ),
            "node",
        )
    )
    assert sm.exceptAll(ref).count() == 0 and ref.exceptAll(sm).count() == 0


def test_more_like_this_sparse(spark):
    from pyspark.sql import Row

    from cis455crawler_spark.operators.search import more_like_this_sparse

    rows = [
        Row(doc_id=1, text="quantum flux capacitor resonance chamber"),
        Row(doc_id=2, text="quantum flux capacitor resonance module"),
        Row(doc_id=3, text="gardening tips tomato watering schedule"),
        # 'common' appears in every doc -> df cap must drop it
        Row(doc_id=4, text="common common common"),
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=r.doc_id, text=r.text + " common") for r in rows]
    )
    out = {
        (r.id_a, r.id_b): r.cosine
        for r in more_like_this_sparse(
            docs, max_df=3, threshold=0.5
        ).collect()
    }
    # only the near-identical pair survives; doc 4 (all-capped) pairs with
    # nothing, and 'common' (df=4 > 3) contributes to no dot product.
    # The value is EXACTLY 0.5: 4 shared terms at weight ln2 against one
    # unique df=1 term each at ln4 = 2*ln2 -> 4ln2^2 / (sqrt(8)ln2)^2.
    assert out == {(1, 2): 0.5}


def test_ndcg_at_k_designed(spark):
    import math

    from cis455crawler_spark.operators.eval import ndcg_at_k

    rows = [
        # q1: perfect ordering (rel descends with rank) -> ndcg 1.0
        (1, 101, 1, 3), (1, 102, 2, 2), (1, 103, 3, 0),
        # q2: inverted ordering -> ndcg < 1
        (2, 201, 1, 0), (2, 202, 2, 3),
        # q3: all irrelevant -> idcg 0 -> ndcg defined as 0.0
        (3, 301, 1, 0), (3, 302, 2, 0),
    ]
    out = {
        r.query_id: (r.n_results, r.dcg, r.idcg, r.ndcg)
        for r in ndcg_at_k(
            spark.createDataFrame(
                rows, "query_id int, doc_id long, rank int, relevance int"
            ),
            k=10,
        ).collect()
    }
    assert out[1][3] == 1.0
    dcg2 = (2**0 - 1) / math.log2(2) + (2**3 - 1) / math.log2(3)
    idcg2 = (2**3 - 1) / math.log2(2) + (2**0 - 1) / math.log2(3)
    assert abs(out[2][3] - round(dcg2 / idcg2, 6)) < 1e-9
    assert out[3] == (2, 0.0, 0.0, 0.0)


def test_degree_assortativity_designed(spark):
    from cis455crawler_spark.operators.graph_signals import (
        degree_assortativity,
    )

    # star graph: hub h -> a,b,c (outdeg 3 -> indeg 1 each) plus a -> b
    edges = [("h", "a"), ("h", "b"), ("h", "c"), ("a", "b")]
    r = degree_assortativity(
        spark.createDataFrame(edges, "src string, dst string")
    ).collect()[0]
    xs = [3, 3, 3, 1]           # outdeg(src) per edge
    ys = [1, 2, 1, 2]           # indeg(dst) per edge
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    num = n * sxy - sx * sy
    den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    assert r.n_edges == 4
    assert abs(r.assortativity - round(num / den, 6)) < 1e-9
    # the hub points at the low-indegree pages -> disassortative (r < 0)
    assert r.assortativity < 0


def test_degree_assortativity_uniform_graph_zero(spark):
    from cis455crawler_spark.operators.graph_signals import (
        degree_assortativity,
    )

    # 2-cycle: every edge has outdeg 1 -> indeg 1; zero variance -> the
    # guarded denominator must return 0.0, not NaN
    r = degree_assortativity(
        spark.createDataFrame(
            [("a", "b"), ("b", "a")], "src string, dst string"
        )
    ).collect()[0]
    assert r.assortativity == 0.0
