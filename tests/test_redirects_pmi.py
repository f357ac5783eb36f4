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


def test_index_shard_plan_balance(spark):
    from cis455crawler_spark.operators.index_layout import index_shard_plan

    stats = spark.createDataFrame(
        [("alpha", 10, 12), ("beta", 5, 7), ("gamma", 2, 3), ("delta", 1, 2)],
        "word string, df long, bytes_varint long",
    )
    rows = index_shard_plan(stats, n_shards=4).collect()
    total_bytes = sum(r.total_bytes for r in rows)
    total_terms = sum(r.n_terms for r in rows)
    assert total_bytes == 12 + 7 + 3 + 2
    assert total_terms == 4
    mean = total_bytes / len(rows)
    for r in rows:
        assert abs(r.balance - round(r.total_bytes / mean, 6)) < 1e-9
        assert 0 <= r.shard < 4


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
