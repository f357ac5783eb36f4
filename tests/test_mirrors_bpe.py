"""Mirror-host detection, containment dedup, BPE pair statistics."""

from pyspark.sql import Row

from cis455crawler_spark.operators.bpe import (
    bpe_pair_counts,
    word_frequency_table,
)
from cis455crawler_spark.operators.mirrors import (
    containment_pairs,
    host_fingerprints,
    mirror_host_pairs,
)


def test_mirror_host_pairs_designed(spark):
    rows = [
        # m1/m2 mirror each other on 3 shared pages; m2 has 1 extra
        Row(host="m1", text="page-a"),
        Row(host="m1", text="page-b"),
        Row(host="m1", text="page-c"),
        Row(host="m2", text="page-a"),
        Row(host="m2", text="page-b"),
        Row(host="m2", text="page-c"),
        Row(host="m2", text="m2-only"),
        # u shares one page with m1 -> below min_shared
        Row(host="u", text="page-a"),
        Row(host="u", text="u-only"),
        # duplicate page within a host collapses to one print
        Row(host="m1", text="page-a"),
    ]
    prints = host_fingerprints(spark.createDataFrame(rows))
    out = {
        (r.host_a, r.host_b): (r.shared, r.n_a, r.n_b, r.overlap_a, r.overlap_b)
        for r in mirror_host_pairs(prints, min_shared=2).collect()
    }
    assert out == {("m1", "m2"): (3, 3, 4, 1.0, 0.75)}


def test_mirror_hot_print_capped(spark):
    # one print on 4 hosts with cap 3 -> dropped entirely, no pairs
    rows = [Row(host=f"h{i}", text="boilerplate") for i in range(4)]
    rows += [Row(host="h0", text="x"), Row(host="h1", text="x")]
    prints = host_fingerprints(spark.createDataFrame(rows))
    out = mirror_host_pairs(
        prints, max_hosts_per_print=3, min_shared=1
    ).collect()
    # only the 2-host print 'x' survives the cap
    assert [(r.host_a, r.host_b, r.shared) for r in out] == [("h0", "h1", 1)]


def test_containment_subset_detected(spark):
    long = "one two three four five six seven eight nine ten"
    rows = [
        Row(doc_id=1, text=long),
        Row(doc_id=2, text="one two three four five"),  # prefix subset
        Row(doc_id=3, text="totally different words here my friend ok"),
        # zero-token docs must NOT pair with each other (the "" fallback
        # shingle is filtered out)
        Row(doc_id=4, text=""),
        Row(doc_id=5, text="   "),
    ]
    out = {
        (r.contained, r.container): r.containment
        for r in containment_pairs(
            spark.createDataFrame(rows), threshold=0.9
        ).collect()
    }
    # doc2's 3 shingles all inside doc1 -> containment 1.0, one direction
    assert out == {(2, 1): 1.0}


def test_bpe_pair_counts(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="aba ab"), Row(doc_id=2, text="aba X")]
    )
    wf = {r.word: r.n_words for r in word_frequency_table(docs).collect()}
    assert wf == {"aba": 2, "ab": 1, "x": 1}
    out = {
        r.pair: (r.n_vocab, r.total_count)
        for r in bpe_pair_counts(word_frequency_table(docs)).collect()
    }
    # 'ab' appears in 'aba' (freq 2) and 'ab' (freq 1); 'ba' in 'aba' only;
    # single-char word 'x' emits no pairs
    assert out == {"ab": (2, 3), "ba": (1, 2)}
