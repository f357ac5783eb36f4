"""Systematic weighted sampling, script-mix profile, Hamilton budgets."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from cis455crawler_spark.functions.text import dominant_script, script_counts
from cis455crawler_spark.operators.sampling import systematic_weighted_sample
from cis455crawler_spark.operators.scheduler import allocate_budget_hamilton


def _sys_py(weights, k):
    d = sum(w for _, w in weights)
    out, cum = {}, 0
    for i, w in sorted(weights):
        lo, cum = cum, cum + w
        n = (cum * k) // d - (lo * k) // d
        if n:
            out[i] = (w, cum, n)
    return out


def test_systematic_sample_matches_python(spark):
    weights = [(i, (i % 5) + 1) for i in range(1, 301)] + [(1000, 500)]
    df = spark.createDataFrame(weights, "doc_id long, weight long")
    want = _sys_py(weights, k=50)
    got = {
        r.id: (r.weight, r.cum, r.n_copies)
        for r in systematic_weighted_sample(
            df, k=50, id_col="doc_id", weight_col="weight"
        ).collect()
    }
    assert got == want
    # pointers are conserved: multiplicities sum to exactly k
    assert sum(n for _, _, n in got.values()) == 50
    # the heavy item (500 of ~1400 total weight) repeats
    assert got[1000][2] >= 15


def test_systematic_sample_zero_weight_dropped(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 10), (3, 10)], "doc_id long, weight long"
    )
    got = systematic_weighted_sample(df, k=4).collect()
    assert sum(r.n_copies for r in got) == 4
    assert all(r.id != 1 for r in got)


def test_script_counts_and_dominant(spark):
    rows = [
        Row(i=0, s="hello world"),
        Row(i=1, s="привет мир hello"),  # cyrillic 9 > latin 5
        Row(i=2, s="漢字"),
        Row(i=3, s="δοκιμή"),
        Row(i=4, s="1234 !!"),  # no script chars -> none
        Row(i=5, s="ab яя"),  # tie 2-2 -> largest name wins ('latin')
    ]
    df = spark.createDataFrame(rows)
    c = script_counts(F.col("s"))
    out = {
        r.i: (r.lat, r.cyr, r.cjk, r.grk, r.dom)
        for r in df.select(
            "i",
            c["latin"].alias("lat"),
            c["cyrillic"].alias("cyr"),
            c["cjk"].alias("cjk"),
            c["greek"].alias("grk"),
            dominant_script(F.col("s")).alias("dom"),
        ).collect()
    }
    assert out[0] == (10, 0, 0, 0, "latin")
    assert out[1][1] == 9 and out[1][4] == "cyrillic"
    assert out[2] == (0, 0, 2, 0, "cjk")
    assert out[3] == (0, 0, 0, 6, "greek")
    assert out[4][4] == "none"
    assert out[5][4] == "latin"  # 'latin' > 'cyrillic' lexicographically


def test_hamilton_allocation_exact_total_and_quota(spark):
    demands = [("a", 7), ("b", 13), ("c", 29), ("d", 1), ("e", 50)]
    df = spark.createDataFrame(demands, "host string, demand long")
    for buckets in (1, 4, 64):
        rows = allocate_budget_hamilton(
            df, total_budget=97, rank_buckets=buckets
        ).collect()
        alloc = {r.host: r.allocation for r in rows}
        assert sum(alloc.values()) == 97, buckets
        total_d = sum(d for _, d in demands)
        for h, d in demands:
            quota = 97 * d / total_d
            assert quota - 1 < alloc[h] < quota + 1, (buckets, h)


def test_snapshot_diff_classification(spark):
    from pyspark.sql import Row

    g1 = spark.createDataFrame(
        [
            Row(url="http://a/1", fp1="x"),
            Row(url="http://a/2", fp1="y"),
            Row(url="http://b/3", fp1="z"),
        ]
    )
    g2 = spark.createDataFrame(
        [
            Row(url="http://a/1", fp2="x"),   # unchanged
            Row(url="http://a/2", fp2="Y2"),  # changed
            Row(url="http://c/4", fp2="n"),   # added
        ]                                      # b/3 removed
    )
    from cis455crawler_spark.sources.tables import snapshot_diff

    out = {r.url: r.status for r in snapshot_diff(g1, g2).collect()}
    assert out == {
        "http://a/1": "unchanged",
        "http://a/2": "changed",
        "http://b/3": "removed",
        "http://c/4": "added",
    }

    # NULL fingerprints are legal values, not absence markers (ADVICE r4):
    # presence comes from per-side flags, comparison is null-safe
    g1n = spark.createDataFrame(
        [Row(url="u1", fp1=None), Row(url="u2", fp1=None), Row(url="u3", fp1="v")],
        "url string, fp1 string",
    )
    g2n = spark.createDataFrame(
        [Row(url="u1", fp2=None), Row(url="u2", fp2="w"), Row(url="u4", fp2=None)],
        "url string, fp2 string",
    )
    outn = {r.url: r.status for r in snapshot_diff(g1n, g2n).collect()}
    assert outn == {
        "u1": "unchanged",  # NULL vs NULL
        "u2": "changed",    # NULL vs value
        "u3": "removed",    # present in g1 only, despite... fp present
        "u4": "added",      # present in g2 only with NULL fp
    }


def test_event_burstiness_designed(spark):
    import datetime

    from pyspark.sql import Row

    from cis455crawler_spark.operators.temporal import event_burstiness

    def t(d, h):
        return datetime.datetime(2024, 1, d, h)

    rows = (
        # 'steady': 2 events/day for 3 days -> burstiness 1.0
        [Row(event_type="steady", ts=t(d, h)) for d in (1, 2, 3) for h in (1, 2)]
        # 'bursty': 1,1,4 across three days -> max 4 / avg 2 = 2.0
        + [Row(event_type="bursty", ts=t(1, 1)), Row(event_type="bursty", ts=t(2, 1))]
        + [Row(event_type="bursty", ts=t(3, h)) for h in (1, 2, 3, 4)]
        # 'tied': 1 event on two days -> tie, peak = LATEST day
        + [Row(event_type="tied", ts=t(5, 1)), Row(event_type="tied", ts=t(9, 1))]
    )
    out = {
        r.event_type: (r.n_days, r.total, r.max_daily, r.burstiness, r.peak_day)
        for r in event_burstiness(spark.createDataFrame(rows)).collect()
    }
    assert out["steady"] == (3, 6, 2, 1.0, "2024-01-03")
    assert out["bursty"] == (3, 6, 4, 2.0, "2024-01-03")
    assert out["tied"] == (2, 2, 1, 1.0, "2024-01-09")


def test_path_depth_and_anchor_consensus(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F2

    from cis455crawler_spark.functions.urls import path_depth
    from cis455crawler_spark.operators.anchors import anchor_consensus

    urls = [
        ("http://h.test", 0),
        ("http://h.test/", 0),  # trailing slash is not a segment
        ("http://h.test/a/b/c", 3),
        ("http://h.test/dir5/", 1),
        ("http://h.test/p?x=/y", 1),  # query stripped (canonical segment metric)
    ]
    got = {
        r.u: r.d
        for r in spark.createDataFrame(urls, "u string, want int")
        .select("u", path_depth("u").alias("d"))
        .collect()
    }
    assert got == {u: w for u, w in urls}

    pairs = (
        [("t1", "home")] * 3
        + [("t1", "main")] * 2
        + [("t2", "x"), ("t2", "y")]  # tie 1-1 -> larger anchor wins
        + [("spammy", f"a{i}") for i in range(5)]
    )
    out = {
        r.dst: (r.n_anchor_texts, r.top_anchor, r.top_count, r.share)
        for r in anchor_consensus(
            spark.createDataFrame(pairs, "dst string, anchor string"),
            max_anchors_per_dst=4,
        ).collect()
    }
    assert out["t1"] == (2, "home", 3, 0.6)
    assert out["t2"] == (2, "y", 1, 0.5)
    assert "spammy" not in out  # 5 distinct anchors > cap 4 -> dropped
