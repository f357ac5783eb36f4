"""Round-5 continuation review fixes, each pinned:

  * resolve_href_standard lowercases the HOST of absolute/protocol-relative
    references (RFC 3986 §6.2.2.1) — case-variant hosts must land on ONE
    seen-set key (userinfo and path keep case)
  * exact_dedup no longer clobbers a caller's existing 'fp' column
    (collision-free internal names via operators/bucketed.internal_tag)
  * the trap_filter / demote_soft404 gates read incrementally-maintained
    rollups (trap_counts / soft404_counts + the trap pair sets), never a
    per-round aggregate over the whole accumulated log — the rollups must
    stay value-identical to the full-log aggregates they replaced
  * trustrank(eager_release=True) (the crawl loop's per-round invocation)
    unpersists every cache the power iteration created
"""

from __future__ import annotations

import hashlib
from datetime import datetime

from pyspark.sql import functions as F

from cis455crawler_spark.plans.crawl import CrawlConfig, run_crawl

from .oracle import o_resolve_standard

TS = datetime(2013, 3, 1)


# -- RFC 3986 host-case normalization ----------------------------------------


def test_standard_resolver_lowercases_host(spark):
    from cis455crawler_spark.functions.urls import resolve_href_standard

    cases = [
        # (page, href, expected)
        ("http://h.test/p/", "http://Example.COM/A/./b", "http://example.com/A/b"),
        ("http://h.test/p/", "HTTP://EXAMPLE.com:8080/x", "http://example.com:8080/x"),
        # userinfo keeps case; only the host after the last '@' lowers
        ("http://h.test/", "http://User@Example.com/x", "http://User@example.com/x"),
        # protocol-relative inherits the page scheme, host still lowers
        ("https://h.test/", "//CDN.Example.COM/lib.js", "https://cdn.example.com/lib.js"),
        # path/query case is untouched
        ("http://h.test/", "http://A.B/Path?Q=V", "http://a.b/Path?Q=V"),
        # the PAGE host normalizes too: relative/root-relative/query-only
        # links from an uppercase-host page must land on the same seen-set
        # key as lowercase absolute inlinks (second-pass review finding)
        ("http://Seed.EXAMPLE/dir/p.html", "a.html", "http://seed.example/dir/a.html"),
        ("http://Seed.EXAMPLE/dir/", "/root.html", "http://seed.example/root.html"),
        ("http://Seed.EXAMPLE/dir/p", "?q=1", "http://seed.example/dir/p?q=1"),
    ]
    df = spark.createDataFrame(cases, "url string, href string, want string")
    got = df.select(
        "url",
        "href",
        "want",
        resolve_href_standard("url", "href").alias("got"),
    ).collect()
    for r in got:
        assert r.got == r.want, (r.url, r.href, r.got, r.want)
        # the python oracle mirror must agree (hypothesis differential
        # coverage rides on this staying in lock-step)
        assert o_resolve_standard(r.url, r.href) == r.want


# -- exact_dedup fp-column preservation --------------------------------------


def test_exact_dedup_preserves_caller_fp_column(spark):
    from cis455crawler_spark.operators.dedup_fuzzy import exact_dedup

    rows = [
        (1, "same text", "mine-1"),
        (2, "same text", "mine-2"),  # dup of 1 -> dropped (min id wins)
        (3, "other text", "mine-3"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, fp string")
    out = exact_dedup(df).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 3]
    # the caller's fp column came back verbatim, not fingerprint64 hashes
    assert [r.fp for r in out] == ["mine-1", "mine-3"]
    assert out[0].__fields__ == ["doc_id", "text", "fp"]


# -- trap / soft404 rollups == full-log aggregates ---------------------------


def _routes_ok(url: str) -> bool:
    h = hashlib.md5(url.encode()).hexdigest()
    return h[0] not in "01" and h[1] not in "012"


def _pick_name(host: str, prefix: str) -> str:
    for n in range(1000):
        name = f"{prefix}{n:03d}.html"
        if _routes_ok(f"http://{host}/{name}"):
            return name
    raise AssertionError("no routable name")


def test_trap_soft404_rollups_match_log_aggregates(spark, tmp_path):
    """Multi-round crawl with BOTH evidence knobs on: after the final
    commit, the incrementally-merged rollups must equal the aggregates over
    the full evidence logs they replaced (the exactness contract of the
    r5 incremental-gate rewrite)."""
    from cis455crawler_spark.operators.traps import path_depth

    trap_h, bad_h = "rtrap.test", "rbad.test"
    us = [f"http://{trap_h}/" + _pick_name(trap_h, f"u{i}") for i in range(6)]
    seed_t = f"http://{trap_h}/" + _pick_name(trap_h, "a")
    seed_b = f"http://{bad_h}/" + _pick_name(bad_h, "a")
    bs = [f"http://{bad_h}/" + _pick_name(bad_h, f"b{i}") for i in range(5)]

    def page(url, hrefs, title="A Page", body="ordinary content of a page"):
        links = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        html = f"<html><head><title>{title}</title></head><body>{body}{links}</body></html>"
        return (url, TS, bytearray(html.encode()), "", "en")

    def robots(host, extra=""):
        return (
            f"http://{host}/robots.txt",
            TS,
            bytearray(f"User-agent: *\nDisallow: /private\n{extra}".encode()),
            "",
            "en",
        )

    rows = [robots(trap_h, "Crawl-delay: 30\n"), robots(bad_h)]
    rows.append(page(seed_t, [u.rsplit("/", 1)[1] for u in us]))
    shell = page(us[0], [], body="the one true shell")
    for u in us:
        rows.append((u, TS, shell[2], "", "en"))  # byte-identical bodies
    rows.append(page(seed_b, [b.rsplit("/", 1)[1] for b in bs], title="Welcome"))
    for i, b in enumerate(bs):
        rows.append(page(b, [], title="404 Not Found", body=f"shell {i}"))
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    cfg = CrawlConfig(
        max_rounds=10,
        trap_filter=True,
        trap_ratio_threshold=3.0,
        demote_soft404=True,
        soft404_min_pages=3,
        soft404_rate_threshold=0.5,
    )
    store, metrics = run_crawl(
        spark, pages, [seed_t, seed_b], str(tmp_path / "r"), cfg
    )
    assert len(metrics) > 2  # multiple merge rounds actually happened

    from cis455crawler_spark.functions.urls import host_of

    tlog = store.read("trap_log")
    want_counts = {
        r.host: (r.n_urls, r.n_content, r.max_depth)
        for r in tlog.groupBy(host_of(F.col("url")).alias("host"))
        .agg(
            F.countDistinct("url").alias("n_urls"),
            F.countDistinct("digest").alias("n_content"),
            F.max(path_depth(F.col("url"))).cast("long").alias("max_depth"),
        )
        .collect()
    }
    got_counts = {
        r.host: (r.n_urls, r.n_content, r.max_depth)
        for r in store.read("trap_counts").collect()
    }
    assert got_counts == want_counts

    want_u = {
        (r.host, r.url)
        for r in tlog.select(host_of(F.col("url")).alias("host"), "url")
        .distinct()
        .collect()
    }
    got_u = {(r.host, r.url) for r in store.read("trap_url_pairs").collect()}
    assert got_u == want_u
    want_d = {
        (r.host, r.digest)
        for r in tlog.filter(F.col("digest").isNotNull())
        .select(host_of(F.col("url")).alias("host"), "digest")
        .distinct()
        .collect()
    }
    got_d = {(r.host, r.digest) for r in store.read("trap_digest_pairs").collect()}
    assert got_d == want_d

    slog = store.read("soft404_log")
    want_s = {
        r.host: (r.n, r.s)
        for r in slog.groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("soft404").cast("long").alias("s"))
        .collect()
    }
    got_s = {r.host: (r.n, r.s) for r in store.read("soft404_counts").collect()}
    assert got_s == want_s


# -- trustrank eager_release cache discipline --------------------------------


def test_trustrank_eager_release_frees_caches(spark):
    from cis455crawler_spark.operators.pagerank import trustrank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], "src string, dst string"
    )
    trusted = spark.createDataFrame([("a",)], "node string")

    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    plain = {
        r.node: r.rank
        for r in trustrank(edges, trusted, iterations=2).collect()
    }
    # the default path pins its caches (standalone callers may reuse them
    # within one query); clear them so the release path starts clean
    spark.catalog.clearCache()

    released = {
        r.node: r.rank
        for r in trustrank(
            edges, trusted, iterations=2, eager_release=True
        ).collect()
    }
    assert released == plain  # release changes lifecycle, never values
    after = jsc.getPersistentRDDs().size()
    # at most the final localCheckpoint RDD remains — the three power-
    # iteration caches (edges/outdeg/nodes) must all be gone
    assert after - base <= 1, (base, after)


def test_rollup_migration_rebuild_from_log(spark, tmp_path):
    """Upgrade path (second-pass review finding): a store whose evidence
    logs predate the rollup tables must rebuild them exactly. Simulated by
    crawling a few rounds with both knobs on, DROPPING the rollup/pair
    tables, and resuming — the gate's rebuild path and the commit-side
    migration then run for real, and the final rollups must again equal the
    full-log aggregates."""
    from cis455crawler_spark.functions.urls import host_of
    from cis455crawler_spark.operators.traps import trap_counts_of

    trap_h = "mtrap.test"
    us = [f"http://{trap_h}/" + _pick_name(trap_h, f"u{i}") for i in range(6)]
    seed_t = f"http://{trap_h}/" + _pick_name(trap_h, "a")

    def page(url, hrefs, title="A Page", body="ordinary content of a page"):
        links = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        html = f"<html><head><title>{title}</title></head><body>{body}{links}</body></html>"
        return (url, TS, bytearray(html.encode()), "", "en")

    rows = [
        (
            f"http://{trap_h}/robots.txt",
            TS,
            bytearray(b"User-agent: *\nDisallow: /private\nCrawl-delay: 30\n"),
            "",
            "en",
        )
    ]
    rows.append(page(seed_t, [u.rsplit("/", 1)[1] for u in us], title="404 Not Found"))
    shell = page(us[0], [], title="404 Not Found", body="the one true shell")
    for u in us:
        rows.append((u, TS, shell[2], "", "en"))
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    cfg1 = CrawlConfig(
        max_rounds=2,
        trap_filter=True,
        trap_ratio_threshold=3.0,
        demote_soft404=True,
        soft404_min_pages=2,
        soft404_rate_threshold=0.5,
    )
    store, m1 = run_crawl(spark, pages, [seed_t], str(tmp_path / "m"), cfg1)
    assert m1[-1]["frontier_next"] > 0  # not drained — resume has work left
    for t in ("trap_counts", "trap_url_pairs", "trap_digest_pairs", "soft404_counts"):
        assert store.read(t) is not None
        store.drop_table(t)
        assert store.read(t) is None

    cfg2 = CrawlConfig(
        max_rounds=6,
        trap_filter=True,
        trap_ratio_threshold=3.0,
        demote_soft404=True,
        soft404_min_pages=2,
        soft404_rate_threshold=0.5,
    )
    store, m2 = run_crawl(
        spark, pages, [seed_t], str(tmp_path / "m"), cfg2, resume=True
    )
    assert len(m2) > len(m1)  # migration rounds actually committed

    tlog = store.read("trap_log")
    want = {
        r.host: (r.n_urls, r.n_content, r.max_depth)
        for r in trap_counts_of(tlog).collect()
    }
    got = {
        r.host: (r.n_urls, r.n_content, r.max_depth)
        for r in store.read("trap_counts").collect()
    }
    assert got == want
    want_u = {
        (r.host, r.url)
        for r in tlog.select(host_of(F.col("url")).alias("host"), "url")
        .distinct()
        .collect()
    }
    assert {
        (r.host, r.url) for r in store.read("trap_url_pairs").collect()
    } == want_u
    slog = store.read("soft404_log")
    want_s = {
        r.host: (r.n, r.s)
        for r in slog.groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("soft404").cast("long").alias("s"))
        .collect()
    }
    assert {
        r.host: (r.n, r.s) for r in store.read("soft404_counts").collect()
    } == want_s


def test_legacy_pair_dirs_upgrade(spark, tmp_path):
    """Third-pass review finding (reproduced live by the reviewer): a store
    whose pair dirs predate the bucket column must not be wedged by a
    mixed-schema append — the store reads a table's dirs with strict
    unionByName, so a (host,url) dir + a (host,url,bucket) dir would crash
    every later read. The commit must REPLACE legacy pair tables with the
    backfilled history instead. Simulated by stripping the bucket column
    after two rounds, then resuming."""
    from cis455crawler_spark.functions.urls import host_of
    from cis455crawler_spark.operators.traps import trap_counts_of

    trap_h = "ltrap.test"
    us = [f"http://{trap_h}/" + _pick_name(trap_h, f"u{i}") for i in range(6)]
    seed_t = f"http://{trap_h}/" + _pick_name(trap_h, "a")

    def page(url, hrefs, body="ordinary content of a page"):
        links = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        html = f"<html><body>{body}{links}</body></html>"
        return (url, TS, bytearray(html.encode()), "", "en")

    rows = [
        (
            f"http://{trap_h}/robots.txt",
            TS,
            bytearray(b"User-agent: *\nDisallow: /private\nCrawl-delay: 30\n"),
            "",
            "en",
        ),
        page(seed_t, [u.rsplit("/", 1)[1] for u in us]),
    ]
    shell = page(us[0], [], body="the one true shell")
    for u in us:
        rows.append((u, TS, shell[2], "", "en"))
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    cfg = CrawlConfig(max_rounds=2, trap_filter=True, trap_ratio_threshold=3.0)
    store, m1 = run_crawl(spark, pages, [seed_t], str(tmp_path / "l"), cfg)
    assert m1[-1]["frontier_next"] > 0
    # strip the bucket column — the pre-layout on-disk schema
    store.replace_with(
        "trap_url_pairs", store.read("trap_url_pairs").select("host", "url")
    )
    store.replace_with(
        "trap_digest_pairs",
        store.read("trap_digest_pairs").select("host", "digest"),
    )

    cfg2 = CrawlConfig(max_rounds=6, trap_filter=True, trap_ratio_threshold=3.0)
    store, m2 = run_crawl(
        spark, pages, [seed_t], str(tmp_path / "l"), cfg2, resume=True
    )
    assert len(m2) > len(m1)
    # reads work (no mixed-schema union), the upgraded table carries the
    # bucket column, and the rollup contract still holds
    pairs = store.read("trap_url_pairs")
    assert "bucket" in pairs.columns
    tlog = store.read("trap_log")
    want = {
        r.host: (r.n_urls, r.n_content, r.max_depth)
        for r in trap_counts_of(tlog).collect()
    }
    got = {
        r.host: (r.n_urls, r.n_content, r.max_depth)
        for r in store.read("trap_counts").collect()
    }
    assert got == want
    want_u = {
        (r.host, r.url)
        for r in tlog.select(host_of(F.col("url")).alias("host"), "url")
        .distinct()
        .collect()
    }
    assert {(r.host, r.url) for r in pairs.collect()} == want_u


def test_host_edges_legacy_dedup_self_heal(spark, tmp_path):
    """A trust ledger written before deduped appends (one copy of the host
    graph per round) is rewritten to its distinct ONCE at the next
    run_crawl invocation — the per-round trustrank distinct must not
    rescan accumulated duplicates forever."""
    A, X = "sheal-a.test", "sheal-x.test"
    a0 = f"http://{A}/" + _pick_name(A, "a")
    x0 = f"http://{X}/" + _pick_name(X, "x")

    def page(url, hrefs):
        links = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return (
            url,
            TS,
            bytearray(f"<html><body>body{links}</body></html>".encode()),
            "",
            "en",
        )

    rows = [
        (
            f"http://{A}/robots.txt",
            TS,
            bytearray(b"User-agent: *\nDisallow: /private\n"),
            "",
            "en",
        ),
        (
            f"http://{X}/robots.txt",
            TS,
            bytearray(b"User-agent: *\nDisallow: /private\n"),
            "",
            "en",
        ),
        page(a0, [x0]),
        page(x0, []),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    cfg = CrawlConfig(
        max_rounds=2,
        priority="trust",
        resolve_mode="standard",
        trusted_hosts=[A],
    )
    store, _ = run_crawl(spark, pages, [a0], str(tmp_path / "h"), cfg)
    led = store.read("host_edges")
    assert led is not None
    n_unique = led.count()
    assert n_unique == led.distinct().count()
    # simulate a pre-dedup ledger: three copies of every pair (replace_with
    # deletes the old dirs, so count BEFORE the swap — the lazy `led` plan
    # reads them) AND strip the host_edges_dedup history markers a real
    # pre-upgrade store would not have (the probe is marker-gated: once any
    # round carries the marker, the steady state pays no probe job)
    store.replace_with("host_edges", led.unionByName(led).unionByName(led))
    import json as _json

    with open(store._manifest_path) as f:
        manifest = _json.load(f)
    for h in manifest.get("history", []):
        h.pop("host_edges_dedup", None)
    with open(store._manifest_path, "w") as f:
        _json.dump(manifest, f)
    dup = store.read("host_edges")
    assert dup.count() == 3 * n_unique

    cfg2 = CrawlConfig(
        max_rounds=4,
        priority="trust",
        resolve_mode="standard",
        trusted_hosts=[A],
    )
    store, _ = run_crawl(spark, pages, [a0], str(tmp_path / "h"), cfg2, resume=True)
    healed = store.read("host_edges")
    assert healed.count() == healed.distinct().count()
