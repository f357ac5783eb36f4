"""Opt-in indegree-priority frontier (CrawlConfig(priority="indegree")) —
the host-keyed priority queue of the north rule, OPIC-lite: each discovered
link deposits one unit of cash on its target, deferred candidates keep their
balance across rounds, and the politeness pop takes the richest candidates
first. Default stays "bfs" (url-ascending) for reference parity."""

from __future__ import annotations

import hashlib
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cis455crawler_spark.operators.scheduler import pop_host_batches
from cis455crawler_spark.plans.crawl import CrawlConfig, run_crawl, parsed_latest


def test_pop_priority_order(spark):
    rows = [
        ("h", "u1", 1, 2),
        ("h", "u2", 9, 2),
        ("h", "u3", 9, 2),
        ("h", "u4", 5, 2),
        ("g", "u5", 1, 1),
        ("g", "u6", 2, 1),
        ("x", "u7", 0, None),  # NULL budget: unlimited, priority irrelevant
    ]
    df = spark.createDataFrame(
        rows, "host string, url string, pri long, budget int"
    )
    sched, defer = pop_host_batches(df, priority_col="pri", salt_buckets=4)
    got = {r.url for r in sched.collect()}
    # h: top-2 by (pri desc, url asc) = u2, u3; g: top-1 = u6; x: unlimited
    assert got == {"u2", "u3", "u6", "u7"}
    assert {r.url for r in defer.collect()} == {"u1", "u4", "u5"}


def _pick(prefix: str, count: int, host: str = "h.test") -> list[str]:
    """Names whose derived fetch route is 200 + text/html (md5 constraints),
    zero-padded so lexicographic order follows slot order."""
    out, n = [], 0
    while len(out) < count:
        name = f"{prefix}{n:03d}.html"
        h = hashlib.md5(f"http://{host}/{name}".encode()).hexdigest()
        if h[0] not in "01" and h[1] not in "012":
            out.append(name)
        n += 1
    return out


@pytest.fixture(scope="module")
def link_pages(spark):
    """Designed graph on one host with Crawl-delay 30 (budget 2/round):
    seed -> b0..b4; b0,b1 -> pop + one unique leaf. Under BFS, pop waits
    behind the url-ordered queue; under indegree priority its 2 units of
    cash pop it the round after discovery."""
    host = "h.test"
    (seed,) = _pick("a", 1)
    bs = _pick("b", 5)
    leaves = _pick("y", 2)
    (pop,) = _pick("z", 1)

    def page(name, hrefs):
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return (
            f"http://{host}/{name}",
            datetime(2013, 3, 1),
            bytearray(f"<html><body>{body}</body></html>".encode()),
            "x",
            "en",
        )

    rows = [
        (
            f"http://{host}/robots.txt",
            datetime(2013, 3, 1),
            # the quirk predicate DENIES a robots record with no Disallow
            # entries (crawl_allowed:166), so carry one that matches nothing
            bytearray(b"User-agent: *\nDisallow: /private\nCrawl-delay: 30\n"),
            "",
            "en",
        ),
        page(seed, bs),
        page(bs[0], [pop, leaves[0]]),
        page(bs[1], [pop, leaves[1]]),
        page(bs[2], []),
        page(bs[3], []),
        page(bs[4], []),
        page(leaves[0], []),
        page(leaves[1], []),
        page(pop, []),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    return pages, f"http://{host}/{seed}", f"http://{host}/{pop}", bs


def _crawl_rounds(spark, pages, seed, state_dir, priority):
    cfg = CrawlConfig(max_rounds=10, priority=priority)
    store, metrics = run_crawl(spark, pages, [seed], state_dir, cfg)
    parsed = parsed_latest(store)
    rounds = {r.url: r.round for r in parsed.select("url", "round").collect()}
    seen = {r.url for r in store.read("seen").select("url").collect()}
    return rounds, seen


def test_indegree_priority_crawls_popular_page_earlier(
    spark, link_pages, tmp_path
):
    pages, seed, pop_url, bs = link_pages
    r_bfs, seen_bfs = _crawl_rounds(
        spark, pages, seed, str(tmp_path / "bfs"), "bfs"
    )
    r_pri, seen_pri = _crawl_rounds(
        spark, pages, seed, str(tmp_path / "pri"), "indegree"
    )
    # identical coverage at exhaustion — priority changes WHEN, never WHAT
    assert seen_bfs == seen_pri
    assert set(r_bfs) == set(r_pri)
    # pop is discovered in round 2 (by b0,b1) with 2 units of cash; priority
    # schedules it round 3, BFS keeps it behind the url-ordered b's/leaves
    assert r_pri[pop_url] == 3
    assert r_bfs[pop_url] > r_pri[pop_url]
    # the deferred b's kept their place under priority (cash ties break on
    # url order): every page still crawled exactly once
    assert sorted(r_pri.values())[:3] == [1, 2, 2]


def test_priority_mode_validation():
    with pytest.raises(ValueError):
        CrawlConfig(priority="opic")


def _routes_ok(url: str) -> bool:
    h = hashlib.md5(url.encode()).hexdigest()
    return h[0] not in "01" and h[1] not in "012"


def _find(host: str, prefix: str) -> str:
    for n in range(1000):
        u = f"http://{host}/{prefix}{n:03d}.html"
        if _routes_ok(u):
            return u
    raise AssertionError("no routable url")


def test_trust_priority_demotes_spam_endorsed_urls(spark, tmp_path):
    """priority='trust' (TrustRank demotion in the pop): two hosts link into
    a budget-1 target host — one trusted (reachable from the trusted seed
    set in the host_edges ledger), one a spam seed with zero trust inflow.
    The trust-endorsed target url wins the politeness slot even though the
    spam-endorsed one sorts first lexicographically (which is exactly what
    BFS picks). Needs resolve_mode='standard' — cross-host mentions cannot
    exist under the quirk resolver."""
    A, S, T = "ha-good.test", "hs-spam.test", "ht-target.test"
    a0, a1 = _find(A, "a"), _find(A, "b")
    s0, s1 = _find(S, "a"), _find(S, "b")
    t_spam = _find(T, "taa")  # sorts BEFORE t_good: BFS picks it first
    t_good = _find(T, "tzz")
    assert t_spam < t_good

    def page(url, hrefs, body="page body long enough to be ordinary content"):
        links = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return (
            url,
            datetime(2013, 3, 1),
            bytearray(f"<html><body>{body}{links}</body></html>".encode()),
            "",
            "en",
        )

    def robots(host, extra=""):
        return (
            f"http://{host}/robots.txt",
            datetime(2013, 3, 1),
            bytearray(f"User-agent: *\nDisallow: /private\n{extra}".encode()),
            "",
            "en",
        )

    rows = [
        robots(A),
        robots(S),
        robots(T, "Crawl-delay: 60\n"),  # budget 1/round on the target
        page(a0, [a1.rsplit("/", 1)[1]]),  # A -> A ledger edge in round 1
        page(a1, [t_good]),  # trusted mention, deposited round 2
        page(s0, [s1.rsplit("/", 1)[1]]),  # S -> S
        page(s1, [t_spam]),  # zero-trust mention
        page(t_good, []),
        page(t_spam, []),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )

    def crawl(priority, sub):
        cfg = CrawlConfig(
            max_rounds=8,
            priority=priority,
            resolve_mode="standard",
            trusted_hosts=[A],
        )
        store, _ = run_crawl(spark, pages, [a0, s0], str(tmp_path / sub), cfg)
        parsed = parsed_latest(store)
        return {r.url: r.round for r in parsed.select("url", "round").collect()}

    r_trust = crawl("trust", "trust")
    r_bfs = crawl("bfs", "bfs")
    # identical coverage — trust changes WHEN, never WHAT
    assert set(r_trust) == set(r_bfs)
    # BFS pops the lexicographically-smaller spam url into the single slot;
    # trust pops the endorsed url first and defers the spam one
    assert r_bfs[t_spam] == 3 and r_bfs[t_good] == 4
    assert r_trust[t_good] == 3 and r_trust[t_spam] == 4


def test_trust_deposits_survive_expansion_only_ledger(spark, tmp_path):
    """priority='trust' with a ledger whose edges ALL point to not-yet-
    crawled hosts (pure frontier expansion — every recorded dst is a sink).
    remove_sink_edges over such a ledger returns an EMPTY graph, so with
    drop_sinks=True trustrank would rank nobody, every deposit would
    coalesce to 0.0, and trust ordering would silently degenerate to BFS
    exactly when the knob matters — the crawl wiring must therefore pass
    drop_sinks=False (the r5 review finding). The trusted host's own
    teleport base (0.15) must survive an expansion-only ledger and win the
    budget-1 slot for its endorsed url."""
    A, S, T = "ka-trust.test", "ks-spam.test", "kt-target.test"
    X, Y = "kx-ext.test", "ky-ext.test"
    a0, a1 = _find(A, "aa"), _find(A, "ab")
    s0, s1 = _find(S, "aa"), _find(S, "ab")
    x0, y0 = _find(X, "x"), _find(Y, "y")
    t_spam = _find(T, "taa")  # sorts BEFORE t_good: BFS picks it first
    t_good = _find(T, "tzz")
    assert a0 < a1 and s0 < s1 and t_spam < t_good

    def page(url, hrefs):
        links = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return (
            url,
            datetime(2013, 3, 1),
            bytearray(
                f"<html><body>ordinary page body content{links}</body></html>".encode()
            ),
            "",
            "en",
        )

    def robots(host, extra=""):
        return (
            f"http://{host}/robots.txt",
            datetime(2013, 3, 1),
            bytearray(f"User-agent: *\nDisallow: /private\n{extra}".encode()),
            "",
            "en",
        )

    rows = [
        # budget 1/round on A and S: the second seed arrives in round 2,
        # AFTER the expansion-only ledger {A->X, S->Y} is committed
        robots(A, "Crawl-delay: 60\n"),
        robots(S, "Crawl-delay: 60\n"),
        robots(T, "Crawl-delay: 60\n"),  # budget 1 on the target
        robots(X),
        robots(Y),
        page(a0, [x0]),  # round 1: ledger edge A->X (X uncrawled = sink)
        page(s0, [y0]),  # round 1: ledger edge S->Y
        page(a1, [t_good]),  # round 2: trusted mention, needs rank(A) > 0
        page(s1, [t_spam]),  # round 2: zero-trust mention
        page(x0, []),
        page(y0, []),
        page(t_good, []),
        page(t_spam, []),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )

    def crawl(priority, sub):
        cfg = CrawlConfig(
            max_rounds=8,
            priority=priority,
            resolve_mode="standard",
            trusted_hosts=[A],
        )
        store, _ = run_crawl(spark, pages, [a0, a1, s0, s1], str(tmp_path / sub), cfg)
        parsed = parsed_latest(store)
        return store, {
            r.url: r.round for r in parsed.select("url", "round").collect()
        }

    store_t, r_trust = crawl("trust", "trust")
    _, r_bfs = crawl("bfs", "bfs")
    # the ledger stays a duplicate-free pair SET across rounds (appends are
    # anti-joined against the existing table — re-mentions of a stable host
    # graph must not grow it linearly with rounds)
    ledger = store_t.read("host_edges")
    assert ledger.count() == ledger.distinct().count()
    assert set(r_trust) == set(r_bfs)
    # at deposit time (round 2) the ledger is {A->X, S->Y} — all-sink edges;
    # A's teleport base must still endorse t_good into round 3's single slot
    assert r_bfs[t_spam] == 3 and r_bfs[t_good] == 4
    assert r_trust[t_good] == 3 and r_trust[t_spam] == 4
