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
