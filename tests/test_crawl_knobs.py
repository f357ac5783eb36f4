"""Opt-in crawl knobs beyond the reference: follow_redirects (the TODO the
reference never implemented, XPathCrawlerThread.java:169 — Location becomes a
discovered link instead of mark-seen-never-enqueue) and max_depth (BFS depth
cap; links past the cap are dropped at discovery). Both verified against the
knob-aware Python oracle, and both default-off so the parity gate's BFS is
untouched (tests/test_crawl_rounds.py pins that)."""

from __future__ import annotations

from datetime import datetime

import pytest

from cis455crawler_spark.plans.crawl import CrawlConfig, parsed_latest, run_crawl

from .oracle import o_sha1, oracle_crawl

HOST = "h0.test"  # chosen so p0.html routes 200+text/html and r003 redirects


def _page(name: str, hrefs: list[str]) -> tuple:
    body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
    return (
        f"http://{HOST}/{name}",
        datetime(2013, 3, 1),
        bytearray(f"<html><body>{body}</body></html>".encode()),
        "",
        "en",
    )


@pytest.fixture(scope="module")
def knob_corpus(spark):
    """seed a000 -> [r003 (301 -> /p0.html), a001]; a001 -> a002 -> a004 ->
    a005 (a linear chain for the depth cap); p0.html -> a007 (content behind
    the redirect, reachable only by following it)."""
    rows = [
        _page("robots.txt", []),  # absent robots handled upstream; keep real:
    ]
    # a robots record that allows everything (quirk needs >=1 disallow entry)
    rows[0] = (
        f"http://{HOST}/robots.txt",
        datetime(2013, 3, 1),
        bytearray(b"User-agent: *\nDisallow: /private\n"),
        "",
        "en",
    )
    rows += [
        _page("a000.html", ["r003.html", "a001.html"]),
        _page("r003.html", ["a012.html"]),  # body never parsed: it redirects
        _page("p0.html", ["a007.html"]),
        _page("a007.html", []),
        _page("a001.html", ["a002.html"]),
        _page("a002.html", ["a004.html"]),
        _page("a004.html", ["a005.html"]),
        _page("a005.html", []),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    page_map = {u: bytes(h) for u, _, h, _, _ in rows}
    return pages, page_map, f"http://{HOST}/a000.html"


def _seen(store):
    return {r.url_hash for r in store.read("seen").select("url_hash").collect()}


def test_follow_redirects_matches_oracle(spark, knob_corpus, tmp_path):
    pages, page_map, seed = knob_corpus
    cfg = CrawlConfig(max_rounds=10, follow_redirects=True)
    store, metrics = run_crawl(spark, pages, [seed], str(tmp_path / "f"), cfg)
    want = oracle_crawl(page_map, [seed], max_rounds=10, follow_redirects=True)
    assert _seen(store) == want.seen
    parsed_urls = {r.url for r in parsed_latest(store).select("url").collect()}
    assert parsed_urls == set(want.docs)
    # the redirect target AND the page behind it were actually crawled
    assert f"http://{HOST}/p0.html" in parsed_urls
    assert f"http://{HOST}/a007.html" in parsed_urls
    assert len(metrics) == len(want.metrics)  # zip must not truncate a tail
    for got, exp in zip(metrics, want.metrics):
        assert got["scheduled"] == exp["scheduled"], got["round"]
        assert got["redirects"] == exp["redirects"], got["round"]

    # reference mode on the same corpus: target marked seen, never fetched
    store2, _ = run_crawl(
        spark, pages, [seed], str(tmp_path / "nf"), CrawlConfig(max_rounds=10)
    )
    want2 = oracle_crawl(page_map, [seed], max_rounds=10)
    assert _seen(store2) == want2.seen
    parsed2 = {r.url for r in parsed_latest(store2).select("url").collect()}
    assert f"http://{HOST}/p0.html" not in parsed2
    assert o_sha1(f"http://{HOST}/p0.html") in want2.seen  # seen, unfetched
    assert f"http://{HOST}/a007.html" not in parsed2  # unreachable without follow


def test_max_depth_matches_oracle(spark, knob_corpus, tmp_path):
    pages, page_map, seed = knob_corpus
    cfg = CrawlConfig(max_rounds=10, max_depth=2)
    store, _ = run_crawl(spark, pages, [seed], str(tmp_path / "d"), cfg)
    want = oracle_crawl(page_map, [seed], max_rounds=10, max_depth=2)
    assert _seen(store) == want.seen
    # chain a000(0) -> a001(1) -> a002(2) -> a004(3): a004 is past the cap
    assert o_sha1(f"http://{HOST}/a002.html") in want.seen
    assert o_sha1(f"http://{HOST}/a004.html") not in want.seen
    # without the cap the chain completes
    plain = oracle_crawl(page_map, [seed], max_rounds=10)
    assert o_sha1(f"http://{HOST}/a004.html") in plain.seen


def test_follow_redirects_composes_with_depth_and_priority(
    spark, knob_corpus, tmp_path
):
    """Knobs compose: follow + depth cap + indegree priority still match the
    oracle's seen set (priority changes WHEN within a round's budget, never
    WHAT, so coverage at exhaustion is mode-independent)."""
    pages, page_map, seed = knob_corpus
    cfg = CrawlConfig(
        max_rounds=10, follow_redirects=True, max_depth=3, priority="indegree"
    )
    store, _ = run_crawl(spark, pages, [seed], str(tmp_path / "c"), cfg)
    want = oracle_crawl(
        page_map, [seed], max_rounds=10, follow_redirects=True, max_depth=3
    )
    assert _seen(store) == want.seen
