"""Opt-in content-seen test (CrawlConfig(content_dedup=True)) — Mercator's
duplicate-body suppression, which the reference lacks (it dedups URLs only):
a fetched body whose md5 digest was already claimed (earlier round, or a
lexicographically smaller URL this round) flips to action 'content_dup' —
still URL-seen, never parsed/linked/persisted.

The designed corpus exploits the quirk resolver: duplicate pages live at
non-.html URLs, so their IDENTICAL bodies (relative href "sub.html") resolve
to page-relative targets — suppressing a dup therefore visibly removes its
sub-URL from the frontier, which is what the assertions pin.
"""

from __future__ import annotations

import hashlib
from datetime import datetime

import pytest

from cis455crawler_spark.plans.crawl import CrawlConfig, parsed_latest, run_crawl

from .oracle import oracle_crawl

HOST = "h.test"


def _ok(name: str) -> bool:
    """Route = 200 + text/html under the md5-derived fetch metadata."""
    h = hashlib.md5(f"http://{HOST}/{name}".encode()).hexdigest()
    return h[0] not in "01" and h[1] not in "012"


def _pick(prefix: str, count: int, suffix: str = "") -> list[str]:
    out, n = [], 0
    while len(out) < count:
        name = f"{prefix}{n:03d}{suffix}"
        if _ok(name):
            out.append(name)
        n += 1
    return out


@pytest.fixture(scope="module")
def dup_corpus(spark):
    """seed -> 3 identical-body dup pages + f; f -> a 4th dup (next round,
    exercises the cross-round content_seen table). Dup bodies carry a
    relative href, so each NON-suppressed dup contributes a distinct
    '<dup-url>/sub.html' frontier entry."""
    (seed,) = _pick("s", 1, ".html")
    dups = sorted(_pick("d", 3))  # same round: smallest url claims the digest
    (f,) = _pick("f", 1, ".html")
    (late_dup,) = _pick("z", 1)

    dup_body = b'<html><body><a href="sub.html">x</a>dup text</body></html>'

    def page(name: str, body: bytes):
        return (
            f"http://{HOST}/{name}",
            datetime(2013, 3, 1),
            bytearray(body),
            "",
            "en",
        )

    def links_page(name: str, hrefs: list[str]) -> tuple:
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return page(name, f"<html><body>{body}</body></html>".encode())

    rows = [
        page("robots.txt", b"User-agent: *\nDisallow: /private\n"),
        links_page(seed, dups + [f]),
        links_page(f, [late_dup]),
        *[page(d, dup_body) for d in dups],
        page(late_dup, dup_body),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    page_map = {u: bytes(h) for u, _, h, _, _ in rows}
    return pages, page_map, f"http://{HOST}/{seed}", dups, late_dup


def test_content_dedup_matches_oracle(spark, dup_corpus, tmp_path):
    pages, page_map, seed, dups, late_dup = dup_corpus
    cfg = CrawlConfig(max_rounds=10, content_dedup=True)
    store, metrics = run_crawl(spark, pages, [seed], str(tmp_path / "st"), cfg)
    want = oracle_crawl(page_map, [seed], max_rounds=10, content_dedup=True)

    # final URL-seen set equality under the dedup-aware oracle
    got_seen = {r.url_hash for r in store.read("seen").select("url_hash").collect()}
    assert got_seen == want.seen

    # per-round metrics incl. the content_dup counter (same round count —
    # zip must not silently truncate a divergent run)
    assert len(metrics) == len(want.metrics)
    for got, exp in zip(metrics, want.metrics):
        for key in ("urls_in", "scheduled", "parsed_pages", "content_dup"):
            assert got[key] == exp[key], (got["round"], key)

    # exactly the oracle's parsed set persists (dups suppressed): the
    # canonical smallest-url dup parsed, its two same-round twins and the
    # later-round fourth copy did not
    parsed_urls = {r.url for r in parsed_latest(store).select("url").collect()}
    assert parsed_urls == set(want.docs)
    canonical = f"http://{HOST}/{dups[0]}"
    assert canonical in parsed_urls
    for d in dups[1:]:
        assert f"http://{HOST}/{d}" not in parsed_urls
    assert f"http://{HOST}/{late_dup}" not in parsed_urls
    assert sum(m["content_dup"] for m in metrics) == 3

    # the content_seen table is a digest-keyed set: one row per unique body
    cs = store.read("content_seen").collect()
    digests = [r.digest for r in cs]
    assert len(digests) == len(set(digests))
    assert {r.url for r in cs} == set(want.docs)

    # suppression is visible in coverage: the suppressed dups' page-relative
    # sub-URLs never enter the frontier (they DO without dedup)
    plain = oracle_crawl(page_map, [seed], max_rounds=10)
    assert want.seen < plain.seen
    from .oracle import o_sha1

    for d in dups[1:]:
        assert o_sha1(f"http://{HOST}/{d}/sub.html") in plain.seen
        assert o_sha1(f"http://{HOST}/{d}/sub.html") not in want.seen


def test_content_dedup_composes_with_follow_redirects(spark, dup_corpus, tmp_path):
    """Knobs compose: with follow_redirects on, redirect targets become
    fetchable and their bodies enter the content-seen test like any other
    parse — seen set still matches the twice-knob-aware oracle."""
    pages, page_map, seed, _, _ = dup_corpus
    cfg = CrawlConfig(max_rounds=10, content_dedup=True, follow_redirects=True)
    store, metrics = run_crawl(spark, pages, [seed], str(tmp_path / "cf"), cfg)
    want = oracle_crawl(
        page_map, [seed], max_rounds=10, content_dedup=True, follow_redirects=True
    )
    got_seen = {r.url_hash for r in store.read("seen").select("url_hash").collect()}
    assert got_seen == want.seen
    assert {r.url for r in parsed_latest(store).select("url").collect()} == set(
        want.docs
    )
    assert len(metrics) == len(want.metrics)
    for got, exp in zip(metrics, want.metrics):
        assert got["content_dup"] == exp["content_dup"], got["round"]


def test_content_dedup_off_is_parity(spark, dup_corpus, tmp_path):
    """Default config on the same dup-heavy corpus still matches the plain
    oracle exactly — the flag changes nothing unless opted in."""
    pages, page_map, seed, _, _ = dup_corpus
    store, metrics = run_crawl(
        spark, pages, [seed], str(tmp_path / "off"), CrawlConfig(max_rounds=10)
    )
    want = oracle_crawl(page_map, [seed], max_rounds=10)
    got_seen = {r.url_hash for r in store.read("seen").select("url_hash").collect()}
    assert got_seen == want.seen
    assert {r.url for r in parsed_latest(store).select("url").collect()} == set(
        want.docs
    )
    assert store.read("content_seen") is None
    assert all("content_dup" not in m for m in metrics)
