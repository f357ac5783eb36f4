"""Property-based differential test (hypothesis): the engine's robots
parsing/permission/delay pipeline (cis455crawler_spark/functions/robots.py,
pure-Python half) must agree with the independently written oracle
(tests/oracle.py) on RANDOM robots.txt bodies and urls — not just the seven
fixture patterns. Both re-implement XPathCrawlerThread.java:436-557 and
DomainRules.java:17-40; any divergence is a bug in one of them.

Pure Python — no SparkSession, so the whole property run takes milliseconds.
(The Column-expression twin, crawl_allowed, is pinned to the same oracle by
tests/test_functions.py::test_crawl_allowed_matches_oracle.)
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cis455crawler_spark.functions.robots import (
    effective_delay,
    effective_disallow,
    parse_robots_txt,
)

from .oracle import o_allowed, o_delay, o_parse_robots

_AGENTS = ["cis455Crawler", "*", "SomeOtherBot", "cis455crawler", ""]
_PATHS = ["/", "/private", "/tmp", "doc", "/p", "/never*", "x*y", "", "  /a  "]

_line = st.one_of(
    st.tuples(st.just("User-agent"), st.sampled_from(_AGENTS)),
    st.tuples(st.just("Disallow"), st.sampled_from(_PATHS)),
    st.tuples(st.just("Allow"), st.sampled_from(_PATHS)),
    st.tuples(st.just("Crawl-delay"), st.sampled_from(["1", "5", "0", "-3", "x"])),
    st.tuples(st.just("Sitemap"), st.sampled_from(["http://x.test/s.xml", "s.xml"])),
    # junk lines: no colon (skipped) or unknown keys
    st.tuples(st.sampled_from(["#comment", "Noise", ""]), st.just("v")),
)

_body = st.lists(_line, max_size=12).map(
    lambda ls: "\n".join(f"{k}: {v}" if k else v for k, v in ls)
)

_url = st.sampled_from(
    [
        "http://h.test/p1.html",
        "http://h.test/private/x",
        "http://h.test/tmp/y",
        "http://h.test/doc9",
        "http://h.test/never/land",
        "http://h.test/",
    ]
)


@settings(max_examples=300, deadline=None)
@given(body=_body, url=_url)
def test_engine_robots_semantics_match_oracle(body: str, url: str):
    parsed = parse_robots_txt(body)
    want = o_parse_robots(body)

    # the deny/allow DECISION must agree (the reference's full predicate:
    # deny-by-default, first-entry '/', '*'-stops-scan, substring match)
    rules = effective_disallow(parsed)
    got_allowed = _decide(url, rules)
    assert got_allowed == o_allowed(url, want), (body, url)

    # crawl delay (lowercase-agent-first quirk)
    assert effective_delay(parsed) == o_delay(want), body


def _decide(url: str, rules: list[str] | None) -> bool:
    """Driver-side evaluation of the engine's effective-rules contract —
    mirrors crawl_allowed's documented semantics over the SAME rules list
    the engine feeds the Column expression (robots.py docstring)."""
    if rules is None:
        # host HAS a robots record here (we parsed a body); engine treats a
        # record with no applicable rules as deny (quirk)
        return False
    if not rules:
        return False
    if rules[0] == "/":
        return False
    for r in rules:
        if "*" in r:
            return True  # scan stops
        if r in url:
            return False
    return True


@settings(max_examples=300, deadline=None)
@given(body=_body)
def test_sitemaps_and_agent_buckets_match_oracle(body: str):
    parsed = parse_robots_txt(body)
    want = o_parse_robots(body)
    assert parsed["disallow"] == want["disallow"], body
    assert parsed["delays"] == {
        k: v for k, v in want["delays"].items()
    }, body
