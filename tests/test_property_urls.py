"""Property-based differential tests for the URL kernels: the engine's
JVM-side Column expressions (functions/urls.py) vs the independently written
pure-Python oracle (tests/oracle.py), over randomized (page_url, href) pairs
that exercise every branch of the reference's quirk resolver
(XPathCrawlerThread.java:301-352) — absolute-drop, .html/.htm host
resolution, trailing-slash append, bare-path '/' join — plus host parse and
sha1.

Each hypothesis example is a BATCH of pairs run through ONE Spark job
(per-pair jobs would be seconds each); shrinking still isolates a minimal
failing batch.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cis455crawler_spark.functions.urls import host_of, resolve_href, sha1_hex

from .oracle import o_host, o_resolve, o_sha1

_scheme = st.sampled_from(["http://", "https://", ""])
_host = st.sampled_from(["h.test", "h.test:8080", "sub.h.test", "h"])
_path = st.sampled_from(
    ["", "/", "/a/b.html", "/x.htm", "/dir/", "/doc", "/a.html/trap",
     "/p.HTML", "/a//b", "/.html"]
)
_page_url = st.tuples(_scheme, _host, _path).map(lambda t: "".join(t))

_href = st.one_of(
    # relative shapes (incl. scheme-ish quirk fodder routed down the
    # relative branch because they don't start with "http")
    st.sampled_from(
        ["p1.html", "dir/", "doc5", "sub/dir/x.htm", "../up", "a b",
         "mailto:a@b.test", "ftp://f.test/x", "sec#frag", "JavaScript:v()",
         "a:b", "?q=1", ".", ""]
    ),
    # absolute shapes (always dropped unless colon/hash/javascript-free,
    # which "http..." can never be once it has "://")
    st.sampled_from(
        ["http://abs.test/x", "https://abs.test/", "httpz-no-colon",
         "http", "HTTP://upper.test/x", "http://x.test/a#b",
         "http://x.test/JAVASCRIPT"]
    ),
    # arbitrary low-entropy text
    st.text(alphabet="abch:/#t.", max_size=12),
)

_pairs = st.lists(st.tuples(_page_url, _href), min_size=1, max_size=150)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=_pairs)
def test_url_kernels_match_oracle_batched(spark, pairs):
    df = spark.createDataFrame(pairs, "url string, href string")
    got = df.select(
        "url",
        "href",
        resolve_href("url", "href").alias("r"),
        host_of("url").alias("h"),
        sha1_hex("url").alias("s"),
    ).collect()
    assert len(got) == len(pairs)
    for row in got:
        assert row["r"] == o_resolve(row["url"], row["href"]), (row["url"], row["href"])
        assert row["h"] == o_host(row["url"]), row["url"]
        assert row["s"] == o_sha1(row["url"]), row["url"]


# -- canonicalize_url (beyond-reference frontier op) -------------------------

_c_scheme = st.sampled_from(["http", "https", "HTTP", "ftp"])
_c_user = st.sampled_from(["", "User:Pw@", "u@", "a@B@"])
_c_host = st.sampled_from(
    ["Example.COM", "h.test", "H", "[::1]", "[2001:DB8::1]", "Odd:1"]
)
_c_port = st.sampled_from(["", ":80", ":443", ":8080", ":0"])
_c_path = st.sampled_from(["", "/", "/A/b.html", "/p//q", "/CaseKept"])
_c_param = st.sampled_from(
    ["a=1", "b=2", "A=3", "utm_source=x", "utm_=y", "gclid=1", "fbclid=2",
     "msclkid=3", "mc_eid=4", "ref=r", "ref_src=t", "refx=keep", "k", "="]
)
_c_query = st.lists(_c_param, max_size=4).map(
    lambda ps: "?" + "&".join(ps) if ps else ""
)
_c_frag = st.sampled_from(["", "#f", "#a/b?c"])
_c_pad = st.sampled_from(["", " ", "  "])

_c_url = st.tuples(
    _c_pad, _c_scheme, _c_user, _c_host, _c_port, _c_path, _c_query, _c_frag, _c_pad
).map(lambda t: f"{t[0]}{t[1]}://{t[2]}{t[3]}{t[4]}{t[5]}{t[6]}{t[7]}{t[8]}")

_c_urls = st.lists(
    st.one_of(_c_url, st.sampled_from(["no-scheme", "mailto:a@b.c", ""])),
    min_size=1,
    max_size=150,
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(urls=_c_urls)
def test_canonicalize_url_matches_oracle_batched(spark, urls):
    from cis455crawler_spark.functions.urls import canonicalize_url

    from .test_functions import o_canonicalize

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]
    for u, g in zip(urls, got):
        assert g == o_canonicalize(u), u


# -- resolve_href_standard (RFC 3986 mode) ------------------------------------

_s_page = st.sampled_from(
    ["http://h.test/a/b.html", "https://h.test:8080/dir/", "http://h.test",
     "http://h.test/x?q=1", "http://h.test/a/b/c/"]
)
_s_href = st.one_of(
    st.sampled_from(
        ["p.html", "dir/", "../up", "../../up2", "./same", ".", "..",
         "a/./b", "a/b/../c", "/root", "/r/../s", "//other.test/p",
         "//other.test/a/../b", "http://abs.test/x", "http://abs.test",
         "HTTP://abs.test/a/../b", "https://abs.test/a/./b?q=2",
         "http://abs.test/a/b/..", "mailto:a@b.c", "javascript:void(0)",
         "?q=2", "", "#frag", "\n/ws.html\t", "  http://abs.test/sp  "]
    ),
    st.text(alphabet="ab./:?h", max_size=14),
)
_s_pairs = st.lists(st.tuples(_s_page, _s_href), min_size=1, max_size=150)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=_s_pairs)
def test_resolve_standard_matches_oracle_batched(spark, pairs):
    """Engine vs pure-Python mirror over randomized (page, href) pairs —
    including absolute hrefs with dot segments (RFC 3986 §5.2.2 applies
    remove_dot_segments even when R has its own scheme) and trailing
    '.'/'..' (which must keep the trailing slash per §5.2.4). Also pins
    parts= (resolve_base_parts) to be output-identical to the derive-inline
    path — the crawl plan resolves with parts bound once per row."""
    from cis455crawler_spark.functions.urls import (
        resolve_base_parts,
        resolve_href_standard,
    )

    from .oracle import o_resolve_standard

    df = spark.createDataFrame(pairs, "url string, href string")
    got = df.select(
        "url",
        "href",
        resolve_href_standard("url", "href").alias("r"),
        resolve_href_standard(
            "url", "href", parts=resolve_base_parts("url")
        ).alias("rp"),
    ).collect()
    for row in got:
        want = o_resolve_standard(row["url"], row["href"])
        assert row["r"] == want, (row["url"], row["href"], row["r"], want)
        assert row["rp"] == row["r"], (row["url"], row["href"])


def test_resolve_standard_rfc_values(spark):
    """Exact RFC 3986 §5.4 reference-resolution examples (base adapted to
    http) plus the round-5 review shapes: absolute-href dot segments and
    trailing-dot slash retention."""
    base = "http://a.test/b/c/d;p?q"
    cases = [
        # §5.4.1 normal examples (subset expressible without empty-scheme refs)
        ("g", "http://a.test/b/c/g"),
        ("./g", "http://a.test/b/c/g"),
        ("g/", "http://a.test/b/c/g/"),
        ("/g", "http://a.test/g"),
        ("?y", "http://a.test/b/c/d;p?y"),
        ("..", "http://a.test/b/"),
        ("../", "http://a.test/b/"),
        ("../g", "http://a.test/b/g"),
        ("../..", "http://a.test/"),
        ("../../", "http://a.test/"),
        ("../../g", "http://a.test/g"),
        # §5.4.2 abnormal: ".." past root clamps
        ("../../../g", "http://a.test/g"),
        (".", "http://a.test/b/c/"),
        ("./", "http://a.test/b/c/"),
        # review shapes: absolute href normalizes too (§5.2.2)
        ("http://h.test/a/../b", "http://h.test/b"),
        ("http://h.test/a/b/..", "http://h.test/a/"),
        ("http://h.test", "http://h.test/"),
        ("//h.test/x/../y", "http://h.test/y"),
    ]
    from cis455crawler_spark.functions.urls import resolve_href_standard

    from .oracle import o_resolve_standard

    df = spark.createDataFrame(
        [(base, h) for h, _ in cases], "url string, href string"
    )
    got = [
        r["r"]
        for r in df.select(resolve_href_standard("url", "href").alias("r"))
        .collect()
    ]
    for (h, want), g in zip(cases, got):
        assert g == want, (h, g, want)
        assert o_resolve_standard(base, h) == want, h
