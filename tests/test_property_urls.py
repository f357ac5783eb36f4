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
