"""Soft-404 heuristics, URL template mining, cache-TTL parsing."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from cis455crawler_spark.functions.fetch import cache_ttl_seconds
from cis455crawler_spark.operators.soft404 import (
    host_soft404_rates,
    soft404_signals,
)
from cis455crawler_spark.operators.url_patterns import mine_url_templates


def test_soft404_signals(spark):
    rows = [
        Row(url="u1", title="404 Not Found", text="gone"),
        Row(url="u2", title="Error Handling in Java", text="x" * 200),
        Row(url="u3", title="All about 404s", text="this long article discusses page not found behavior " + "y" * 100),
        Row(url="u4", title="Short", text="tiny"),
        Row(url="u5", title="Fine", text="sorry, page not found"),  # error phrase + tiny
        Row(url="u6", title=None, text=None),
        Row(url="u7", title="Error", text="gone"),  # weak title + tiny body
    ]
    out = {r.url: r for r in soft404_signals(spark.createDataFrame(rows)).collect()}
    assert out["u1"].soft404  # strong title marker alone is decisive
    assert not out["u2"].soft404  # weak 'error' title + long clean body
    # u3: strong marker ('404s' does not match \b404\b... it does not: '404s'
    # has no word boundary after 404) -> title_strong False; body_error but
    # long -> not flagged
    assert not out["u3"].title_strong
    assert not out["u3"].soft404
    assert not out["u4"].soft404  # tiny but clean -> not flagged
    assert out["u5"].soft404  # error phrase AND tiny
    assert not out["u6"].soft404  # nulls -> no title/body signal
    assert out["u7"].soft404  # weak title corroborated by tiny body


def test_host_soft404_rates(spark):
    rows = [
        Row(host="a", url="u1", title="404 Not Found", text=""),
        Row(host="a", url="u2", title="ok", text="z" * 100),
        Row(host="b", url="u3", title="ok", text="z" * 100),
    ]
    flagged = soft404_signals(spark.createDataFrame(rows))
    out = {r.host: (r.n_pages, r.n_soft404, r.soft404_rate) for r in host_soft404_rates(flagged).collect()}
    assert out["a"] == (2, 1, 0.5)
    assert out["b"] == (1, 0, 0.0)


def test_mine_url_templates(spark):
    rows = [
        Row(url="http://h.test/item/123"),
        Row(url="http://h.test/item/456"),
        Row(url="http://h.test/item/456"),  # dup URL: distinct count stays 2
        Row(url="http://h.test/about"),
        Row(url="http://h.test/obj/deadbeef00"),  # 10 hex chars -> {x}
        Row(url="http://h.test/obj/DEADBEEF2A"),  # uppercase id -> {x} too
        Row(url="http://other.test/item/9"),
    ]
    out = {
        (r.host, r.template): (r.n_urls, r.host_share)
        for r in mine_url_templates(spark.createDataFrame(rows)).collect()
    }
    assert out[("h.test", "http://h.test/item/{d}")] == (2, 0.4)
    assert out[("h.test", "http://h.test/about")] == (1, 0.2)
    assert out[("h.test", "http://h.test/obj/{x}")] == (2, 0.4)
    assert out[("other.test", "http://other.test/item/{d}")] == (1, 1.0)


def test_cache_ttl_precedence(spark):
    cases = [
        ("no-store", 0),
        ("no-cache, max-age=500", 0),
        ("Private, MAX-AGE=42", 0),  # shared cache may not reuse private
        ("s-maxage=600, max-age=60", 600),
        ("max-age=120", 120),
        # must-revalidate does NOT shorten freshness (RFC 9111 §5.2.2.2)
        ("must-revalidate, max-age=300", 300),
        ("must-revalidate", 86400),
        ("public", 86400),  # no freshness directive
        (None, 86400),  # absent header
        ("max-age = 7", 7),  # whitespace around '='
    ]
    df = spark.createDataFrame(
        [Row(i=i, cc=cc) for i, (cc, _) in enumerate(cases)]
    )
    out = {
        r.i: r.ttl
        for r in df.select(
            "i", cache_ttl_seconds(F.col("cc")).alias("ttl")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert out[i] == want, (i, cases[i], out[i])
