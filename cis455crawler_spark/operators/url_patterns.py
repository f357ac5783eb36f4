"""URL template mining: collapse URLs to structural templates (digit runs
and long hex runs abstracted) and count how many distinct URLs each
template mints per host.

This is the standard crawl-frontier analytics pass behind (a) crawler-trap
triage — a template minting unbounded URLs (`/cal/{d}/{d}/{d}`) is a
calendar trap; (b) URL-normalization rule mining (Dasgupta et al., WWW
2008, "URL normalization inside-out"); (c) per-template sampling quotas so
one faceted-search template can't dominate a host's crawl budget.

Shape at scale: one regexp projection (codegen) + ONE map-side-combinable
groupBy(host, template). A template minted 10^8 times collapses to one
partial row per map task before the shuffle — no skew surface. The
per-host share join is dimension-sized (hosts), broadcast-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import host_of

# hex runs MUST collapse before digit runs (a hex id contains digit runs
# that would otherwise be eaten first). A 8+-char run over the hex
# alphabet — either case, including a pure-digit one — reads as an opaque
# id {x}: requiring "at least one a-f letter" needs lookahead, which RE2
# (the DuckDB oracle engine) does not support, and a 8+-digit run is an
# opaque id for template purposes anyway. Shorter digit runs -> {d}.
_LONGHEX = r"\b[0-9a-fA-F]{8,}\b"
_DIGITS = r"[0-9]+"


def url_template(url) -> "F.Column":
    """Structural template of a URL: long hex/id runs -> {x}, remaining
    digit runs -> {d}. The placeholders contain no regex metacharacters,
    so the two passes compose safely."""
    return F.regexp_replace(
        F.regexp_replace(url, _LONGHEX, "{x}"), _DIGITS, "{d}"
    )


def mine_url_templates(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, template, n_urls, host_share) — distinct-URL count per
    structural template and its share of the host's URL space."""
    t = urls.select(
        host_of(url_col).alias("host"),
        url_template(F.col(url_col)).alias("template"),
        F.col(url_col).alias("url"),
    )
    per_tpl = t.groupBy("host", "template").agg(
        F.countDistinct("url").alias("n_urls")
    )
    per_host = t.groupBy("host").agg(
        F.countDistinct("url").alias("host_urls")
    )
    return (
        # per_host is host-cardinality (10^7-10^8 hosts at web scale) —
        # no forced broadcast; the join key is the group key, AQE decides
        per_tpl.join(per_host, "host")
        .select(
            "host",
            "template",
            "n_urls",
            F.round(F.col("n_urls") / F.col("host_urls"), 6).alias(
                "host_share"
            ),
        )
    )
