"""robots.txt parsing and the quirk-exact crawl-permission predicate.

Parsing re-expresses XPathCrawlerThread.fetchAndParseRobots
(/root/reference/Crawler/src/com/datformers/crawler/XPathCrawlerThread.java:526-557):
only lines containing ':' are considered; split on ':' keeps fields[0]/[1]
(so a `Sitemap: http://x` value loses everything after the second ':' — quirk
kept); rules accumulate under the most recent `User-agent` line (possibly the
None agent before any User-agent line — quirk kept).

The permission predicate re-expresses isCrawlingAllowed
(XPathCrawlerThread.java:436-491) as a pure Column expression over an
ARRAY<STRING> of effective disallow rules — evaluated JVM-side with
F.aggregate (ordered scan with early-exit semantics), NO Python UDF:

  host has no robots record at all              -> ALLOW  (:437-438)
  effective rules = rules["cis455Crawler"] else rules["*"]  (:452-454)
  effective rules missing or empty              -> DENY   (:455-463, quirk)
  first entry == "/"                            -> DENY   (:464-472)
  scan in order: entry contains '*' -> stop scanning -> ALLOW (:473-475)
                 url contains entry (SUBSTRING, not prefix) -> DENY (:477-487)

Politeness/crawl-delay lookup (DomainRules.java:20-22, quirk: lowercase agent
key "cis455crawler" first — usually misses — then "*"): delay_for_agent().
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

USER_AGENT = "cis455Crawler"
# DomainRules.java:20 looks up the crawl delay with the lowercased agent name.
USER_AGENT_DELAY_KEY = "cis455crawler"


def parse_robots_txt(body: str) -> dict:
    """Parse one robots.txt body into per-agent rule lists (driver-side or
    inside an Arrow batch; robots rows are a tiny fraction of the corpus)."""
    disallow: dict[str | None, list[str]] = {}
    allow: dict[str | None, list[str]] = {}
    delays: dict[str | None, int] = {}
    sitemaps: list[str] = []
    agent: str | None = None
    for line in body.splitlines():
        if ":" not in line:
            continue
        fields = line.split(":")
        key = fields[0].strip()
        value = fields[1].strip() if len(fields) > 1 else ""
        lk = key.lower()
        if lk == "allow":
            allow.setdefault(agent, []).append(value)
        elif lk == "disallow":
            disallow.setdefault(agent, []).append(value)
        elif lk == "user-agent":
            agent = value
        elif lk == "crawl-delay":
            try:
                delays[agent] = int(value)
            except ValueError:
                pass
        elif lk == "sitemap":
            sitemaps.append(value)
    return {"disallow": disallow, "allow": allow, "delays": delays, "sitemaps": sitemaps}


def effective_disallow(parsed: dict) -> list[str] | None:
    """rules["cis455Crawler"] else rules["*"] else None (:452-454)."""
    d = parsed["disallow"]
    if USER_AGENT in d:
        return d[USER_AGENT]
    return d.get("*")


def effective_delay(parsed: dict) -> int:
    """Crawl delay with the reference's lowercase-key quirk
    (DomainRules.java:20-22, getCrawlDelay returns 0 when absent)."""
    delays = parsed["delays"]
    d = delays.get(USER_AGENT_DELAY_KEY, 0)
    if d <= 0:
        d = delays.get("*", 0)
    return d if d > 0 else 0


def build_robots_df(spark, pages: DataFrame, with_standard: bool = False) -> DataFrame:
    """robots rules table from the corpus's /robots.txt rows.

    Output: (host STRING, has_robots BOOLEAN, disallow ARRAY<STRING> nullable,
    crawl_delay INT, sitemaps ARRAY<STRING>). Parsing runs DISTRIBUTED in an
    Arrow-batched pandas UDF — at 10^10-URL scale there are millions of
    hosts, so the robots bodies never pass through the driver; the resulting
    rules table (a few columns per host) is small relative to the frontier
    and is the broadcast-join side. Sitemaps are carried through
    (RobotsTxtInfo.java addSitemapLink via XPathCrawlerThread.java:548-549);
    the stored value is split(':')[1].trim() — an absolute sitemap URL
    truncates to just 'http' — parser quirk kept verbatim.

    with_standard=True adds a `std_rules` column (RFC 9309 pre-compiled
    rules, functions/robots_standard.py) parsed from the SAME bodies in the
    SAME Arrow pass — the standard-mode crawl pays one pages scan, not two.
    """
    from .urls import host_of

    fields = (
        "struct<disallow: array<string>, crawl_delay: int, sitemaps: array<string>"
        + (
            ", std_rules: array<struct<pattern: string, rlen: int, allow: boolean>>"
            if with_standard
            else ""
        )
        + ">"
    )
    if with_standard:
        from .robots_standard import parse_robots_standard

    @F.pandas_udf(fields)
    def _parse(body: pd.Series) -> pd.DataFrame:
        cols: dict[str, list] = {"disallow": [], "crawl_delay": [], "sitemaps": []}
        if with_standard:
            cols["std_rules"] = []
        for b in body:
            p = parse_robots_txt(b or "")
            cols["disallow"].append(effective_disallow(p))
            cols["crawl_delay"].append(effective_delay(p))
            cols["sitemaps"].append(p["sitemaps"])
            if with_standard:
                cols["std_rules"].append(parse_robots_standard(b or ""))
        return pd.DataFrame(cols)

    out_cols = ["disallow", "crawl_delay", "sitemaps"] + (
        ["std_rules"] if with_standard else []
    )
    return (
        pages.where(F.col("url").endswith("/robots.txt"))
        .select(host_of("url").alias("host"), F.col("html").cast("string").alias("body"))
        .select("host", F.lit(True).alias("has_robots"), _parse("body").alias("_p"))
        .select("host", "has_robots", *[F.col(f"_p.{c}").alias(c) for c in out_cols])
    )


def crawl_allowed(url: Column, has_robots: Column, disallow: Column) -> Column:
    """The isCrawlingAllowed predicate as one JVM-side expression.

    The ordered early-exit scan becomes F.aggregate over the disallow array
    with a (done, deny) struct accumulator. The reference's separate
    first-entry-'/' pre-check (:464-472) is subsumed by the scan: '/' is a
    substring of every URL, so entry 0 == '/' denies either way.
    """
    scan = F.aggregate(
        disallow,
        F.struct(F.lit(False).alias("done"), F.lit(False).alias("deny")),
        lambda acc, p: F.when(acc["done"], acc)
        .when(
            p.contains("*"),
            F.struct(F.lit(True).alias("done"), F.lit(False).alias("deny")),
        )
        .when(
            url.contains(p),
            F.struct(F.lit(True).alias("done"), F.lit(True).alias("deny")),
        )
        .otherwise(acc),
    )
    return (
        F.when(~F.coalesce(has_robots, F.lit(False)), F.lit(True))  # no record -> allow
        .when(disallow.isNull() | (F.size(disallow) == 0), F.lit(False))  # quirk deny
        .otherwise(~scan["deny"])
    )
