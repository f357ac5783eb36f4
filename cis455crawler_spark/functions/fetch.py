"""Fetch-path metadata + routing (O-F1/F2/F3, O-X9) — pure JVM columns.

The reference's per-URL HEAD/GET pipeline
(Crawler/src/com/datformers/crawler/XPathCrawlerThread.java:148-253) routes on
HTTP status, Content-Type and Content-Length before any parse:

  301/302  record redirect: mark the URL seen AND the Location target seen,
           but do NOT enqueue it (:148-175 — the enqueue is a TODO in the
           reference; the Location lands in visitedURL only)
  304      Not-Modified (If-Modified-Since hit, :129-146,231-253): reuse the
           stored document's extracted links, no re-fetch, no DB write
  200      Content-Type must substring-match the MIME allowlist (:176-190,
           case-insensitive contains) and Content-Length must be present and
           <= MAX_SIZE (:191-199, XPathCrawler.java:156-158 CLI arg in MB);
           only then GET + parse + writeToDB

The sandbox corpus is an offline page table (input_hint schema: url, warc_ts,
html, text, lang), so the HTTP response metadata is *derived* deterministically
from the url via md5 prefix characters. md5 is available in Spark, DuckDB and
Python hashlib alike, which keeps the exact same derivation computable by the
engine, the driver's SQL oracle, and tests/oracle.py.

Derivation (single hex-char switches — no hex->int conversion needed):
  md5(url)[0] == '0' -> 301        md5(url)[1] == '0' -> application/pdf
  md5(url)[0] == '1' -> 302        md5(url)[1] == '1' -> image/png
  otherwise          -> 200        md5(url)[1] == '2' -> text/plain
                                   otherwise          -> text/html
  Location (for 301/302): http://<host-of-url>/p0.html
  Content-Length: length(html) bytes
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .urls import host_of

# XPathCrawlerThread.java:50-55 verbatim (all-lowercase; the check is
# mimeType.toLowerCase().contains(allowedType))
ALLOWED_MIME_TYPES = (
    "text/html", "text/xml", "application/xml", "application/atom+xml",
    "application/dash+xml", "application/rdf+xml", "application/rss+xml",
    "application/soap+xml", "application/xhtml+xml", "application/xop+xml",
    "application/smil+xml", "image/svg+xml", "message/imdn+xml",
    "model/x3d+xml", "application/vnd.mozilla.xul+xml",
    "application/vnd.google-earth.kml+xml",
)

MAX_CONTENT_BYTES_DEFAULT = 5 * 1024 * 1024  # WorkerServlet.java:221 (5 MB)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def status_of(url: Column | str) -> Column:
    """Derived HTTP status for an offline-corpus url (see module docstring)."""
    c0 = F.substring(F.md5(_c(url)), 1, 1)
    return (
        F.when(c0 == "0", F.lit(301))
        .when(c0 == "1", F.lit(302))
        .otherwise(F.lit(200))
    )


def content_type_of(url: Column | str) -> Column:
    """Derived Content-Type header value."""
    c1 = F.substring(F.md5(_c(url)), 2, 1)
    return (
        F.when(c1 == "0", F.lit("application/pdf"))
        .when(c1 == "1", F.lit("image/png"))
        .when(c1 == "2", F.lit("text/plain; charset=utf-8"))
        .otherwise(F.lit("text/html; charset=UTF-8"))
    )


def location_of(url: Column | str) -> Column:
    """Derived Location header for 301/302 responses: the host's front page.
    The reference records this target into visitedURL without enqueueing it
    (XPathCrawlerThread.java:155-168) — a quirk the crawl plan preserves."""
    return F.concat(F.lit("http://"), host_of(_c(url)), F.lit("/p0.html"))


def mime_allowed(content_type: Column | str) -> Column:
    """Case-insensitive substring match against the reference allowlist
    (XPathCrawlerThread.java:176-190). NULL content type -> not allowed."""
    ct = F.lower(_c(content_type))
    ok = F.lit(False)
    for t in ALLOWED_MIME_TYPES:
        ok = ok | ct.contains(t)
    return F.coalesce(ok, F.lit(False))


def route_fetch(
    html: Column | str,
    url: Column | str,
    stored_ts: Column | None = None,
    warc_ts: Column | None = None,
    max_content_bytes: int = MAX_CONTENT_BYTES_DEFAULT,
) -> Column:
    """The routing decision column, checks in the reference's order
    (XPathCrawlerThread.java:148-253): miss -> redirect -> not_modified ->
    mime_reject -> size_reject -> parse.

    `stored_ts` (nullable) is the warc_ts recorded at the last successful
    parse of this url; a page whose current warc_ts has not advanced past it
    answers 304 to the If-Modified-Since HEAD.
    """
    h, u = _c(html), _c(url)
    status = status_of(u)
    not_modified = (
        F.lit(False)
        if stored_ts is None
        else stored_ts.isNotNull() & (_c(warc_ts) <= stored_ts)
    )
    return (
        F.when(h.isNull(), F.lit("miss"))
        .when(status.isin(301, 302), F.lit("redirect"))
        .when(not_modified, F.lit("not_modified"))
        .when(~mime_allowed(content_type_of(u)), F.lit("mime_reject"))
        .when(F.length(h) > max_content_bytes, F.lit("size_reject"))
        .otherwise(F.lit("parse"))
    )


# --- HTTP cache freshness (RFC 9111) -> recrawl TTL -----------------------

CACHE_NOCACHE_RE = r"(?i)no-store|no-cache|private"
CACHE_SMAXAGE_RE = r"(?i)s-maxage\s*=\s*([0-9]+)"
CACHE_MAXAGE_RE = r"(?i)max-age\s*=\s*([0-9]+)"


def cache_ttl_seconds(
    cache_control: Column | str, default_ttl: int = 86400
) -> Column:
    """Freshness lifetime (seconds) from a Cache-Control header value,
    per RFC 9111 precedence for a SHARED cache (a crawler is one):

      no-store / no-cache / private -> 0 (no-store/no-cache: always
          revalidate, §5.2.2.4/.5; private: a shared cache must not
          reuse the response at all, §5.2.2.7 — TTL 0 schedules a fresh
          fetch every visit)
      s-maxage=N  (shared-cache override, §5.2.2.10) -> N
      max-age=N   (§5.2.2.1)                         -> N
      no freshness directive / NULL header           -> default_ttl

    must-revalidate is deliberately NOT in the zero bucket: it does not
    shorten freshness, it only forbids serving stale once the max-age
    lifetime has passed (§5.2.2.2) — 'max-age=3600, must-revalidate' is
    fresh for the full 3600 s.

    The regexes can't collide: "s-maxage" does not contain the substring
    "max-age" (no hyphen between max and age), so the plain max-age
    pattern never matches inside an s-maxage directive. Pure JVM regexp —
    this is the header-driven analogue of the Poisson change-rate
    estimator in operators/recrawl.py: servers that declare freshness get
    scheduled from their own declaration, the rest from observed change
    history."""
    cc = _c(cache_control)
    nocache = F.coalesce(cc.rlike(CACHE_NOCACHE_RE), F.lit(False))
    smax = F.regexp_extract(cc, CACHE_SMAXAGE_RE, 1)
    mage = F.regexp_extract(cc, CACHE_MAXAGE_RE, 1)
    return (
        F.when(nocache, F.lit(0).cast("long"))
        .when(smax != "", smax.cast("long"))
        .when(mage != "", mage.cast("long"))
        .otherwise(F.lit(default_ttl).cast("long"))
    )
