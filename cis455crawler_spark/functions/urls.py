"""URL column functions — quirk-exact re-expressions of the reference crawler's
URL handling, as pure JVM-side Column expressions (whole-stage codegen; no
Python in the hot path).

Reference semantics reproduced here (citations into /root/reference):
  * host parse keeps the port and splits on '/' only
    (Crawler/src/com/datformers/crawler/XPathCrawlerThread.java:65-73)
  * SHA-1 over the URL string, hex form
    (Crawler/src/com/datformers/crawler/XPathCrawler.java:296-331)
  * link junk filter: hrefs starting with "http" are dropped when they contain
    ':' / '#' / 'javascript' — since "http:" contains ':', ALL absolute hrefs
    are dropped (XPathCrawlerThread.java:316-321,347-352)
  * relative resolution is NOT RFC 3986: three branches keyed on the page URL
    suffix (XPathCrawlerThread.java:301-315,329-346)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def host_of(url: Column | str) -> Column:
    """Extract the 'domain' exactly as XPathCrawlerThread.getDomain does.

    Java: if startswith("http") -> substring(indexOf('/')+2); then truncate at
    the next '/'. The port stays inside the host (quirk: split on '/' only).
    """
    u = _c(url)
    # indexOf('/') on "http://h/p" is the '/' of "://", +2 lands after "//".
    after_proto = F.when(
        u.startswith("http"), u.substr(F.instr(u, "/") + F.lit(2), F.length(u))
    ).otherwise(u)
    return F.substring_index(after_proto, "/", 1)


def protocol_of(url: Column | str) -> Column:
    """'https://' iff the URL starts with https, else 'http://'
    (XPathCrawlerThread.java:496-501, isHttps flag)."""
    u = _c(url)
    return F.when(u.startswith("https"), F.lit("https://")).otherwise(F.lit("http://"))


def sha1_hex(col: Column | str) -> Column:
    """40-char lowercase hex SHA-1 — value-identical to the reference's
    BigInteger(hex,16) keys for ASCII URLs (XPathCrawler.java:296-331).
    Kept as a hex STRING: equality and ordering preserved, no 160-bit
    decimal overflow anywhere in Spark."""
    return F.sha1(_c(col).cast("string"))


def url_hash_bucket(url_hash_hex: Column | str, num_buckets: int) -> Column:
    """Deterministic bucket id from the hex sha1 — the rebuild's analogue of
    the reference's SHA-1 hash-range worker sharding
    (Crawler/src/com/datformers/crawler/resources/OutgoingMap.java:27-58).
    15 hex chars = 60 bits, fits a long exactly."""
    h = _c(url_hash_hex)
    return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(num_buckets)).cast(
        "int"
    )


def _host_lc(host: Column) -> Column:
    """RFC 3986 §6.2.2.1 host-case normalization: lowercase the authority
    after the LAST '@' (userinfo keeps case; port digits are case-free).
    THE one definition — used by resolve_base_parts (host_lc field) and
    resolve_href_standard's inline fallback, so parts-mode and inline-mode
    can never emit different seen-set keys."""
    return F.concat(
        F.regexp_replace(host, r"[^@]*$", ""),
        F.lower(F.regexp_extract(host, r"([^@]*)$", 1)),
    )


def resolve_base_parts(page_url: Column | str) -> Column:
    """STRUCT<proto, host, page_path, base_dir> — the page-URL-derived pieces
    both resolvers need per href. Callers that resolve many hrefs per page
    inside a higher-order function should evaluate this ONCE per row (via
    functions/text.bind_once) and pass it as `parts=`: HOF lambda bodies get
    no subexpression elimination, so the regex chains below would otherwise
    re-run per array ELEMENT (hundreds of times per page on the parse path)."""
    u = _c(page_url)
    page_path = F.substring_index(path_of(u), "?", 1)
    hostp = host_of(u)
    return F.struct(
        protocol_of(u).alias("proto"),
        hostp.alias("host"),
        # §6.2.2.1-normalized page host for the STANDARD resolver —
        # precomputed here so the HOF hot path pays the regex chains once
        # per row, not per href; the quirk resolver keeps reading the
        # case-preserving 'host' field
        _host_lc(hostp).alias("host_lc"),
        page_path.alias("page_path"),
        F.when(page_path == "", F.lit("/"))
        .otherwise(F.regexp_replace(page_path, "[^/]*$", ""))
        .alias("base_dir"),
    )


def resolve_href(
    page_url: Column | str, href: Column | str, parts: Column | None = None
) -> Column:
    """Resolve one extracted href against its page URL, returning NULL for
    hrefs the reference drops.

    Branches (XPathCrawlerThread.java:301-321, identical for <a> at :329-352 —
    the <a> branch's `toAdd` variable is dead code):
      href startswith "http":
          contains ':' or '#' or lowercase-contains 'javascript' -> DROP
          (http: always contains ':' -> all absolute hrefs drop); otherwise
          the href is taken verbatim (unreachable for real absolute URLs).
      else (treated as relative, even mailto:/ftp: etc. — quirk):
          page endswith .html|.htm -> proto + host(page) + '/' + href
          page endswith '/'        -> page + href
          else                     -> page + '/' + href

    `parts` (resolve_base_parts output) skips re-deriving proto/host per
    call — pass it when resolving inside a HOF lambda (see resolve_base_parts).
    """
    u = _c(page_url)
    h = _c(href)
    proto = parts["proto"] if parts is not None else protocol_of(u)
    hostp = parts["host"] if parts is not None else host_of(u)
    junk = (
        h.contains(":") | h.contains("#") | F.lower(h).contains("javascript")
    )
    rel = (
        F.when(
            u.endswith(".html") | u.endswith(".htm"),
            F.concat(proto, hostp, F.lit("/"), h),
        )
        .when(u.endswith("/"), F.concat(u, h))
        .otherwise(F.concat(u, F.lit("/"), h))
    )
    return F.when(h.startswith("http"), F.when(junk, F.lit(None)).otherwise(h)).otherwise(rel)


def _collapse_dot_segments(norm: Column) -> Column:
    """RFC 3986 §5.2.4 remove_dot_segments as a bounded 8-deep regex unroll
    (deeper chains survive un-normalized: still valid, just distinct, URLs).
    Trailing '.'/'..' segments leave a trailing SLASH ('/a/b/..' -> '/a/',
    '/a/.' -> '/a/'), exactly like the RFC algorithm — dropping it would
    resolve href '..' on page '/a/b/' to '/a' and miss a corpus page stored
    as '/a/'."""
    for _ in range(8):
        norm = F.regexp_replace(norm, r"/\.(?=/)", "")  # mid /./
        norm = F.regexp_replace(norm, r"/\.$", "/")  # trailing /.
        norm = F.regexp_replace(norm, r"/(?!\.\./)[^/]+/\.\.(?=/)", "")
        norm = F.regexp_replace(norm, r"/(?!\.\./)[^/]+/\.\.$", "/")
    return F.regexp_replace(norm, r"^(/\.\.)+(?=/|$)", "")  # clamp at root


def resolve_href_standard(
    page_url: Column | str, href: Column | str, parts: Column | None = None
) -> Column:
    """RFC 3986-style href resolution — the CrawlConfig(resolve_mode=
    "standard") alternative to the reference-parity quirk resolver above.

    The quirk resolver drops EVERY absolute href (':' check fires on the
    scheme), so a quirk-mode crawl can never leave its seed hosts — fine for
    reference parity, useless for an open-web frontier. This resolver keeps
    the web graph connected, pure JVM columns throughout:

      * absolute http(s):// hrefs     -> kept (fragment stripped; scheme
        matched case-insensitively per RFC 3986 and lowercased in the output;
        dot segments collapsed per §5.2.2, which applies remove_dot_segments
        even when the reference has its own scheme; empty path -> '/')
      * other schemes (mailto:, javascript:, ftp:, data:, tel:)  -> NULL
      * protocol-relative '//h/p'     -> page scheme + href (same
        normalization as absolute — §5.2.2 network-path branch)
      * root-relative '/p'            -> scheme + host(page) + href
      * query-only '?x=1'             -> page path with the new query
      * fragment-only / empty         -> NULL (same-document reference)
      * relative 'a/b'                -> against the page's base directory

    Dot segments ('/./', 'seg/../', leading '/../', trailing '.'/'..') are
    collapsed with a bounded 8-deep unroll (_collapse_dot_segments); the
    host keeps its port exactly like host_of (quirk O-X2), so seen-set
    hashing is consistent across both resolve modes.

    `parts` (resolve_base_parts output) skips re-deriving the page-URL
    pieces per call — REQUIRED for performance when resolving inside a HOF
    lambda (see resolve_base_parts; HOF bodies re-evaluate captured
    expressions per array element)."""
    u = _c(page_url)
    # HTML spec: strip ASCII whitespace around URLs before resolving —
    # F.trim only removes 0x20, but extracted hrefs can be wrapped in
    # tabs/newlines (href="\n/about"), which would otherwise be glued into
    # the path as literal control bytes
    h = F.substring_index(
        F.regexp_replace(_c(href), r"^\s+|\s+$", ""), "#", 1
    )
    # the PAGE host gets the same §6.2.2.1 case normalization as the
    # absolute branch below: a seed (or pre-upgrade frontier entry) with an
    # uppercase host would otherwise emit case-variant keys for every
    # relative/root-relative/query-only link while absolute inlinks to the
    # same pages emit lowercase — the exact duplicate-fetch split this
    # function exists to prevent. Lowercase after the last '@' (userinfo
    # keeps case, port digits are case-free). With `parts` the normalized
    # host comes PRECOMPUTED (struct field host_lc) so the HOF hot path
    # pays the regex chains once per row, not per href; the quirk resolver
    # keeps reading the case-preserving 'host' field.
    if parts is not None:
        proto, hostp = parts["proto"], parts["host_lc"]
        page_path, base_dir = parts["page_path"], parts["base_dir"]
    else:
        proto = protocol_of(u)
        hostp = _host_lc(host_of(u))
        page_path = F.substring_index(path_of(u), "?", 1)
        base_dir = F.when(page_path == "", F.lit("/")).otherwise(
            F.regexp_replace(page_path, "[^/]*$", "")
        )
    raw_path = F.when(h.startswith("/"), h).otherwise(F.concat(base_dir, h))
    pth = F.substring_index(raw_path, "?", 1)
    qry = F.when(
        raw_path.contains("?"),
        F.concat(F.lit("?"), F.substr(raw_path, F.instr(raw_path, "?") + 1)),
    ).otherwise(F.lit(""))
    norm = _collapse_dot_segments(pth)
    norm = F.when(norm == "", F.lit("/")).otherwise(norm)
    same_host = F.concat(proto, hostp, norm, qry)
    has_scheme = h.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:")
    # absolute/network-path references: lowercase the scheme (RFC 3986 §3.1,
    # schemes are case-insensitive — HTTP:// links must not drop), then
    # normalize the PATH too: §5.2.2 applies remove_dot_segments even when
    # R has its own scheme/authority, so http://h/a/../b and http://h/b must
    # land on ONE seen-set key, not two frontier entries fetched twice
    abs_lc = F.when(
        h.startswith("//"),
        F.concat(F.substring_index(proto, "//", 1), h),
    ).otherwise(
        F.when(
            h.rlike("^(?i)https?://"),
            F.concat(
                F.lower(F.substring_index(h, "://", 1)),
                F.lit("://"),
                h.substr(F.instr(h, "://") + F.lit(3), F.length(h)),
            ),
        )
    )
    # RFC 3986 §6.2.2.1: the HOST is case-insensitive too — lowercase it
    # (the authority after the last '@'; userinfo keeps case, like the
    # path). Without this, Example.COM/x and example.com/x are two frontier
    # keys: the seen-set anti-join misses and the page is fetched twice.
    a_auth = F.regexp_extract(abs_lc, r"^https?://([^/?#]*)", 1)
    a_sh = F.concat(
        F.regexp_extract(abs_lc, r"^(https?)://", 1),
        F.lit("://"),
        F.regexp_replace(a_auth, r"[^@]*$", ""),
        F.lower(F.regexp_extract(a_auth, r"([^@]*)$", 1)),
    )
    a_rest = F.regexp_replace(abs_lc, r"^https?://[^/?#]*", "")
    a_pth = F.substring_index(a_rest, "?", 1)
    a_qry = F.when(
        a_rest.contains("?"),
        F.concat(F.lit("?"), F.substr(a_rest, F.instr(a_rest, "?") + 1)),
    ).otherwise(F.lit(""))
    a_norm = _collapse_dot_segments(a_pth)
    # empty path -> '/' (RFC 3986 §6.2.3 safe normalization; keeps the
    # seen-set key identical to the same-host branch's output shape)
    a_norm = F.when(a_norm == "", F.lit("/")).otherwise(a_norm)
    abs_resolved = F.concat(a_sh, a_norm, a_qry)  # NULL-propagating
    return (
        F.when(h == "", F.lit(None).cast("string"))
        .when(h.startswith("//") | has_scheme, abs_resolved)
        .when(
            h.startswith("?"),
            F.concat(
                proto,
                hostp,
                F.when(page_path == "", F.lit("/")).otherwise(page_path),
                h,
            ),
        )
        .otherwise(same_host)
    )


# -- beyond the reference: frontier-scale URL canonicalization ---------------

# NOTE: bare 'ref' is deliberately NOT in the default scrub list (ADVICE r3):
# unlike utm_*/gclid it is content-bearing on many sites, and scrubbing it
# would false-merge genuinely distinct resources into one seen-set entry.
# Callers that know their corpus treats 'ref' as tracking pass a widened
# pattern via canonicalize_url(scrub_param_re=...).
TRACKING_PARAM_RE = r"^(utm_[^=&]*|gclid|fbclid|msclkid|mc_eid|ref_src)(=.*)?$"


def canonicalize_url(
    url: Column | str, scrub_param_re: str = TRACKING_PARAM_RE
) -> Column:
    """Crawl-frontier URL canonicalization (beyond the reference, which dedups
    on the verbatim string): collapses the common aliases of one resource so
    the seen-set anti-join treats them as one URL — at a 10^10-URL frontier
    the alias multiplicity (tracking params, host case, default ports,
    fragments, param order) is a direct multiplier on seen-set size and
    frontier shuffle width.

    Pure JVM Column expressions (string splits + higher-order array functions;
    whole-stage codegen, no Python). Steps, all RFC 3986 §6 safe
    normalizations plus the standard tracking-param scrub:

      1. trim; drop the #fragment
      2. lowercase the scheme and the host (userinfo and path keep case)
      3. drop default ports (http:80, https:443)
      4. empty path -> '/'
      5. drop tracking params (scrub_param_re — default utm_*, gclid,
         fbclid, msclkid, mc_eid, ref_src; bare 'ref' excluded, see
         TRACKING_PARAM_RE note), sort the survivors byte-wise, drop a
         now-empty '?'

    URLs without '://' are returned trimmed but otherwise untouched (the
    quirk-exact reference path never produces them; defensive for ingest).
    Percent-encoding case is NOT normalized (no per-match case mapping in
    JVM regex replace; %-aliases are rare enough to not pay a UDF for).
    """
    raw = F.trim(_c(url))
    u = F.substring_index(raw, "#", 1)  # fragment strip

    scheme = F.lower(F.substring_index(u, "://", 1))
    rest = F.substr(
        u, F.length(F.substring_index(u, "://", 1)) + F.lit(4), F.length(u)
    )
    # authority ends at the first '/' OR '?' (a query can follow the host
    # directly, e.g. http://host?a=1); remainder = path?query ('' if none)
    slash_pos = F.instr(rest, "/")
    q_pos = F.instr(rest, "?")
    cut = (
        F.when((slash_pos > 0) & ((q_pos == 0) | (slash_pos < q_pos)), slash_pos)
        .when(q_pos > 0, q_pos)
        .otherwise(F.lit(0))
    )
    authority = F.when(cut > 0, F.substr(rest, F.lit(1), cut - F.lit(1))).otherwise(rest)
    pathq = F.when(cut > 0, F.substr(rest, cut, F.length(rest))).otherwise(F.lit(""))

    # authority = [userinfo@]host[:port]; userinfo keeps case, host lowers.
    # The host starts after the LAST '@' (WHATWG — the userinfo-phishing
    # shape 'a@b@evil.com' must keep 'a@b@' as userinfo) and the port is
    # after the LAST ':' of the host-port part; both computed by suffix
    # length so multi-'@'/multi-':' authorities round-trip. IPv6 literals
    # ([::1]:8080) keep their bracketed form verbatim — ':' is not a port
    # separator inside brackets, so the port split keys on ']' for them.
    hostport = F.substring_index(authority, "@", -1)
    userinfo = F.when(
        authority.contains("@"),
        F.substr(authority, F.lit(1), F.length(authority) - F.length(hostport)),
    ).otherwise(F.lit(""))
    ipv6 = hostport.startswith("[")
    port = F.when(
        ipv6 & (F.substring_index(hostport, "]", -1).startswith(":")),
        F.substr(
            F.substring_index(hostport, "]", -1),
            F.lit(2),
            F.length(F.substring_index(hostport, "]", -1)),
        ),
    ).when(
        ~ipv6 & (F.instr(hostport, ":") > 0), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    host = F.when(
        ipv6, F.lower(F.concat(F.substring_index(hostport, "]", 1), F.lit("]")))
    ).when(
        F.instr(hostport, ":") > 0,
        F.lower(
            F.substr(
                hostport,
                F.lit(1),
                F.length(hostport) - F.length(port) - F.lit(1),
            )
        ),
    ).otherwise(F.lower(hostport))
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when((port == "") | default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )

    path = F.substring_index(pathq, "?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        F.instr(pathq, "?") > 0,
        F.substr(pathq, F.instr(pathq, "?") + F.lit(1), F.length(pathq)),
    ).otherwise(F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(scrub_param_re),
        )
    )
    query_part = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )

    canonical = F.concat(
        scheme, F.lit("://"), userinfo, host, port_part, path, query_part
    )
    return F.when(u.contains("://"), canonical).otherwise(raw)


# Two-level public suffixes for registered-domain (pay-level-domain)
# extraction — a representative subset of the Mozilla Public Suffix List's
# most common entries; production swaps in the full list (it is a few
# thousand entries, well inside broadcast-literal range).
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


def registered_domain(
    host: Column | str, two_level_suffixes: tuple[str, ...] = TWO_LEVEL_SUFFIXES
) -> Column:
    """Pay-level domain of a hostname: the label owned by a registrant.

    'a.b.example.com' -> 'example.com'; 'www.example.co.uk' ->
    'example.co.uk' (the trailing two labels are a public suffix, so the
    PLD takes three). Domain-level curation, quotas, and dedup key on the
    PLD, not the host — one registrant can mint unlimited subdomains, so
    any host-keyed budget is gameable at web scale.

    Pure JVM array ops: split on '.', slice the tail. Hosts that ARE a
    suffix (or a single label, or carry a port) pass through lowercased
    unchanged — ports belong to host_of's quirk domain, strip them first
    with canonicalize_url if needed.
    """
    h = F.lower(_c(host))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    sufs = F.array(*[F.lit(s) for s in two_level_suffixes])
    return (
        F.when(n <= 2, h)
        .when(F.array_contains(sufs, last2), F.when(n >= 3, last3).otherwise(h))
        .otherwise(last2)
    )


def path_of(url: Column | str) -> Column:
    """Everything after the authority ('' when the url ends at the host) —
    the path+query portion url-structure analytics operate on."""
    return F.regexp_replace(_c(url), r"^[a-z][a-z0-9+.-]*://[^/]*", "")


def path_depth(url: Column | str) -> Column:
    """Number of NON-EMPTY path segments after the authority, query and
    fragment stripped ('/a/b/c' -> 3, '/dir5/' -> 1, '/p?x=/y' -> 1,
    '' -> 0) — THE canonical depth metric shared by the trap signals
    (operators/traps.py) and the URL-structure profile; deep-path URLs
    correlate with calendar/faceted traps and get demoted by depth-aware
    frontier policies (the max_depth crawl knob's metric)."""
    # authority strip excludes '?'/'#' so a query directly after the host
    # ('http://h?a=/b') still yields depth 0 (path_of's '[^/]*' would not)
    p = F.regexp_replace(_c(url), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    p = F.substring_index(F.substring_index(p, "?", 1), "#", 1)
    return F.size(F.filter(F.split(p, "/"), lambda x: x != F.lit("")))
