"""Single-process Python oracle for the crawl semantics (SURVEY.md §5).

Independent re-implementation of the reference's *logical* behavior
(/root/reference/Crawler/src/com/datformers/crawler/XPathCrawlerThread.java)
used as ground truth for the Spark engine:

  * quirk link resolution + absolute-href rejection (:301-352)
  * robots filter with deny-by-default / '*'-stops-scan / substring matching
    (:436-491), denied URLs enter the seen set
  * crawl-delay via lowercase-agent quirk (DomainRules.java:20-22)
  * BFS rounds with per-host budget max(1, floor(duration/delay)), within-
    round order = url ascending (the rebuild's canonical determinization)
  * fetch-path routing in the reference's check order (:148-253):
    301/302 -> mark url AND Location seen, enqueue neither; 304 (recrawl,
    warc_ts unchanged) -> reuse stored links; MIME substring allowlist;
    Content-Length <= max size; only then parse (writeToDB)
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass, field

_TAG = re.compile(r"<(link|a)\b[^>]*>", re.IGNORECASE | re.DOTALL)
_HREF = re.compile(r"""href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE)


def o_host(url: str) -> str:
    h = url
    if url.startswith("http"):
        h = url[url.index("/") + 2 :]
    if "/" in h:
        h = h[: h.index("/")]
    return h


def o_sha1(url: str) -> str:
    return hashlib.sha1(url.encode("iso-8859-1")).hexdigest()


# --- fetch-path metadata derivation (functions/fetch.py, same md5 scheme) ---

ALLOWED_MIME = (
    "text/html", "text/xml", "application/xml", "application/atom+xml",
    "application/dash+xml", "application/rdf+xml", "application/rss+xml",
    "application/soap+xml", "application/xhtml+xml", "application/xop+xml",
    "application/smil+xml", "image/svg+xml", "message/imdn+xml",
    "model/x3d+xml", "application/vnd.mozilla.xul+xml",
    "application/vnd.google-earth.kml+xml",
)

MAX_CONTENT_BYTES = 5 * 1024 * 1024


def o_md5(url: str) -> str:
    return hashlib.md5(url.encode("iso-8859-1")).hexdigest()


def o_status(url: str) -> int:
    c = o_md5(url)[0]
    return 301 if c == "0" else 302 if c == "1" else 200


def o_content_type(url: str) -> str:
    c = o_md5(url)[1]
    if c == "0":
        return "application/pdf"
    if c == "1":
        return "image/png"
    if c == "2":
        return "text/plain; charset=utf-8"
    return "text/html; charset=UTF-8"


def o_location(url: str) -> str:
    return "http://" + o_host(url) + "/p0.html"


def o_mime_allowed(content_type: str) -> bool:
    ct = content_type.lower()
    return any(t in ct for t in ALLOWED_MIME)


def o_extract_hrefs(html: bytes) -> list[str]:
    s = html.decode("iso-8859-1")
    link, a = [], []
    for m in _TAG.finditer(s):
        hm = _HREF.search(m.group(0))
        if not hm:
            continue
        v = next(g for g in hm.groups() if g is not None)
        (link if m.group(1).lower() == "link" else a).append(v)
    return link + a


def o_resolve(page_url: str, href: str) -> str | None:
    if href.startswith("http"):
        if ":" in href or "#" in href or "javascript" in href.lower():
            return None
        return href
    proto = "https://" if page_url.startswith("https") else "http://"
    if page_url.endswith(".html") or page_url.endswith(".htm"):
        return proto + o_host(page_url) + "/" + href
    if page_url.endswith("/"):
        return page_url + href
    return page_url + "/" + href


def o_path_depth(url: str) -> int:
    """Mirror of functions/urls.path_depth: non-empty path segments,
    query/fragment stripped."""
    path = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "", url)
    path = path.split("?", 1)[0].split("#", 1)[0]
    return len([s for s in path.split("/") if s])


def _o_collapse_dots(norm: str) -> str:
    """Mirror of functions/urls._collapse_dot_segments (RFC 3986 §5.2.4,
    bounded 8-deep; trailing '.'/'..' leave a trailing slash)."""
    for _ in range(8):
        norm = re.sub(r"/\.(?=/)", "", norm)
        norm = re.sub(r"/\.$", "/", norm)
        norm = re.sub(r"/(?!\.\./)[^/]+/\.\.(?=/)", "", norm)
        norm = re.sub(r"/(?!\.\./)[^/]+/\.\.$", "/", norm)
    return re.sub(r"^(/\.\.)+(?=/|$)", "", norm)


def o_resolve_standard(page_url: str, href: str) -> str | None:
    """Mirror of functions/urls.resolve_href_standard (RFC 3986-style),
    same branch order and the same bounded dot-segment unroll — including
    §5.2.2's remove_dot_segments on absolute/protocol-relative references
    and the empty-path -> '/' safe normalization."""
    # Java \s set (HTML-spec ASCII whitespace), NOT Python's unicode strip
    h = href.strip(" \t\n\x0b\f\r").split("#", 1)[0]
    if h == "":
        return None
    proto = "https://" if page_url.startswith("https") else "http://"
    host = o_host(page_url)
    # page-host case normalization, mirroring resolve_href_standard (RFC
    # 3986 §6.2.2.1: lowercase after the last '@'; userinfo keeps case)
    i = host.rfind("@")
    host = host[: i + 1] + host[i + 1 :].lower()

    def _abs(a: str) -> str:
        sh = re.match(r"^https?://[^/?#]*", a).group(0)
        rest = a[len(sh):]
        # RFC 3986 §6.2.2.1 host-case normalization (after the last '@';
        # userinfo keeps case) — mirrors resolve_href_standard
        scheme, auth = sh.split("://", 1)
        i = auth.rfind("@")
        sh = scheme + "://" + auth[: i + 1] + auth[i + 1 :].lower()
        pth = rest.split("?", 1)[0]
        qry = ("?" + rest.split("?", 1)[1]) if "?" in rest else ""
        n = _o_collapse_dots(pth)
        return sh + (n if n else "/") + qry

    if h.startswith("//"):
        return _abs(proto.split("//")[0] + h)
    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", h):
        m = re.match(r"^https?://", h, re.IGNORECASE)
        return _abs(h[: m.end() - 3].lower() + h[m.end() - 3 :]) if m else None
    page_path = re.sub(r"^[a-z][a-z0-9+.-]*://[^/]*", "", page_url).split("?", 1)[0]
    if h.startswith("?"):
        return proto + host + (page_path if page_path else "/") + h
    base_dir = "/" if page_path == "" else re.sub(r"[^/]*$", "", page_path)
    raw = h if h.startswith("/") else base_dir + h
    pth = raw.split("?", 1)[0]
    qry = ("?" + raw.split("?", 1)[1]) if "?" in raw else ""
    norm = _o_collapse_dots(pth)
    if norm == "":
        norm = "/"
    return proto + host + norm + qry


def o_parse_robots(body: str) -> dict:
    disallow: dict = {}
    delays: dict = {}
    agent = None
    for line in body.splitlines():
        if ":" not in line:
            continue
        f = line.split(":")
        key, val = f[0].strip(), (f[1].strip() if len(f) > 1 else "")
        kl = key.lower()
        if kl == "disallow":
            disallow.setdefault(agent, []).append(val)
        elif kl == "user-agent":
            agent = val
        elif kl == "crawl-delay":
            try:
                delays[agent] = int(val)
            except ValueError:
                pass
    return {"disallow": disallow, "delays": delays}


def o_allowed(url: str, robots: dict | None) -> bool:
    if robots is None:
        return True
    d = robots["disallow"]
    rules = d.get("cis455Crawler", d.get("*"))
    if not rules:
        return False  # deny-by-default quirk
    if rules[0].lower() == "/":
        return False
    for r in rules:
        if "*" in r:
            break
        if r in url:
            return False
    return True


def o_delay(robots: dict | None) -> int:
    if robots is None:
        return 0
    delays = robots["delays"]
    d = delays.get("cis455crawler", 0)  # lowercase-key quirk
    if d <= 0:
        d = delays.get("*", 0)
    return max(d, 0)


@dataclass
class OracleResult:
    seen: set[str] = field(default_factory=set)
    frontiers: list[set[str]] = field(default_factory=list)  # candidate set per round
    scheduled_rounds: list[set[str]] = field(default_factory=list)
    edges: list[tuple[str, str]] = field(default_factory=list)
    text: dict[str, str] = field(default_factory=dict)
    metrics: list[dict] = field(default_factory=list)
    docs: dict[str, list[str]] = field(default_factory=dict)  # parsed url -> links


def oracle_crawl(
    pages: dict[str, bytes],
    seeds: list[str],
    max_rounds: int = 50,
    max_pages: int = 100_000,
    round_duration_s: int = 60,
    max_content_bytes: int = MAX_CONTENT_BYTES,
    stored: dict[str, tuple] | None = None,  # url -> (warc_ts, links): prior gen
    pages_ts: dict | None = None,  # url -> warc_ts of the current corpus
    allowed_fn=None,  # (url, raw_robots_body|None) -> bool; None = quirk o_allowed
    max_urls_per_host: int | None = None,  # per-host admission quota
    content_dedup: bool = False,  # Mercator content-seen test (engine opt-in)
    follow_redirects: bool = False,  # Location as discovered link (engine opt-in)
    max_depth: int | None = None,  # BFS depth cap (engine opt-in)
    resolve_fn=None,  # (page_url, href) -> url|None; None = quirk o_resolve
    trap_filter: bool = False,  # Mercator trap containment (engine opt-in)
    trap_ratio_threshold: float = 5.0,
    trap_depth_threshold: int = 12,
    soft404_urls: set | None = None,  # ground-truth soft-404 urls -> demotion on
    soft404_min_pages: int = 3,
    soft404_rate_threshold: float = 0.5,
) -> OracleResult:
    robots_by_host: dict[str, dict] = {}
    raw_robots_by_host: dict[str, str] = {}
    for url, html in pages.items():
        if url.endswith("/robots.txt"):
            body = html.decode("iso-8859-1")
            robots_by_host[o_host(url)] = o_parse_robots(body)
            raw_robots_by_host[o_host(url)] = body

    res = OracleResult()
    frontier: dict[str, int] = {u: 0 for u in seeds}
    total_sched = 0
    seen_hosts: dict[str, int] = {}  # per-host seen-set size (quota gate)
    content_seen: set[str] = set()  # body digests (content_dedup mode)
    _resolve = resolve_fn or o_resolve
    trap_log: list[tuple[str, str]] = []  # (url, body digest) per parse
    s404_pages: dict[str, int] = {}  # per-host parsed-page count
    s404_hits: dict[str, int] = {}  # per-host soft-404 verdicts

    def _mark_seen(u: str) -> None:
        h = o_sha1(u)
        if h not in res.seen:
            res.seen.add(h)
            seen_hosts[o_host(u)] = seen_hosts.get(o_host(u), 0) + 1
    for round_no in range(1, max_rounds + 1):
        if not frontier or total_sched >= max_pages:
            break
        cand = {u: d for u, d in frontier.items() if o_sha1(u) not in res.seen}
        res.frontiers.append(set(frontier))
        urls_in = len(frontier)

        # trap containment: hosts whose accumulated (url, digest) log shows
        # the infinite-URL/finite-content ratio or absurd depth stop
        # admitting candidates (engine: trap gate before quota, drops are
        # NOT marked seen)
        if trap_filter and trap_log:
            by_h: dict[str, tuple[set, set, int]] = {}
            for u, dig in trap_log:
                urls, digs, md = by_h.setdefault(o_host(u), (set(), set(), 0))
                urls.add(u)
                digs.add(dig)
            flagged_traps = set()
            for h, (urls, digs, _) in by_h.items():
                maxd = max(o_path_depth(u) for u in urls)
                if (
                    len(urls) / len(digs) >= trap_ratio_threshold
                    or maxd >= trap_depth_threshold
                ):
                    flagged_traps.add(h)
            cand = {u: d for u, d in cand.items() if o_host(u) not in flagged_traps}

        # per-host admission quota: remaining = cap - host's seen-set size at
        # round start; first `remaining` candidates per host in url order
        # admitted, rest dropped permanently (engine's quota gate)
        if max_urls_per_host is not None:
            admitted_now: dict[str, int] = {}
            kept = {}
            for u in sorted(cand):
                h = o_host(u)
                used = seen_hosts.get(h, 0) + admitted_now.get(h, 0)
                if used < max_urls_per_host:
                    admitted_now[h] = admitted_now.get(h, 0) + 1
                    kept[u] = cand[u]
            cand = kept

        denied, by_host = [], {}
        for u in sorted(cand):
            rb = robots_by_host.get(o_host(u))
            ok = (
                allowed_fn(u, raw_robots_by_host.get(o_host(u)))
                if allowed_fn is not None
                else o_allowed(u, rb)
            )
            if ok:
                by_host.setdefault(o_host(u), []).append(u)
            else:
                denied.append(u)
        scheduled, deferred = [], []
        for host, urls in by_host.items():
            delay = o_delay(robots_by_host.get(host))
            budget = max(1, round_duration_s // delay) if delay > 0 else math.inf
            # soft-404 demotion: flagged hosts clamp to 1 url/round
            if (
                soft404_urls is not None
                and s404_pages.get(host, 0) >= soft404_min_pages
                and s404_hits.get(host, 0) / s404_pages[host]
                >= soft404_rate_threshold
            ):
                budget = 1
            urls.sort()
            for i, u in enumerate(urls):
                (scheduled if i < budget else deferred).append(u)

        for u in denied + scheduled:
            _mark_seen(u)
        res.scheduled_rounds.append(set(scheduled))
        total_sched += len(scheduled)

        # fetch-path routing pass (reference check order, :148-253); redirect
        # Locations land in seen FIRST — round-granular, they block this
        # round's discovered links just like scheduled/denied urls do
        actions: dict[str, str] = {}
        hits = redirects = notmod = mime_rej = size_rej = parsed_n = 0
        for u in scheduled:
            html = pages.get(u)
            if html is None:
                actions[u] = "miss"
                continue
            hits += 1
            st = o_status(u)
            if st in (301, 302):
                actions[u] = "redirect"
                redirects += 1
                if not follow_redirects:
                    _mark_seen(o_location(u))
            elif (
                stored is not None
                and u in stored
                and pages_ts is not None
                and pages_ts[u] <= stored[u][0]
            ):
                actions[u] = "not_modified"
                notmod += 1
            elif not o_mime_allowed(o_content_type(u)):
                actions[u] = "mime_reject"
                mime_rej += 1
            elif len(html) > max_content_bytes:
                actions[u] = "size_reject"
                size_rej += 1
            else:
                actions[u] = "parse"

        # content-seen pass (engine's window orders by url ascending, so the
        # smallest URL claims a digest within the round; known digests from
        # earlier rounds dup immediately)
        content_dup_n = 0
        if content_dedup:
            for u in sorted(u for u, a in actions.items() if a == "parse"):
                dig = hashlib.md5(pages[u]).hexdigest()
                if dig in content_seen:
                    actions[u] = "content_dup"
                    content_dup_n += 1
                else:
                    content_seen.add(dig)
        parsed_n = sum(1 for a in actions.values() if a == "parse")

        # evidence logs (engine: trap_log / soft404_log appends at commit).
        # trap evidence includes content_dup rows — parse-routed bodies whose
        # digest was already claimed are exactly the infinite-URL/finite-
        # content signal; logging only the claim winners would pin the ratio
        # at ~1 whenever content_dedup is on and the trigger could never fire
        for u, a in actions.items():
            if a not in ("parse", "content_dup"):
                continue
            if trap_filter:
                trap_log.append((u, hashlib.md5(pages[u]).hexdigest()))
            if a != "parse":
                continue
            if soft404_urls is not None:
                h = o_host(u)
                s404_pages[h] = s404_pages.get(h, 0) + 1
                if u in soft404_urls:
                    s404_hits[h] = s404_hits.get(h, 0) + 1

        new_links: dict[str, int] = {}
        for u in scheduled:
            act = actions[u]
            if act == "parse":
                links = []
                for href in o_extract_hrefs(pages[u]):
                    dst = _resolve(u, href)
                    if dst is not None:
                        links.append(dst)
                res.docs[u] = links
                for dst in links:
                    res.edges.append((u, dst))
            elif act == "not_modified":
                links = stored[u][1]
            elif act == "redirect" and follow_redirects:
                links = [o_location(u)]  # Location = one more discovered link
            else:
                continue
            for dst in links:
                d = cand[u] + 1
                # engine filters per-MENTION before the min-depth groupBy, and
                # keeps the MIN depth across parents (crawl.py link_stream +
                # agg(F.min)) — first-parent-wins would diverge on diamonds
                if max_depth is not None and d > max_depth:
                    continue
                if o_sha1(dst) not in res.seen:
                    new_links[dst] = min(new_links.get(dst, d), d)

        frontier = dict(new_links)
        for u in deferred:
            # next round's frontier groupBy min-merges deferred rows with
            # fresh link mentions of the same url
            frontier[u] = min(frontier.get(u, cand[u]), cand[u])
        res.metrics.append(
            {
                "round": round_no,
                "urls_in": urls_in,
                "robots_denied": len(denied),
                "politeness_deferred": len(deferred),
                "scheduled": len(scheduled),
                "fetch_hits": hits,
                "parsed_pages": parsed_n,
                "redirects": redirects,
                "not_modified": notmod,
                "mime_rejected": mime_rej,
                "size_rejected": size_rej,
                **({"content_dup": content_dup_n} if content_dedup else {}),
            }
        )
    return res
