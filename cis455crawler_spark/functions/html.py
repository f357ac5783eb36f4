"""HTML column functions — Arrow-batched pandas UDFs for link & text
extraction over the ``html: binary`` column, plus JVM-side title extraction.

These are the ONLY pandas UDFs on the crawl hot path (per the design: no
per-row Python; everything else is built-in Column expressions). Both are
scalar Arrow UDFs: one Python invocation per ~10k-row Arrow batch, vectorized
inside with compiled regexes.

Reference behavior being re-expressed:
  * link extraction collects href of every <link> tag then every <a> tag, in
    document order (XPathCrawlerThread.java:293-353 via JTidy DOM)
  * text extraction is Jsoup's Document.text() — tags stripped, whitespace
    normalized (Extract/src/fetch/FetchDocs.java:200-204)
  * title is the substring between <title> and </title>
    (Extract/src/fetch/FetchDocs.java:98-99)
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# --- pure-python kernels (shared with the corpus generator so the fixture
# --- `text` column is byte-identical with the engine UDF output by build) ---

_TAG_LINK_OR_A = re.compile(rb"<(link|a)\b[^>]*>", re.IGNORECASE | re.DOTALL)
_HREF = re.compile(
    rb"""href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)
_SCRIPT = re.compile(rb"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE = re.compile(rb"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT = re.compile(rb"<!--.*?-->", re.DOTALL)
_ANYTAG = re.compile(rb"<[^>]+>")
_WS = re.compile(r"\s+")


def extract_hrefs_py(html_bytes: bytes | None) -> list[str]:
    """All href values of <link> tags (document order) then <a> tags
    (document order) — the reference's two getElementsByTagName passes."""
    if html_bytes is None:
        return []
    links: list[str] = []
    anchors: list[str] = []
    for m in _TAG_LINK_OR_A.finditer(html_bytes):
        hm = _HREF.search(m.group(0))
        if hm is None:
            continue
        val = next(g for g in hm.groups() if g is not None)
        target = links if m.group(1).lower() == b"link" else anchors
        target.append(val.decode("iso-8859-1"))
    return links + anchors


def extract_text_py(html_bytes: bytes | None) -> str | None:
    """Deterministic html→text: drop script/style/comments, strip tags,
    unescape entities, collapse whitespace (Jsoup .text() shape)."""
    if html_bytes is None:
        return None
    b = _SCRIPT.sub(b" ", html_bytes)
    b = _STYLE.sub(b" ", b)
    b = _COMMENT.sub(b" ", b)
    b = _ANYTAG.sub(b" ", b)
    s = _htmllib.unescape(b.decode("iso-8859-1"))
    return _WS.sub(" ", s).strip()


# --- Arrow-batched UDFs ---


@pandas_udf(T.ArrayType(T.StringType()))
def extract_hrefs_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_hrefs_py)


@pandas_udf(
    T.StructType(
        [
            T.StructField("hrefs", T.ArrayType(T.StringType())),
            T.StructField("text", T.StringType()),
        ]
    )
)
def parse_page_udf(html: pd.Series) -> pd.DataFrame:
    """hrefs + text in ONE Arrow pass — the html column (the widest column on
    the crawl path) crosses the JVM/Python boundary once, not twice."""
    return pd.DataFrame(
        {"hrefs": html.map(extract_hrefs_py), "text": html.map(extract_text_py)}
    )


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


# --- JVM-side helpers ---


def title_of(html_str: Column) -> Column:
    """First <title>…</title> payload (FetchDocs.java:98-99)."""
    return F.regexp_extract(html_str, r"(?s)<title>(.*?)</title>", 1)


def html_as_string(html_bin: Column | str) -> Column:
    """binary → string for JVM-side regex ops (fixtures are ASCII/latin-1)."""
    c = F.col(html_bin) if isinstance(html_bin, str) else html_bin
    return c.cast("string")
