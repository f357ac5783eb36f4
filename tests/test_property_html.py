"""Property-based differential tests for the HTML kernels (pure Python, no
Spark): the engine's link extractor (functions/html.py, used inside the
Arrow UDF) vs the independently written oracle extractor (tests/oracle.py),
over randomized tag soup; plus invariants of the text extractor."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cis455crawler_spark.functions.html import extract_hrefs_py, extract_text_py

from .oracle import o_extract_hrefs

_href_vals = st.sampled_from(
    ["p1.html", "dir/", "http://abs.test/x", "mailto:a@b", "javascript:void(0)",
     "sec#frag", "a b", ""]
)
_quote = st.sampled_from(['"{}"', "'{}'", "{}"])


def _tag(kind: str, href: str | None, quote: str) -> str:
    if href is None:
        return f"<{kind} rel=x>"
    return f'<{kind} href={quote.format(href)}>text</{kind}>'


_fragment = st.one_of(
    st.tuples(st.sampled_from(["a", "link", "A", "LINK"]),
              st.one_of(st.none(), _href_vals), _quote).map(lambda t: _tag(*t)),
    st.sampled_from(["<p>plain</p>", "<script>var x='<a href=q.html>';</script>",
                     "word soup & entities &amp;", "<div class=x>", ""]),
)

_doc = st.lists(_fragment, max_size=10).map(lambda xs: ("<html><body>" + " ".join(xs) + "</body></html>").encode())


@settings(max_examples=300, deadline=None)
@given(html=_doc)
def test_href_extraction_matches_oracle(html: bytes):
    assert extract_hrefs_py(html) == o_extract_hrefs(html), html


@settings(max_examples=300, deadline=None)
@given(html=_doc)
def test_text_extraction_invariants(html: bytes):
    text = extract_text_py(html)
    # no markup survives, whitespace is collapsed, output is stable under
    # re-extraction (idempotence on tag-free input)
    assert "<" not in text and ">" not in text
    assert "  " not in text
    assert text == text.strip()
    again = extract_text_py(text.encode("iso-8859-1"))
    assert again == text


# --- meta line scan: bytes-level fast path vs decode+splitlines ---

_meta_piece = st.sampled_from(
    [b"<meta", b' name="description"', b' name="Description"', b' name="Keywords"',
     b' name="keywords"', b' content="a,b c"', b' Content="X,Y">', b"content=",
     b"\n", b"\r\n", b"\r", b"\x85", b"\x0b", b"\x0c", b"\x1c", b"\x1d", b"\x1e",
     b"plain text ", b"<met", b"a>", b"<meta><meta>", b"\xff\xfe\x80", b"<p>x</p>"]
)
_meta_doc = st.lists(_meta_piece, max_size=14).map(b"".join)


def _oracle_meta_lines(hb: bytes) -> list[str]:
    return [l for l in hb.decode("iso-8859-1").splitlines() if "<meta" in l]


@settings(max_examples=500, deadline=None)
@given(html=_meta_doc)
def test_meta_line_scan_matches_splitlines(html: bytes):
    """_iter_meta_lines (the no-full-decode fast path inside extract_meta_py)
    must yield exactly the splitlines elements containing '<meta', in order —
    including under \r\n pairs, bare \r, and the exotic str.splitlines
    boundaries reachable from iso-8859-1 (\x85, \x0b..\x1e)."""
    from cis455crawler_spark.functions.html import _iter_meta_lines

    assert list(_iter_meta_lines(html)) == _oracle_meta_lines(html), html
