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
