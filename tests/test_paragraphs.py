"""Paragraph-level curation: CCNet corpus paragraph dedup, C4 within-doc
line dedup, NFC normalization — each against a pure-Python oracle."""

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from cis455crawler_spark.functions.text import collapse_whitespace, normalize_nfc
from cis455crawler_spark.operators.paragraphs import (
    dedup_lines_within_doc,
    explode_paragraphs,
    paragraph_dedup_stats,
)

DOCS = [
    # doc 0: boilerplate para shared with docs 1,2 + unique tail (7 tokens)
    (0, "cookie banner accept all now alpha beta"),
    (1, "cookie banner accept all now gamma delta epsilon zeta eta"),
    (2, "cookie banner accept all now cookie banner accept all now"),  # repeated within doc
    (3, "unique words only here nothing shared at all today friend"),
    (4, ""),  # empty text -> zero paragraphs, absent from outputs
    (5, "one two"),  # single partial paragraph
    (6, "  spaced   out   tokens with   extra    gaps here ok fine"),
]


def _py_paras(text, k=5):
    toks = [t for t in text.split(" ") if t]
    return [
        (i // k, " ".join(toks[i : i + k])) for i in range(0, len(toks), k)
    ]


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _docs_df(spark):
    return spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in DOCS]
    )


def test_explode_paragraphs_matches_python(spark):
    got = {
        (r.doc_id, r.para_idx): r.para
        for r in explode_paragraphs(_docs_df(spark)).collect()
    }
    want = {
        (d, i): p for d, t in DOCS for i, p in _py_paras(t)
    }
    assert got == want
    # trailing partial kept, empty doc absent
    assert (0, 1) in got and got[(0, 1)] == "alpha beta"
    assert not any(d == 4 for d, _ in got)


def test_paragraph_dedup_corpus_oracle(spark):
    paras = explode_paragraphs(_docs_df(spark))
    out = {
        r.doc_id: (r.n_para, r.n_kept, r.kept_md5)
        for r in paragraph_dedup_stats(paras, max_docs=2).collect()
    }
    # python oracle
    from collections import defaultdict

    df_count = defaultdict(set)
    per_doc = defaultdict(list)
    for d, t in DOCS:
        for i, p in _py_paras(t):
            df_count[p].add(d)
            per_doc[d].append((i, p))
    want = {}
    for d, plist in per_doc.items():
        kept = [p for _, p in sorted(plist) if len(df_count[p]) < 2]
        want[d] = (
            len(plist),
            len(kept),
            _md5("\n".join(kept)) if kept else None,
        )
    assert out == want
    # the shared boilerplate para is in 3 docs -> dropped from all of them
    assert out[0][1] == 1  # only "alpha beta" survives
    # doc 2 is ONLY the boilerplate (twice) -> fully dropped, NULL digest
    assert out[2] == (2, 0, None)


def test_line_dedup_within_doc(spark):
    paras = explode_paragraphs(_docs_df(spark))
    out = {
        r.doc_id: (r.n_para, r.n_uniq, r.kept_md5)
        for r in dedup_lines_within_doc(paras).collect()
    }
    # doc 2: same 5-token para twice -> first kept
    assert out[2] == (2, 1, _md5("cookie banner accept all now"))
    # docs without repeats keep everything in order
    assert out[1][0] == out[1][1] == 2
    assert out[1][2] == _md5(
        "cookie banner accept all now\ngamma delta epsilon zeta eta"
    )


def test_normalize_nfc_composes_and_collapses(spark):
    rows = [
        Row(i=0, s="Cafe\u0301  du\tMonde"),  # decomposed + messy spaces
        Row(i=1, s="Caf\u00e9 du Monde"),  # composed, already clean
        Row(i=2, s=None),
        Row(i=3, s="a\u030a ring"),  # a + combining ring -> U+00E5
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.i: r.n
        for r in df.select(
            "i", collapse_whitespace(normalize_nfc(F.col("s"))).alias("n")
        ).collect()
    }
    assert out[0] == out[1] == "Caf\u00e9 du Monde"
    assert out[2] is None
    assert out[3] == "\u00e5 ring"
    assert len(out[3]) == 6
