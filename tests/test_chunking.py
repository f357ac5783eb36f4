"""Token chunking and GPT-style sequence packing vs Python oracles.

The oracles are written from the op definitions (sliding windows; concat-and-
cut-every-L), not from the Spark code; packing is additionally checked for
its global invariants (spans tile each doc exactly; every sequence except the
last is exactly full).
"""

from __future__ import annotations

import re

from cis455crawler_spark.operators.chunking import chunk_documents, pack_token_spans

DOCS = [
    (1, "a b c d e f g h i j"),  # 10 tokens
    (2, "one two three"),  # 3
    (3, ""),  # 0 -> no chunks, no spans
    (4, None),  # NULL -> same
    (5, "x " * 7),  # 7
    (70, "tail doc with some more tokens here"),  # 7, lands in bucket 1
]


def _toks(t):
    return [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]


def _py_chunks(rows, size, stride):
    out = []
    for d, t in rows:
        tk = _toks(t)
        if not tk:
            continue
        i, cid = 0, 0
        while True:
            w = tk[i : i + size]
            out.append((d, cid, len(w), " ".join(w)))
            if i + size >= len(tk):
                break
            i += stride
            cid += 1
    return sorted(out)


def _py_spans(rows, seq_len):
    out = []
    start = 0
    for d, t in sorted(rows):
        n = len(_toks(t))
        if n == 0:
            continue
        for seq in range(start // seq_len, (start + n - 1) // seq_len + 1):
            b = max(start, seq * seq_len)
            e = min(start + n, (seq + 1) * seq_len)
            out.append((d, n, start, seq, b - seq * seq_len, b - start + 1, e - b))
        start += n
    return sorted(out)


def test_chunk_documents_matches_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    for size, stride in [(4, 3), (4, 4), (3, 1), (100, 50)]:
        got = sorted(
            (r.doc_id, r.chunk_id, r.n_tokens, r.chunk)
            for r in chunk_documents(df, size=size, stride=stride).collect()
        )
        assert got == _py_chunks(DOCS, size, stride), (size, stride)


def test_chunk_documents_rejects_gapped_windows(spark):
    import pytest as _pytest

    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, size=2, stride=5)
    with _pytest.raises(ValueError):
        chunk_documents(df, size=0, stride=1)


def test_chunk_documents_empty_doc_yields_nothing(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = chunk_documents(df, size=4, stride=2)
    assert got.filter("doc_id in (3, 4)").count() == 0


def test_pack_token_spans_matches_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    for seq_len in [4, 8, 64]:
        got = sorted(
            (r.doc_id, r.n_tokens, r.start, r.seq_id, r.seq_offset, r.tok_begin, r.span_len)
            for r in pack_token_spans(df, seq_len=seq_len).collect()
        )
        assert got == _py_spans(DOCS, seq_len), seq_len


def test_pack_token_spans_global_invariants(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    seq_len = 8
    rows = pack_token_spans(df, seq_len=seq_len).collect()
    # spans tile each doc exactly: per-doc span_len sums to n_tokens
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, [0, r.n_tokens])
        per_doc[r.doc_id][0] += r.span_len
    assert all(got == n for got, n in per_doc.values())
    # every sequence except the last is exactly full
    per_seq: dict = {}
    for r in rows:
        per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.span_len
    last = max(per_seq)
    assert all(v == seq_len for s, v in per_seq.items() if s != last)
    assert 0 < per_seq[last] <= seq_len
    # bucket choice cannot change the result: a coarser monotone bucketing
    # yields identical placements
    from pyspark.sql import functions as F

    alt = {
        (r.doc_id, r.start)
        for r in pack_token_spans(
            df, seq_len=seq_len, bucket_col=(F.col("doc_id") / 3).cast("long")
        ).collect()
    }
    assert alt == {(r.doc_id, r.start) for r in rows}
