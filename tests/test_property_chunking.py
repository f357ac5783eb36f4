"""Property-based differential tests for the training-data sequence ops:
chunk_documents and pack_token_spans (operators/chunking.py) vs the
independently written Python oracles from tests/test_chunking.py, over
randomized corpora (varied token counts incl. empty/NULL docs, non-dense
doc ids) and randomized (size, stride, seq_len) shapes.

Each hypothesis example is a BATCH (one corpus -> one Spark job per op);
shrinking still isolates a minimal failing corpus.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cis455crawler_spark.operators.chunking import chunk_documents, pack_token_spans

from .test_chunking import _py_chunks, _py_spans

_word = st.sampled_from(["alpha", "b2", "gamma", "x", "the", "a", "ZZ9"])
_text = st.one_of(
    st.none(),
    st.lists(_word, min_size=0, max_size=40).map(" ".join),
)
# non-dense, non-contiguous ids: the packing order/bucketing must not
# depend on density
_docs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5000), _text),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)
_shape = st.tuples(
    st.integers(min_value=1, max_value=12),  # size
    st.integers(min_value=1, max_value=12),  # stride (clamped <= size below)
    st.sampled_from([3, 7, 16, 64]),  # seq_len
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs, shape=_shape)
def test_chunk_and_pack_match_oracle_batched(spark, docs, shape):
    size, stride, seq_len = shape
    stride = min(stride, size)  # gapped windows are rejected by design
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got_chunks = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk)
        for r in chunk_documents(df, size=size, stride=stride).collect()
    )
    assert got_chunks == _py_chunks(docs, size, stride)

    got_spans = sorted(
        (r.doc_id, r.n_tokens, r.start, r.seq_id, r.seq_offset, r.tok_begin, r.span_len)
        for r in pack_token_spans(df, seq_len=seq_len).collect()
    )
    assert got_spans == _py_spans(docs, seq_len)
