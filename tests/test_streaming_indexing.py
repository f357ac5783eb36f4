"""Incremental inverted-index maintenance (streaming/indexing.py): the
maintained state must equal a batch rebuild after any sequence of
micro-batches, including a recrawl that changes a document wholesale, and
must survive a stop/restart through the stream checkpoint."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_incremental_index_matches_batch_rebuild(spark, tmp_path):
    from cis455crawler_spark.operators.indexer import postings
    from cis455crawler_spark.sources.tables import SnapshotStore
    from cis455crawler_spark.streaming.indexing import (
        STATS_TABLE,
        rank_from_stats,
        run_incremental_index,
    )

    inp = tmp_path / "pages"
    inp.mkdir()
    state = str(tmp_path / "state")

    docs1 = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "apple banana apple news today",
                "banana cherry report cherry cherry",
            ],
            "title": ["apple news", "cherry report"],
        }
    )
    docs2 = pd.DataFrame(
        {
            "doc_id": [3],
            "text": ["cherry apple archive story"],
            "title": ["archive"],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs1), str(inp / "b1.parquet"))
    pq.write_table(pa.Table.from_pandas(docs2), str(inp / "b2.parquet"))
    assert run_incremental_index(spark, str(inp), state) == 2

    # recrawl: doc 2 changes wholesale — its old terms must vanish; the
    # second run resumes from the stream checkpoint and sees ONLY the new file
    docs3 = pd.DataFrame(
        {
            "doc_id": [2],
            "text": ["banana banana fresh update"],
            "title": ["fresh update"],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs3), str(inp / "b3.parquet"))
    assert run_incremental_index(spark, str(inp), state) == 1

    final = pd.concat([docs1[docs1.doc_id != 2], docs2, docs3])
    batch = postings(spark.createDataFrame(final), title_col="title")
    inc = rank_from_stats(SnapshotStore(spark, state).read(STATS_TABLE))

    def snap(df):
        return {
            (r["doc_id"], r["word"]): (
                r["tf"], r["max_tf"], r["df"], r["is_title"], r["is_meta"],
                round(r["rank"], 9),
            )
            for r in df.collect()
        }

    b, i = snap(batch), snap(inc)
    assert b == i
    assert (2, "cherry") not in i  # stale terms of the recrawled doc purged
    assert i[(2, "fresh")][3] == 1  # new title token flagged is_title
