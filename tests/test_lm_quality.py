"""Bigram-LM quality score (operators/lm_quality.py) vs an independently
written Python oracle, plus a behavioral sanity check (fluent text scores
lower cross-entropy than shuffled-gibberish text from the same vocabulary).

Also keeps CUBE grouping-sets coverage (the former cube_counts driver entry,
folded out at the 50-entry gate in round 3) as a DuckDB-checked pytest.
"""

import math
import re
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from cis455crawler_spark.operators.lm_quality import bigram_lm_score


def _py_oracle(texts):
    """Independent reimplementation: add-one bigram LM cross-entropy with
    micro-nat quantization before the per-doc sum (same contract as the
    operator docstring, written from the formula, not the Spark code)."""
    toks = {i: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t] for i, s in texts.items()}
    bigrams = {i: list(zip(ts, ts[1:])) for i, ts in toks.items()}
    bc = Counter(b for bs in bigrams.values() for b in bs)
    cc = Counter(b[0] for bs in bigrams.values() for b in bs)
    vocab = len({t for ts in toks.values() for t in ts})
    out = {}
    for i, bs in bigrams.items():
        if not bs:
            continue
        micro = [
            # round-half-up like Spark/DuckDB ROUND on positive values
            math.floor(-math.log((bc[b] + 1.0) / (cc[b[0]] + 1.0 * vocab)) * 1e6 + 0.5)
            for b in bs
        ]
        out[i] = (len(bs), round(sum(micro) / 1e6 / len(bs), 6))
    return out


def test_bigram_lm_matches_python_oracle(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox naps under the warm sun",
        3: "fox the under brown naps dog quick sun the jumps",  # shuffled
        4: "one",  # single token -> no row
        5: "",  # empty -> no row
        6: "the quick brown fox jumps over the lazy dog",  # exact dup of 1
    }
    docs = spark.createDataFrame(
        [(i, s) for i, s in texts.items()], "doc_id INT, text STRING"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["xent"])
        for r in bigram_lm_score(docs).collect()
    }
    assert got == _py_oracle(texts)
    assert 4 not in got and 5 not in got


def test_fluent_beats_gibberish(spark):
    # 20 fluent docs sharing bigram structure + 1 shuffled doc: the shuffled
    # doc's bigrams are rare under the corpus LM -> strictly higher xent.
    fluent = ["the cat sat on the mat and the dog sat on the rug"] * 20
    gibberish = "mat the on dog and rug cat the sat on the sat mat"
    rows = [(i, t) for i, t in enumerate(fluent)] + [(99, gibberish)]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    res = {r["doc_id"]: r["xent"] for r in bigram_lm_score(docs).collect()}
    assert res[99] > res[0]


def test_cube_counts_matches_duckdb(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total_cents",
        )
        .orderBy("status", "priority")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')"
    )
    want = con.execute(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority
        """
    ).df()
    assert got["status"].tolist() == want["status"].tolist()
    assert got["priority"].tolist() == want["priority"].tolist()
    assert got["n"].astype("int64").tolist() == want["n"].astype("int64").tolist()
    assert (
        got["total_cents"].astype("int64").tolist()
        == want["total_cents"].astype("int64").tolist()
    )
