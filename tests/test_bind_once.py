"""bind_once regression guards (functions/text.py).

HOF lambda bodies are evaluated per array element with no subexpression
elimination, so an expensive expression CAPTURED inside a lambda re-runs
per element — the O(n^2) shingles(tokenize(text)) trap fixed in round 5.
bind_once(expr, fn) = element_at(transform(array(expr), fn), 1) forces one
evaluation per row.

The structural proxy tested here: in the ANALYZED plan string, an unbound
capture duplicates the captured expression's tree at every reference site,
while bind_once leaves exactly ONE copy (the array(expr) argument) and
lambda-variable references elsewhere. Counting occurrences of the token-
split regex in the plan text therefore distinguishes the two shapes
without timing anything.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cis455crawler_spark.functions.text import (
    _TOKEN_SPLIT,
    bind_once,
    dup_line_fraction,
    dup_ngram_fraction,
    shingles,
    tokenize,
    top_ngram_fraction,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def _count_tokenize(df) -> int:
    return _plan(df).count(_TOKEN_SPLIT)


def test_bind_once_evaluates_expr_once_in_plan(spark):
    df = spark.createDataFrame([("a b c d e",)], ["text"])

    # unbound control: reference the tokenize tree at two sites -> 2 copies
    toks = tokenize(F.col("text"))
    unbound = df.select((F.size(toks) + F.size(toks)).alias("x"))
    assert _count_tokenize(unbound) == 2

    bound = df.select(
        bind_once(tokenize(F.col("text")), lambda t: F.size(t) + F.size(t)).alias("x")
    )
    assert _count_tokenize(bound) == 1


def test_shingles_binds_token_argument_once(spark):
    df = spark.createDataFrame([("a b c d e",)], ["text"])
    out = df.select(shingles(tokenize(F.col("text")), 2).alias("g"))
    # one tokenize for the binding; the per-window slice lambda must
    # reference the lambda variable, not re-tokenize
    assert _count_tokenize(out) == 1
    rows = out.collect()
    assert rows[0]["g"] == ["a b", "b c", "c d", "d e"]


def test_quality_signals_bind_once(spark):
    df = spark.createDataFrame([("x y x y x y",)], ["text"])
    for fn, n_expected in [
        (lambda c: top_ngram_fraction(c, 2), 1),
        (lambda c: dup_ngram_fraction(c, 3), 1),
    ]:
        out = df.select(fn(F.col("text")).alias("v"))
        assert _count_tokenize(out) == n_expected, _plan(out)[:500]

    # dup_line_fraction has no tokenize; its line-split array must appear
    # once (bound), not once per reference in the fraction arithmetic
    out = df.select(dup_line_fraction(F.col("text")).alias("v"))
    assert _plan(out).count(r"split(text") <= 1


def test_bind_once_preserves_values(spark):
    df = spark.createDataFrame([("the the the",), ("",), ("a",)], ["text"])
    rows = (
        df.select(
            top_ngram_fraction(F.col("text"), 2).alias("top2"),
            dup_ngram_fraction(F.col("text"), 1).alias("dup1"),
        )
        .collect()
    )
    # "the the the": bigrams = [the the, the the] -> top2 = 1.0;
    # unigrams 3 occurrences 1 distinct -> dup1 = 2/3
    assert rows[0]["top2"] == 1.0
    assert abs(rows[0]["dup1"] - 2 / 3) < 1e-9
    # empty doc: both 0.0 by contract, no division error
    assert rows[1]["top2"] == 0.0 and rows[1]["dup1"] == 0.0
    # "a": one token, below the bigram floor (size < n) -> 0.0; its single
    # unigram occurrence has no repeats -> 0.0
    assert rows[2]["top2"] == 0.0 and rows[2]["dup1"] == 0.0


def test_resolve_standard_parts_bind_once(spark):
    """The crawl parse path resolves hundreds of hrefs per page inside
    F.transform; the page-URL parts (proto/host/base_dir regex chains) must
    bind ONCE per row, not re-derive per element. Structural proxy: the
    host_of port-keeping regex appears once in the analyzed plan when parts
    are bound via bind_once + resolve_base_parts, and once PER REFERENCE
    SITE when resolve derives them inline inside the lambda."""
    from cis455crawler_spark.functions.text import bind_once
    from cis455crawler_spark.functions.urls import (
        resolve_base_parts,
        resolve_href_standard,
    )

    df = spark.createDataFrame(
        [("http://h.test/a/b.html", ["x.html", "../y.html", "/z.html"])],
        ["url", "hrefs"],
    )
    unbound = df.select(
        F.transform(
            F.col("hrefs"), lambda h: resolve_href_standard(F.col("url"), h)
        ).alias("r")
    )
    bound = df.select(
        bind_once(
            resolve_base_parts(F.col("url")),
            lambda rb: F.transform(
                F.col("hrefs"),
                lambda h: resolve_href_standard(F.col("url"), h, parts=rb),
            ),
        ).alias("r")
    )
    # host_of's authority-extraction appears in proto/host/page_path/base_dir
    # derivations: > 1 copy inline, exactly 1 via the bound struct
    marker = "://"  # substring of the protocol/host regexes
    n_unbound = _plan(unbound).count(marker)
    n_bound = _plan(bound).count(marker)
    assert n_bound < n_unbound, (n_bound, n_unbound)
    # value parity between the two shapes
    assert unbound.collect()[0]["r"] == bound.collect()[0]["r"]
