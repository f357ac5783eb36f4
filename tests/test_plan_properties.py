"""Plan-property regression guard: the scale properties PLANS.md documents
(no cartesian products, no row-at-a-time Python, broadcasts where expected)
asserted as tests over the headline queries' physical plans — a perf
regression that flips a broadcast to a shuffle-of-the-big-side or sneaks a
BatchEvalPython into a hot path fails CI, not just the next manual audit."""

import pytest

# lazy-plannable entries only (no eager jobs during planning): iterative /
# streaming / driver-collecting entries are audited by tools/explain_audit.py
LAZY_ENTRIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "seen_anti_join",
    "host_budget_window",
    "robots_substring_filter",
    "tfidf_postings",
    "term_search_top100",
    "meta_title_rank",
    "dedup_exact_docs",
    "asof_last_click",
    "window_suite_orders",
    "fetch_routing_crawl",
    "stratified_sample_docs",
    "curate_corpus_e2e",
    "embedding_cosine_topk",
]


def _plan(df) -> str:
    # AQE's toString appends an "== Initial Plan ==" copy of the whole tree;
    # keep only the current plan or every node double-counts
    return df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]


def _formatted(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    return {name: _plan(qs[name](spark, sf_dir)) for name in LAZY_ENTRIES}


def test_no_cartesian_products(plans):
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name


def test_no_row_at_a_time_python(plans):
    # ArrowEvalPython (vectorized) is allowed; BatchEvalPython (row-at-a-time
    # pickling) is the banned slow path (SURVEY §2.10)
    for name, plan in plans.items():
        assert "BatchEvalPython" not in plan, name


def test_expected_broadcasts(plans):
    # small dims must broadcast — a flip to SortMergeJoin here means the big
    # side starts shuffling at scale
    for name in ("q3_shipping_priority", "q5_revenue_by_nation", "embedding_cosine_topk"):
        assert "BroadcastHashJoin" in plans[name] or "BroadcastNestedLoopJoin" in plans[name], name


def test_scan_pruning_reaches_parquet(spark, sf_dir):
    # q1 reads a 6-column slice of lineitem, never the full row (ReadSchema
    # only prints in formatted explain)
    import re

    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q1_pricing_summary"](spark, sf_dir)
    reads = re.findall(r"ReadSchema: struct<([^>]*)>", _formatted(df))
    assert reads, "no parquet scan found in q1 plan"
    assert all(r.count(",") + 1 <= 8 for r in reads), reads


def test_crawl_round_dag_properties(spark):
    """The actual crawl-round operator chain (the explain_audit DAG): all
    joins broadcast, one Arrow pass over html, no cartesian, no
    row-at-a-time Python."""
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from explain_audit import main as _  # noqa: F401 — import check only

    from pyspark.sql import functions as F

    from cis455crawler_spark.functions.fetch import route_fetch
    from cis455crawler_spark.functions.html import parse_page_udf
    from cis455crawler_spark.functions.robots import build_robots_df, crawl_allowed
    from cis455crawler_spark.functions.urls import resolve_href
    from cis455crawler_spark.operators.dedup import anti_join_seen
    from cis455crawler_spark.operators.scheduler import host_budget, pop_host_batches
    from cis455crawler_spark.plans.crawl import _with_url_cols
    from cis455crawler_spark.sources.corpus import CorpusSpec, pages_spark_df

    pages = pages_spark_df(spark, CorpusSpec(hosts=6, pages_per_host=10))
    robots = build_robots_df(spark, pages)
    frontier = pages.select("url").withColumn("depth", F.lit(0))
    seen = pages.sample(0.3, seed=1).select(F.sha1("url").alias("url_hash"))
    raw = _with_url_cols(frontier.groupBy("url").agg(F.min("depth").alias("depth")), 32)
    cand = (
        anti_join_seen(raw, seen)
        .join(F.broadcast(robots), "host", "left")
        .withColumn(
            "allowed", crawl_allowed(F.col("url"), F.col("has_robots"), F.col("disallow"))
        )
    )
    ok = cand.filter("allowed").withColumn("budget", host_budget(F.col("crawl_delay"), 60))
    sched, _d = pop_host_batches(ok.select("url", "url_hash", "host", "bucket", "depth", "budget"))
    parsed = (
        sched.join(pages.select("url", "warc_ts", "html"), "url", "left")
        .withColumn("action", route_fetch("html", "url"))
        .withColumn("_p", parse_page_udf(F.when(F.col("action") == "parse", F.col("html"))))
        .withColumn(
            "out_links",
            F.filter(
                F.transform(F.col("_p.hrefs"), lambda h: resolve_href(F.col("url"), h)),
                lambda x: x.isNotNull(),
            ),
        )
    )
    out = parsed.select(F.explode("out_links").alias("url")).groupBy("url").count()
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # seen anti, robots, fetch join

    # single-pass parse: up to the parsed projection, ONE eval node even
    # though hrefs/text are referenced separately (Spark dedups the repeated
    # UDF calls into one ArrowEvalPython)
    assert _plan(parsed).count("ArrowEvalPython [parse_page_udf") == 1

    # KNOWN CATALYST SHAPE: explode over a UDF-derived array splits into a
    # size>0 Filter + Generate pair and EACH gets its own UDF eval in an
    # uncached chain — this is exactly why run_round caches `parsed` before
    # the links explode (the cache scan replaces both evals). Assert the
    # hazard exists uncached (so a Spark upgrade that fixes it surfaces
    # here) and that the engine's cached shape runs ZERO re-evals.
    assert plan.count("ArrowEvalPython [parse_page_udf") == 2
    parsed_cached = parsed.cache()
    try:
        cached_plan = _plan(
            parsed_cached.select(F.explode("out_links").alias("url")).groupBy("url").count()
        )
        assert "InMemoryTableScan" in cached_plan
        # the one remaining eval node is INSIDE the InMemoryRelation — the
        # cache-build plan that runs once at materialization; the consuming
        # chain itself scans the cache (no second per-row eval)
        assert cached_plan.count("ArrowEvalPython [parse_page_udf") == 1
    finally:
        parsed_cached.unpersist()
