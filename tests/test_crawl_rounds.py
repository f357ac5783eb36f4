"""End-to-end crawl invariants vs. the Python oracle (FIXTURES.md §invariants):

  1. final URL-seen set equality (engine seen table == oracle seen hashes)
  2. per-round frontier set equality (round-granular BFS-with-politeness)
  3. byte-identical extracted text per url (engine UDF vs fixture column)
"""

import pytest

from cis455crawler_spark.plans.crawl import CrawlConfig, init_crawl, run_round, run_crawl
from cis455crawler_spark.functions.robots import build_robots_df
from cis455crawler_spark.sources.corpus import CorpusSpec, generate_pages_pdf, seed_urls
from cis455crawler_spark.sources.tables import SnapshotStore

from .oracle import oracle_crawl

SPEC = CorpusSpec.smoke()
MAX_ROUNDS = 12


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = generate_pages_pdf(SPEC)
    pages = spark.createDataFrame(
        pdf, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    ).cache()
    pages.count()
    return pdf, pages


@pytest.fixture(scope="module")
def oracle_res(corpus):
    pdf, _ = corpus
    page_map = dict(zip(pdf["url"], pdf["html"]))
    return oracle_crawl(page_map, seed_urls(SPEC), max_rounds=MAX_ROUNDS)


def test_crawl_matches_oracle(spark, corpus, oracle_res, tmp_path):
    _, pages = corpus
    cfg = CrawlConfig(max_rounds=MAX_ROUNDS, compact_every=0)
    store = SnapshotStore(spark, str(tmp_path / "state"))
    init_crawl(spark, store, seed_urls(SPEC), cfg)
    robots = build_robots_df(spark, pages).cache()

    engine_frontiers = []
    for round_no in range(1, MAX_ROUNDS + 1):
        frontier = store.read("frontier")
        f_set = {r["url"] for r in frontier.select("url").collect()}
        if not f_set:
            break
        engine_frontiers.append(f_set)
        run_round(spark, store, pages, robots, cfg, round_no)

    # (2) per-round frontier equality
    assert len(engine_frontiers) == len(oracle_res.frontiers)
    for k, (got, want) in enumerate(zip(engine_frontiers, oracle_res.frontiers), 1):
        assert got == want, f"frontier mismatch at round {k}"

    # (1) final seen-set equality
    engine_seen = {r["url_hash"] for r in store.read("seen").select("url_hash").collect()}
    assert engine_seen == oracle_res.seen

    # metrics agreement per round
    hist = [h for h in store.manifest()["history"] if "scheduled" in h]
    for got, want in zip(hist, oracle_res.metrics):
        for key in ("urls_in", "robots_denied", "politeness_deferred", "scheduled", "fetch_hits"):
            assert got[key] == want[key], (got["round"], key)


def test_text_byte_identical(spark, corpus, tmp_path):
    """input_hint invariant: engine text-extraction output == fixture text."""
    from cis455crawler_spark.functions.html import extract_text_udf
    from pyspark.sql import functions as F

    _, pages = corpus
    mismatch = (
        pages.withColumn("engine_text", extract_text_udf("html"))
        .filter(
            ~(
                (F.col("engine_text") == F.col("text"))
                | (F.col("engine_text").isNull() & F.col("text").isNull())
            )
        )
        .count()
    )
    assert mismatch == 0


def test_run_crawl_driver_loop(spark, corpus, oracle_res, tmp_path):
    _, pages = corpus
    store, metrics = run_crawl(
        spark,
        pages,
        seed_urls(SPEC),
        str(tmp_path / "state2"),
        CrawlConfig(max_rounds=MAX_ROUNDS, compact_every=4),
    )
    assert sum(m["scheduled"] for m in metrics) == sum(
        m["scheduled"] for m in oracle_res.metrics
    )
    engine_seen = {r["url_hash"] for r in store.read("seen").select("url_hash").collect()}
    assert engine_seen == oracle_res.seen


def test_bloom_path_identical(spark, corpus, oracle_res, tmp_path):
    """Bloom prefilter must not change results (no false negatives; maybes
    re-checked exactly)."""
    _, pages = corpus
    store, _ = run_crawl(
        spark,
        pages,
        seed_urls(SPEC),
        str(tmp_path / "state3"),
        CrawlConfig(max_rounds=MAX_ROUNDS, use_bloom=True, num_buckets=8, compact_every=0),
    )
    engine_seen = {r["url_hash"] for r in store.read("seen").select("url_hash").collect()}
    assert engine_seen == oracle_res.seen
