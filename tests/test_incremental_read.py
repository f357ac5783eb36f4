"""SnapshotStore.read_appends_between — the Iceberg incremental-scan shape:
a downstream consumer reads exactly what a window of crawl rounds appended,
O(delta) dirs, and is refused (not silently wrong) across replacements,
compactions, and expired snapshots."""

from __future__ import annotations

import pytest

from cis455crawler_spark.plans.crawl import CrawlConfig, run_crawl
from cis455crawler_spark.sources.corpus import CorpusSpec, pages_spark_df, seed_urls


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    spec = CorpusSpec(hosts=8, pages_per_host=15)
    pages = pages_spark_df(spark, spec)
    state = str(tmp_path_factory.mktemp("incr") / "state")
    store, metrics = run_crawl(
        spark, pages, seed_urls(spec, 8), state,
        CrawlConfig(max_rounds=4, round_duration_s=3600, compact_every=0),
    )
    return store, metrics


def test_incremental_equals_snapshot_diff(spark, crawled):
    store, metrics = crawled
    r_lo, r_hi = metrics[0]["round"], metrics[-1]["round"]
    # delta == (seen@hi) minus (seen@lo), computed independently via time travel
    delta = store.read_appends_between("seen", r_lo, r_hi)
    got = {r.url_hash for r in delta.select("url_hash").collect()}
    hi = {r.url_hash for r in store.read("seen", as_of_round=r_hi).collect()}
    lo = {r.url_hash for r in store.read("seen", as_of_round=r_lo).collect()}
    assert got == hi - lo and got  # non-trivial window
    # stitching every per-round delta reproduces the full table
    rounds = [m["round"] for m in metrics]
    stitched = set(lo)
    for a, b in zip(rounds, rounds[1:]):
        d = store.read_appends_between("seen", a, b)
        if d is not None:
            stitched |= {r.url_hash for r in d.select("url_hash").collect()}
    assert stitched == hi


def test_incremental_parsed_window(spark, crawled):
    store, metrics = crawled
    r1 = metrics[0]["round"]
    r2 = metrics[1]["round"]
    d = store.read_appends_between("parsed", r1, r2)
    n = 0 if d is None else d.count()
    assert n == metrics[1]["parsed_pages"]


def test_incremental_from_before_first_append(spark, crawled):
    """A window opening BEFORE the table's first append is the natural
    'everything so far' call: base is provably empty (append dirs carry
    their round), not an error."""
    store, metrics = crawled
    r_hi = metrics[-1]["round"]
    d = store.read_appends_between("seen", 0, r_hi)
    full = {r.url_hash for r in store.read("seen", as_of_round=r_hi).collect()}
    assert {r.url_hash for r in d.select("url_hash").collect()} == full
    # a table that never existed: no appends, not an error
    assert store.read_appends_between("no_such_table", 0, r_hi) is None


def test_incremental_refuses_bad_windows(spark, crawled):
    store, metrics = crawled
    r = metrics[0]["round"]
    with pytest.raises(ValueError, match="replaced|compacted"):
        store.read_appends_between("frontier", r, metrics[-1]["round"])
    with pytest.raises(ValueError, match="inverted"):
        store.read_appends_between("seen", metrics[-1]["round"], r)
    # a consumer must not checkpoint a watermark beyond the committed round
    with pytest.raises(ValueError, match="beyond the committed round"):
        store.read_appends_between("seen", r, store.current_round() + 50)


def test_incremental_refuses_after_compaction(spark, crawled, tmp_path):
    import shutil

    from cis455crawler_spark.sources.tables import SnapshotStore

    # compact a COPY: the shared fixture store must stay append-pure for
    # the other tests regardless of execution order
    store, metrics = crawled
    copy = str(tmp_path / "copy")
    shutil.copytree(store.root, copy)
    store2 = SnapshotStore(spark, copy)
    store2.compact("seen", partition_cols=["bucket"])
    # the compaction scrubs the old deltas from every snapshot: a window
    # crossing it must refuse
    with pytest.raises(ValueError, match="compact|scrubbed"):
        store2.read_appends_between(
            "seen", metrics[0]["round"], store2.current_round()
        )
