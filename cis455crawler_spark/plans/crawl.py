"""The crawl plan: a round-synchronous URL-frontier + fetch scheduler.

One round = one DataFrame DAG (SURVEY.md §3.1), replacing the reference's
20-thread queue loop (XPathCrawlerThread.java:78-266) and master/worker
round-trip (MasterServlet.java:78-185):

    frontier_r (snapshot scan)
      -> canonicalize + sha1 (JVM cols)                 [O-X1/X2]
      -> anti-join seen (optional bloom prefilter)      [O-J2/O-F6]
      -> broadcast-join robots + quirk predicate        [O-J1/O-F4]
      -> salted per-host budget window pop              [O-W2/O-F5]
      -> "fetch" = left join pages on url -> html       [O-S4]
      -> Arrow UDF link+text extraction, JVM resolution [O-X3/X4/X5/O-F7]
      -> explode -> dedup -> anti-join (seen + batch)   [O-J2/O-U3]
      -> COMMIT seen+/parsed+/metrics+/lineage+, frontier (one snapshot);
         the link graph (edges) stays derivable from parsed.out_links

Seen-set semantics follow the reference exactly: scheduled URLs are marked
seen at schedule time (XPathCrawlerThread.java:122-126), robots-DENIED URLs
are also marked seen (:455-487 — every deny branch adds to visitedURL),
politeness-deferred URLs are NOT (they are re-enqueued, :443-447).

Stop conditions: empty frontier, or total scheduled >= max_pages
(TotalMaxRequests, Crawler/conf/master/web.xml:22-24), or max_rounds.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.html import html_as_string, parse_page_udf, title_of
from ..functions.robots import build_robots_df, crawl_allowed
from ..functions.urls import host_of, resolve_href, sha1_hex, url_hash_bucket
from ..operators.dedup import anti_join_seen, build_bloom_sidecar
from ..operators.scheduler import host_budget, pop_host_batches
from ..sources.tables import SnapshotStore


@dataclass
class CrawlConfig:
    max_rounds: int = 50
    max_pages: int = 100_000  # TotalMaxRequests
    round_duration_s: int = 60
    salt_buckets: int = 8
    num_buckets: int = 32  # seen-table bucket layout
    use_bloom: bool = False  # pays when seen >> per-round frontier (BENCH.md)
    bloom_bucket_bits: int = 1 << 22  # fixed bits/bucket so deltas OR-merge
    compact_every: int = 8


def _with_url_cols(df: DataFrame, num_buckets: int) -> DataFrame:
    df = df.withColumn("url_hash", sha1_hex("url")).withColumn("host", host_of("url"))
    return df.withColumn("bucket", url_hash_bucket("url_hash", num_buckets))


def init_crawl(
    spark: SparkSession, store: SnapshotStore, seeds: list[str], cfg: CrawlConfig
) -> None:
    """Round-0 snapshot: frontier = seed list (MasterServlet.java:305-311)."""
    frontier0 = spark.createDataFrame(
        [(u, 0) for u in dict.fromkeys(seeds)], schema="url string, depth int"
    )
    store.commit_round(0, replaces={"frontier": frontier0}, extra={"phase": "init"})


def run_round(
    spark: SparkSession,
    store: SnapshotStore,
    pages: DataFrame,
    robots: DataFrame,
    cfg: CrawlConfig,
    round_no: int,
    frontier: DataFrame | None = None,
) -> dict | tuple[dict, DataFrame]:
    """One scheduling round. `frontier` may be passed in-memory by the driver
    loop (avoids a parquet round-trip); omitted -> read from the snapshot."""
    import os

    timing = os.environ.get("SPARK_GRAFT_ROUND_TIMING") == "1"
    _t = [time.time()]

    def _tick(label: str) -> None:
        if timing:
            now = time.time()
            print(f"[round {round_no}] {label}: {now - _t[0]:.2f}s", flush=True)
            _t[0] = now

    return_frontier = frontier is not None
    if frontier is None:
        frontier = store.read("frontier")
    seen = store.read("seen")

    # candidate set: frontier distinct on url (min depth), minus seen;
    # cached — it feeds both the urls_in metric and the anti-join
    raw = _with_url_cols(
        frontier.groupBy("url").agg(F.min("depth").alias("depth")), cfg.num_buckets
    ).cache()
    # Bloom sidecar is INCREMENTAL: each round appends a bitmap delta built
    # from that round's (small) new_seen batch; reads OR-merge the deltas.
    # The full seen table is only rescanned to heal a crawl that started
    # without the bloom config (resume with use_bloom newly on).
    sidecar = None
    if cfg.use_bloom and seen is not None:
        sidecar = store.read("bloom")
        if sidecar is None:
            sidecar = build_bloom_sidecar(seen, cfg.num_buckets, cfg.bloom_bucket_bits)
            heal_sidecar = sidecar  # persist with this round's commit
        else:
            heal_sidecar = None
    else:
        heal_sidecar = None
    fresh_cand = anti_join_seen(
        raw, seen, spark=spark, sidecar=sidecar, num_buckets=cfg.num_buckets
    )

    # robots gate (broadcast join + pure-column quirk predicate)
    cand = (
        fresh_cand.join(F.broadcast(robots), "host", "left")
        .withColumn(
            "allowed", crawl_allowed(F.col("url"), F.col("has_robots"), F.col("disallow"))
        )
        .cache()
    )
    # one job: urls_in (pre-dedup) via the raw side, then allowed/denied split
    urls_in = raw.count()
    _tick("urls_in count")
    split = {r["allowed"]: r["n"] for r in cand.groupBy("allowed").agg(F.count("*").alias("n")).collect()}
    _tick("cand materialize + split")
    fresh = sum(split.values())
    n_denied = split.get(False, 0)
    denied = cand.filter(~F.col("allowed"))
    ok = cand.filter(F.col("allowed")).withColumn(
        "budget", host_budget(F.col("crawl_delay"), cfg.round_duration_s)
    )

    # politeness pop (salted two-phase window)
    keep = ["url", "url_hash", "host", "bucket", "depth", "budget"]
    scheduled, deferred = pop_host_batches(
        ok.select(*keep), budget_col="budget", salt_buckets=cfg.salt_buckets
    )
    scheduled = scheduled.drop("budget").cache()
    # one job materializes the cache AND yields per-bucket lineage + n_sched
    lineage_rows = scheduled.groupBy("bucket").agg(F.count("*").alias("scheduled")).collect()
    _tick("scheduled window + lineage")
    n_sched = sum(r["scheduled"] for r in lineage_rows)
    n_deferred = (fresh - n_denied) - n_sched  # derived: ok = scheduled + deferred

    # "fetch": join the scheduled batch against the pages corpus; ONE Arrow
    # pass over html extracts hrefs+text together, title stays JVM-side
    fetched = scheduled.join(pages.select("url", "html", "lang"), "url", "left")
    parsed = (
        fetched.withColumn("_p", parse_page_udf("html"))
        .withColumn(
            "out_links",
            F.filter(
                F.transform(F.col("_p.hrefs"), lambda h: resolve_href(F.col("url"), h)),
                lambda x: x.isNotNull(),
            ),
        )
        .withColumn("text", F.col("_p.text"))
        .withColumn("title", title_of(html_as_string("html")))
        .withColumn("fetched", F.col("html").isNotNull())
        .withColumn("round", F.lit(round_no))
        .drop("_p", "html")
        .cache()
    )
    fetch_hits = parsed.filter("fetched").count()
    _tick("fetch join + parse UDF")

    # discovered links -> next frontier (dedup within batch, anti-join seen+batch)
    links = (
        parsed.select(F.explode("out_links").alias("url"), (F.col("depth") + 1).alias("depth"))
        .groupBy("url")
        .agg(F.min("depth").alias("depth"))
    )
    links = _with_url_cols(links, cfg.num_buckets)
    new_seen = scheduled.select("url_hash", "url", "bucket").unionByName(
        denied.select("url_hash", "url", "bucket")
    )
    links = anti_join_seen(links, seen, spark=spark, sidecar=sidecar, num_buckets=cfg.num_buckets)
    links = links.join(new_seen.select("url_hash"), "url_hash", "left_anti")

    # localCheckpoint (not cache): materializes AND truncates lineage, so the
    # logical plan stays flat across rounds instead of growing exponentially
    new_frontier = (
        links.select("url", "depth")
        .unionByName(deferred.select("url", "depth"))
        .localCheckpoint(eager=False)
    )
    frontier_next = new_frontier.count()
    _tick("links + frontier checkpoint")

    metrics = {
        "round": round_no,
        "urls_in": urls_in,
        "deduped": urls_in - fresh,
        "robots_denied": n_denied,
        "politeness_deferred": n_deferred,
        "scheduled": n_sched,
        "fetch_hits": fetch_hits,
        "fetch_misses": n_sched - fetch_hits,
        "frontier_next": frontier_next,
    }

    # per-partition lineage (north_rule) + 1-row metrics: already collected —
    # written driver-side, no Spark job per tiny table
    import pandas as pd

    lineage_pdf = pd.DataFrame(
        [(r["bucket"], r["scheduled"], round_no) for r in lineage_rows],
        columns=["bucket", "scheduled", "round"],
    )
    metrics_pdf = pd.DataFrame([metrics])

    appends_extra = {}
    if cfg.use_bloom:
        # bitmap delta over just this round's newly-seen keys; OR-merged with
        # earlier deltas at read time (split_by_bloom)
        delta = build_bloom_sidecar(
            new_seen.select("url_hash"), cfg.num_buckets, cfg.bloom_bucket_bits
        )
        if heal_sidecar is not None:
            delta = delta.unionByName(heal_sidecar)
        appends_extra["bloom"] = delta

    # the edges table is derivable from parsed (out_links IS the adjacency,
    # like the reference's ParsedDocument.extractedUrls) — no per-round write
    store.commit_round(
        round_no,
        appends={
            **appends_extra,
            # one task per bucket -> one file per bucket dir per round; without
            # this, every shuffle task writes a file into every bucket dir and
            # the seen table degenerates into thousands of tiny files
            "seen": new_seen.repartition(cfg.num_buckets, "bucket"),
            "parsed": parsed.select(
                "url", "url_hash", "depth", "title", "text", "out_links", "lang",
                "fetched", "round",
            ),
        },
        small_appends={"metrics": metrics_pdf, "lineage": lineage_pdf},
        replaces={"frontier": new_frontier.select("url", "depth")},
        partition_by={"seen": ["bucket"]},
        extra=metrics,
    )

    _tick("commit writes")
    for df in (raw, cand, scheduled, parsed):
        df.unpersist()
    if return_frontier:
        # new_frontier is already (url, depth); checkpoint blocks are freed by
        # the context cleaner once the caller drops the reference
        return metrics, new_frontier
    return metrics


def edges_from_parsed(store: SnapshotStore) -> DataFrame | None:
    """Link-graph edge list (src, dst) from the parsed table's adjacency
    column — the reference's ParsedDocument.extractedUrls re-read for the
    ranker (Ranker/src/.../FileManagement.java:176-184). Input to pagerank()."""
    parsed = store.read("parsed")
    if parsed is None:
        return None
    return parsed.select(F.col("url").alias("src"), F.explode("out_links").alias("dst"))


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: list[str],
    state_dir: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
) -> tuple[SnapshotStore, list[dict]]:
    """Drive rounds until a stop condition. With resume=True, continue from
    the last committed snapshot (no re-fetch of completed rounds)."""
    cfg = cfg or CrawlConfig()
    store = SnapshotStore(spark, state_dir)
    if store.current_round() < 0:
        init_crawl(spark, store, seeds, cfg)
    elif not resume:
        raise ValueError(f"state dir {state_dir} already has a crawl; pass resume=True")

    robots = build_robots_df(spark, pages).cache()
    robots.count()

    history = store.manifest()["history"]
    total_scheduled = sum(h.get("scheduled", 0) for h in history)
    round_no = store.current_round() + 1
    all_metrics = [h for h in history if "scheduled" in h]

    # frontier rides in memory between rounds (still committed every round —
    # resume reads the snapshot; this only skips the happy-path parquet read)
    frontier_df: DataFrame | None = None
    while round_no <= cfg.max_rounds:
        if total_scheduled >= cfg.max_pages:
            break
        t0 = time.time()
        if frontier_df is None:
            frontier_df = store.read("frontier")
        m, next_frontier = run_round(
            spark, store, pages, robots, cfg, round_no, frontier=frontier_df
        )
        frontier_df = next_frontier
        m["wall_s"] = round(time.time() - t0, 3)
        all_metrics.append(m)
        total_scheduled += m["scheduled"]
        if m["frontier_next"] == 0:
            break
        if cfg.compact_every and round_no % cfg.compact_every == 0:
            store.compact("seen", partition_cols=["bucket"])
        round_no += 1

    robots.unpersist()
    return store, all_metrics
