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
      -> COMMIT seen+/parsed+/edges+/metrics+, frontier (one snapshot)

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

from ..functions.html import extract_hrefs_udf, extract_text_udf, html_as_string, title_of
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
    use_bloom: bool = False
    bloom_bits_per_key: int = 10
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
) -> dict:
    frontier = store.read("frontier")
    seen = store.read("seen")

    # candidate set: frontier distinct on url (min depth), minus seen
    cand = frontier.groupBy("url").agg(F.min("depth").alias("depth"))
    cand = _with_url_cols(cand, cfg.num_buckets)
    urls_in = cand.count()
    sidecar = None
    if cfg.use_bloom and seen is not None:
        sidecar = build_bloom_sidecar(seen, cfg.num_buckets, cfg.bloom_bits_per_key)
    cand = anti_join_seen(cand, seen, spark=spark, sidecar=sidecar, num_buckets=cfg.num_buckets)

    # robots gate (broadcast join + pure-column quirk predicate)
    cand = (
        cand.join(F.broadcast(robots), "host", "left")
        .withColumn(
            "allowed", crawl_allowed(F.col("url"), F.col("has_robots"), F.col("disallow"))
        )
        .cache()
    )
    fresh = cand.count()
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
    n_sched = scheduled.count()

    # "fetch": join the scheduled batch against the pages corpus
    fetched = scheduled.join(pages.select("url", "html", "lang"), "url", "left")
    parsed = (
        fetched.withColumn("hrefs", extract_hrefs_udf("html"))
        .withColumn(
            "out_links",
            F.filter(
                F.transform("hrefs", lambda h: resolve_href(F.col("url"), h)),
                lambda x: x.isNotNull(),
            ),
        )
        .withColumn("text", extract_text_udf("html"))
        .withColumn("title", title_of(html_as_string("html")))
        .withColumn("fetched", F.col("html").isNotNull())
        .withColumn("round", F.lit(round_no))
        .drop("hrefs", "html")
        .cache()
    )
    fetch_hits = parsed.filter("fetched").count()

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

    new_frontier = (
        links.select("url", "depth").unionByName(deferred.select("url", "depth")).cache()
    )

    n_denied = denied.count()
    n_deferred = deferred.count()
    frontier_next = new_frontier.count()
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

    # per-partition lineage (north_rule): scheduled/deduped counts per bucket
    lineage = (
        scheduled.groupBy("bucket")
        .agg(F.count("*").alias("scheduled"))
        .withColumn("round", F.lit(round_no))
    )
    metrics_df = spark.createDataFrame(
        [tuple(metrics.values())], schema=", ".join(f"{k} long" for k in metrics)
    )
    edges = parsed.select(
        F.col("url").alias("src"), F.explode("out_links").alias("dst")
    ).withColumn("round", F.lit(round_no))

    store.commit_round(
        round_no,
        appends={
            "seen": new_seen,
            "parsed": parsed.select(
                "url", "url_hash", "depth", "title", "text", "out_links", "lang",
                "fetched", "round",
            ),
            "edges": edges,
            "metrics": metrics_df,
            "lineage": lineage,
        },
        replaces={"frontier": new_frontier.select("url", "depth")},
        partition_by={"seen": ["bucket"]},
        extra=metrics,
    )

    for df in (cand, scheduled, parsed, new_frontier):
        df.unpersist()
    return metrics


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

    while round_no <= cfg.max_rounds:
        if total_scheduled >= cfg.max_pages:
            break
        t0 = time.time()
        m = run_round(spark, store, pages, robots, cfg, round_no)
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
