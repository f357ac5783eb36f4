"""Structured Streaming over the crawl's event/metrics feed.

The reference has no streaming runtime — its 10-second worker heartbeats
(/root/reference/Crawler/src/com/datformers/mapreduce/worker/resources/
WorkerStatusUpdator.java:29-57) and master status page are polling loops.
The rebuild exposes the same signals as a Structured Streaming pipeline over
an events table (file source in tests; Kafka on a real cluster):

  * tumbling-window fetch-rate aggregation with a watermark for late events
  * per-host running counters via the same windowed aggregation

Batch-equivalent builders are provided so correctness is oracle-checkable in
SQL (a windowed streaming agg over a static frame equals its batch GROUP BY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """(window_start, event_type, n, total_value) per tumbling window."""
    df = events
    if streaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: session starts when the previous
    event is more than `gap` away (lag window + running sum — the batch
    equivalent of applyInPandasWithState session tracking)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = gap_minutes * 60
    with_prev = events.withColumn("prev_ts", F.lag("ts").over(w))
    new_sess = F.when(
        F.col("prev_ts").isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")) > gap),
        1,
    ).otherwise(0)
    sessed = with_prev.withColumn("is_new", new_sess).withColumn(
        "session_seq", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessed.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("session_value"),
    )


def stream_from_directory(spark, path: str, schema: str) -> DataFrame:
    """File-source readStream for tests (new parquet files appear per round)."""
    return spark.readStream.schema(schema).parquet(path)


def start_metrics_stream(spark, src_dir: str, out_dir: str, checkpoint_dir: str):
    """readStream over round-metric drops -> windowed agg -> parquet sink.
    Demonstrates the full streaming path end-to-end with exactly-once sink
    semantics via the checkpoint dir."""
    schema = "ts timestamp, event_type string, user_id long, value double"
    agg = tumbling_event_counts(
        stream_from_directory(spark, src_dir, schema), streaming=True
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
