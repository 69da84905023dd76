"""Structured Streaming operators (SURVEY.md §2.9).

The epoch loop (plans/epoch.py) is the engine's production micro-batch
mechanism; this module shows the same semantics expressed on Spark's
Structured Streaming runtime, for pipelines that want push-based ingest:

* :func:`stream_sessionize` — watermarked ``session_window`` aggregation
  over a file stream, append mode, results landed in a memory sink. The
  streaming twin of the batch sessionization query (driver_queries.
  events_sessionize): same 30-minute-gap session definition, evaluated
  incrementally with state cleanup by watermark.

Reference analogs being modeled (/root/reference/app):
  * micro-batching via the 10-article ``on_batch`` callback —
    scrapers/base_crawler.py:163-226 → micro-batch triggers
  * late data silently dropped by the date filter —
    base_crawler.py:200 → watermark semantics
"""

from __future__ import annotations

import datetime as _dt
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GAP = "30 minutes"


def stream_sessionize(spark: SparkSession, events: DataFrame,
                      gap: str = GAP, files_per_trigger: int = 2
                      ) -> DataFrame:
    """Run a full streaming sessionization over `events` (user_id, event_id,
    ts timestamp) and return the finalized per-user session counts.

    Mechanics: events are staged as a multi-file parquet source so the
    stream sees several micro-batches; a sentinel event 2 days past max(ts)
    pushes the watermark past every real session so append mode flushes all
    of them (the sentinel user is filtered from the result). State size is
    bounded by the watermark — at production scale this is the operator you
    run on a Kafka/file stream of fetch logs.
    """
    from ..util import scratch_dir
    workdir = scratch_dir("wcs-stream-")
    src = os.path.join(workdir, "src")
    ck = os.path.join(workdir, "ck")
    ev = events.select("user_id", "event_id",
                       F.col("ts").cast("timestamp").alias("ts"))
    mm = ev.agg(F.max("ts").alias("mx"), F.min("ts").alias("mn")).first()
    max_ts, min_ts = mm["mx"], mm["mn"]
    if max_ts is None:      # empty input: no sessions, don't start a stream
        return spark.createDataFrame(
            [], schema="user_id bigint, n_sessions bigint")
    ev.repartition(4).write.parquet(src)
    # The watermark delay must cover the FULL event-time span: micro-batch
    # file order is arbitrary, so a batch may carry late events from
    # anywhere in the range and the watermark must never finalize a session
    # that can still receive them (a fixed 1s delay was only correct for
    # files_per_trigger>=2 on a 4-file source — it silently dropped events
    # at files_per_trigger=1).
    span_s = int((max_ts - min_ts).total_seconds()) + 1
    delay = f"{span_s} seconds"
    # the sentinel sits past max_ts + delay + gap so its arrival pushes the
    # watermark beyond every real session's end, flushing them in append mode
    sentinel_ts = max_ts + _dt.timedelta(seconds=span_s) + \
        _dt.timedelta(days=1)
    sentinel = spark.createDataFrame(
        [(-1, -1, sentinel_ts)],
        schema="user_id bigint, event_id bigint, ts timestamp")
    sentinel.write.mode("append").parquet(src)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", files_per_trigger)
              .parquet(src)
              .withWatermark("ts", delay)
              .groupBy(F.session_window("ts", gap), F.col("user_id"))
              .agg(F.count("*").alias("n_events")))
    qname = "sessions_" + uuid.uuid4().hex[:8]
    q = (stream.writeStream.format("memory").queryName(qname)
         .outputMode("append").option("checkpointLocation", ck).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (spark.table(qname)
            .filter(F.col("user_id") >= 0)
            .groupBy("user_id")
            .agg(F.count("*").cast("bigint").alias("n_sessions")))


def stream_windowed_counts(spark: SparkSession, events: DataFrame,
                           window: str = "1 hour", key_col: str = "event_type",
                           files_per_trigger: int = 2) -> DataFrame:
    """Watermarked TUMBLING-window aggregation on the streaming runtime —
    the fetch-log rollup shape (events/sec per host per window is the crawl
    monitoring query at scale). Mechanics mirror stream_sessionize: staged
    multi-file parquet source so several micro-batches run, span-covering
    watermark so trigger granularity can't drop late events, sentinel past
    every window so append mode flushes all of them.

    Returns (window_start timestamp, <key_col>, n_events) — finalized
    windows only, sentinel excluded.
    """
    from ..util import scratch_dir
    workdir = scratch_dir("wcs-wstream-")
    src = os.path.join(workdir, "src")
    ck = os.path.join(workdir, "ck")
    # the sentinel is marked by a dedicated boolean column, not a magic key
    # value — so NULL keys survive the final filter (null != x filters the
    # row) and a real key literally equal to '__sentinel__' can't be dropped
    ev = events.select(F.col(key_col).alias("__k"),
                       F.col("ts").cast("timestamp").alias("ts"),
                       F.lit(False).alias("__sent"))
    mm = ev.agg(F.max("ts").alias("mx"), F.min("ts").alias("mn")).first()
    max_ts, min_ts = mm["mx"], mm["mn"]
    if max_ts is None:
        return spark.createDataFrame(
            [], schema=f"window_start timestamp, {key_col} string, "
                       f"n_events bigint")
    ev.repartition(4).write.parquet(src)
    span_s = int((max_ts - min_ts).total_seconds()) + 1
    delay = f"{span_s} seconds"
    sentinel_ts = max_ts + _dt.timedelta(seconds=span_s) + \
        _dt.timedelta(days=2)
    spark.createDataFrame([("__sentinel__", sentinel_ts, True)],
                          schema="__k string, ts timestamp, __sent boolean") \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", files_per_trigger)
              .parquet(src)
              .withWatermark("ts", delay)
              .groupBy(F.window("ts", window), F.col("__k"),
                       F.col("__sent"))
              .agg(F.count("*").alias("n_events")))
    qname = "wcounts_" + uuid.uuid4().hex[:8]
    q = (stream.writeStream.format("memory").queryName(qname)
         .outputMode("append").option("checkpointLocation", ck).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (spark.table(qname)
            .filter(~F.col("__sent"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("__k").alias(key_col),
                    F.col("n_events").cast("bigint").alias("n_events")))
