"""Tests for training-data-pipeline operators added after the first pass:
embedding-cosine near-dup, streaming sessionization, CSV sink round-trip.
(The DuckDB oracle gate cross-checks full values; these assert the semantic
invariants that a value-hash alone wouldn't explain.)"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_embedding_near_dup_finds_planted_pairs(spark):
    from web_crawler_spark.driver_queries import QUERIES
    out = QUERIES["embedding_near_dup"](spark, SF_DIR).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    # every vector was planted as its own duplicate at id+100000 → cosine 1.0
    n_base = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
              .filter(F.col("vec_id") < 300).count())
    planted = {(i, i + 100000) for i in range(n_base)}
    missing = planted - pairs
    assert not missing, f"planted duplicate pairs missed: {sorted(missing)[:5]}"
    by_pair = {(r.id_a, r.id_b): r.cosine for r in out}
    assert all(abs(by_pair[p] - 1.0) < 1e-6 for p in planted)


def test_stream_sessionize_matches_batch_spec(spark):
    """Streaming session_window counts == batch window-function counts under
    the same >=30min-gap break rule."""
    from web_crawler_spark.streaming import sessions
    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")))
    got = {r.user_id: r.n_sessions
           for r in sessions.stream_sessionize(spark, ev).collect()}
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    want_df = (ev.withColumn(
        "new_s",
        F.when(F.lag(us).over(w).isNull() |
               (us - F.lag(us).over(w) >= 1800 * 1_000_000), 1).otherwise(0))
        .groupBy("user_id").agg(F.sum("new_s").alias("n")))
    want = {r.user_id: r.n for r in want_df.collect()}
    assert got == want


def test_csv_roundtrip_preserves_rows(spark):
    from web_crawler_spark.driver_queries import QUERIES
    direct = QUERIES["crawl_extract"](spark, SF_DIR)
    via_csv = QUERIES["csv_roundtrip"](spark, SF_DIR)
    n = direct.count()
    assert via_csv.count() == n
    # flattened content must contain no newlines and match the P9 transform
    joined = (via_csv.alias("c")
              .join(direct.alias("d"), F.col("c.url") == F.col("d.url"))
              .select(F.col("c.content").alias("got"),
                      F.trim(F.regexp_replace(F.col("d.content"), r"\s+", " "))
                      .alias("want")))
    assert joined.filter(F.col("got") != F.col("want")).count() == 0
    assert via_csv.filter(F.col("content").contains("\n")).count() == 0
