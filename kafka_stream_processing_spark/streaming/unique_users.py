"""Structured Streaming parity for the reference topology.

The reference consumes a Kafka topic and emits per-minute unique-user
counts continuously (update-style changelog; documented defect at
reference README.md:45-52).  Here the same topology runs as a Spark
Structured Streaming job:

    source → watermark(5s) → window(1 min) → stateful dedup → count

- ``withWatermark("ts", "5 seconds")`` encodes the reference README's own
  latency bound ("99.9% of frames arrive within 5 seconds", README.md:56)
  and gives deterministic window finalization + state GC — the behavior
  the reference author wanted but couldn't achieve.
- The distinct count is two-phase (dropDuplicates on (window, user) then
  count) because streaming aggregation forbids countDistinct; dedup state
  is per-(window,user) UnsafeRow — bounded, evicted at watermark — unlike
  the reference's ever-growing Java-serialized HashSet (HashSetSerde,
  UniqueUsersCounter.java:26-45).

For CI/driver runs the source is the file source with an availableNow
trigger (no broker needed); the Kafka wiring lives in
``kafka_stream_processing_spark.sources.kafka`` and swaps in unchanged.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import normalize_events

_run_counter = itertools.count()


def _stream_source_dir(sf_dir: str) -> str:
    """Spark's file streaming source requires a *directory*; the testdata
    keeps one parquet file per table.  Stage a directory of symlinks under
    /tmp (testdata itself is read-only)."""
    key = sf_dir.strip("/").replace("/", "_")
    d = os.path.join("/tmp", "kssp_stream_src", key, "events")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return d


def build_windowed_dedup(events: DataFrame, watermark: str = "5 seconds") -> DataFrame:
    """The streaming topology up to (but excluding) the final count —
    shared by batch-parity tests and the Kafka entry point."""
    return (
        events
        .withWatermark("ts", watermark)
        .select(F.window("ts", "1 minute").alias("w"), "user_id")
        .dropDuplicates(["w", "user_id"])
    )


def count_per_window(deduped: DataFrame) -> DataFrame:
    return (
        deduped.groupBy("w")
        .agg(F.count(F.lit(1)).alias("unique_users"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "unique_users",
        )
    )


@register(
    "stream_unique_users_per_minute",
    oracle="""
    SELECT CAST(date_trunc('minute', ts) AS VARCHAR) AS window_start,
           count(DISTINCT user_id) AS unique_users
    FROM events
    GROUP BY 1
    """,
    tags=("streaming", "reference-parity"),
)
def stream_unique_users_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship computed BY ACTUALLY RUNNING Structured Streaming:
    file-source stream → watermark → stateful dedup → memory sink
    (availableNow trigger), then the final count over the sink table.
    Registered with the same oracle as the batch flagship — streaming and
    batch must agree exactly."""
    path = _stream_source_dir(sf_dir)
    # Raw schema (ts as nanos-long under nanosAsLong), normalized after.
    raw_schema = spark.read.parquet(path).schema
    name = f"stream_unique_users_{next(_run_counter)}"

    stream = normalize_events(spark.readStream.schema(raw_schema).parquet(path))
    deduped = build_windowed_dedup(stream)
    query = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return count_per_window(spark.table(name))


@register(
    "stream_unique_users_sliding",
    oracle="""
    WITH assigned AS (
        SELECT user_id,
               make_timestamp((epoch_us(ts) // 30000000) * 30000000) AS wstart
        FROM events
        UNION ALL
        SELECT user_id,
               make_timestamp((epoch_us(ts) // 30000000) * 30000000 - 30000000)
        FROM events
    )
    SELECT CAST(wstart AS VARCHAR) AS window_start,
           count(DISTINCT user_id) AS unique_users
    FROM assigned
    GROUP BY 1
    """,
    tags=("streaming",),
)
def stream_unique_users_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (1 min / 30 s hop) windowed distinct users computed by a
    real Structured Streaming run — each event enters two windows'
    dedup state; same oracle as the batch sliding query."""
    path = _stream_source_dir(sf_dir)
    raw_schema = spark.read.parquet(path).schema
    name = f"stream_sliding_{next(_run_counter)}"

    stream = normalize_events(spark.readStream.schema(raw_schema).parquet(path))
    deduped = (
        stream
        .withWatermark("ts", "5 seconds")
        .select(F.window("ts", "1 minute", "30 seconds").alias("w"), "user_id")
        .dropDuplicates(["w", "user_id"])
    )
    query = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return count_per_window(spark.table(name))
