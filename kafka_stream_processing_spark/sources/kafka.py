"""Kafka source/sink wrappers — reference-parity for S1/S2/K1/X1.

The reference consumes ``{"uid": str, "ts": long}`` JSON from an input
topic and produces ``(ISO-8601 window start, count)`` to an output topic
(UniqueUsersCounter.java:63,91-93).  These wrappers express the same
endpoints on Structured Streaming:

- schemaless JsonNode (reference JsonSerde, :20-24) → explicit
  ``REFERENCE_EVENT_SCHEMA`` + ``from_json`` (malformed records become
  NULLs instead of the reference's NPE at :68 — see FIXTURES.md);
- exactly-once (reference :56, Kafka transactions) → checkpointed
  exactly-once STATE; the Kafka sink itself is at-least-once, made
  effectively-once downstream by keying output records on window start
  (idempotent upsert) — the honest delta is documented in SURVEY.md §7.4.

This container ships no Kafka broker or spark-sql-kafka connector jar, so
everything here is import-safe but only executable against a real
cluster; CI covers the identical topology through the file source
(streaming/unique_users.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: The reference's implicit event schema (comment at
#: UniqueUsersCounter.java:65: {"uid":"dd804e1c0499d5f4beb","ts":1468244590}).
REFERENCE_EVENT_SCHEMA = StructType(
    [
        StructField("uid", StringType()),
        StructField("ts", LongType()),
    ]
)


def parse_event_payload(raw: DataFrame) -> DataFrame:
    """S2: the JSON-deserialization stage, factored out of the Kafka read
    so CI can execute it against batch rows shaped like Kafka's wire
    schema (value binary/string + timestamp) — the container has no
    broker or connector jar, but this keeps the parse logic itself (not
    just its intent) test-covered.

    Returns (uid string, event_ts long, kafka_ts timestamp).  Malformed
    or field-missing payloads yield NULLs (from_json's PERMISSIVE mode)
    instead of the reference's NPE (UniqueUsersCounter.java:68).
    """
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), REFERENCE_EVENT_SCHEMA).alias("j"),
        F.col("timestamp").alias("kafka_ts"),
    )
    return parsed.select(
        F.col("j.uid").alias("uid"),
        F.col("j.ts").alias("event_ts"),
        "kafka_ts",
    )


def read_event_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1+S2: subscribe and parse JSON payloads.

    Returns columns (uid string, event_ts long, kafka_ts timestamp).
    ``kafka_ts`` is the broker ingestion timestamp — the time basis the
    reference windows on (README.md:54-58); ``event_ts`` is the payload's
    own clock for the event-time variant (README.md:60-62).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_event_payload(raw)


def unique_users_topology(
    events: DataFrame,
    time_column: str = "kafka_ts",
    watermark: str = "5 seconds",
) -> DataFrame:
    """W1+A1+A2+T1: 1-minute tumbling window → distinct uid count → (key =
    ISO window start, value = count).  ``time_column`` selects ingestion
    time ('kafka_ts', the reference's behavior) or event time ('event_ts
    as timestamp', the reference README's unimplemented proposal)."""
    # Null-uid policy (the reference's NPE case, UniqueUsersCounter.java:68)
    # lives inside build_windowed_dedup — ONE topology shared by the Kafka
    # path and the CI-covered file-source path, so they cannot drift.
    from kafka_stream_processing_spark.streaming.unique_users import (
        build_windowed_dedup,
    )

    ts = (
        F.col(time_column)
        if time_column == "kafka_ts"
        else F.timestamp_seconds(F.col(time_column))
    )
    deduped = build_windowed_dedup(
        events.select(ts.alias("ts"), "uid"),
        watermark=watermark,
        id_col="uid",
    )
    return (
        deduped
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            # ISO-8601 window start — the reference's output key shape
            # (Instant.toString() at UniqueUsersCounter.java:91).
            F.date_format("w.start", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("key"),
            F.col("cnt").cast("string").alias("value"),
        )
    )


def write_count_stream(
    counts: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    output_mode: str = "update",
):
    """K1: produce (key, value) string pairs.  output_mode='update'
    reproduces the reference's continuous per-record emission
    (README.md:45-52); 'append' emits one final record per window once
    the watermark closes it — the fixed behavior."""
    return (
        counts.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


def run_reference_job(
    spark: SparkSession,
    input_topic: str,
    output_topic: str,
    bootstrap_servers: str = "localhost:9092",
    checkpoint_dir: str = "/tmp/kssp_checkpoints/unique_users",
    output_mode: str = "update",
):
    """The reference's main() (UniqueUsersCounter.java:47-121) end to end:
    consume input_topic, count unique users per minute, produce to
    output_topic, block until terminated.  Checkpointing replaces
    streams.cleanUp(); query.stop() replaces the shutdown hook."""
    events = read_event_stream(spark, bootstrap_servers, input_topic)
    counts = unique_users_topology(events)
    query = write_count_stream(
        counts, bootstrap_servers, output_topic, checkpoint_dir, output_mode
    )
    query.awaitTermination()
