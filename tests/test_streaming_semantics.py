"""Streaming-semantics regression tests anchored to the reference's
documented behaviors:

- update mode = the reference's continuous emission "defect" (counts for a
  window keep growing as records arrive — reference README.md:45-52);
- append mode + watermark = the intended one-final-count-per-window
  behavior the reference author wanted but couldn't achieve;
- batch ≡ streaming: the same plan over the same data must agree.

The multi-batch stream is staged by splitting events into 3 time-ordered
parquet files and feeding them with maxFilesPerTrigger=1.
"""

from __future__ import annotations

import itertools
import os
import shutil

import pytest
from pyspark.sql import functions as F

from kafka_stream_processing_spark.sources.tables import table

_uniq = itertools.count()


def _stage(spark, sf_small, base: str, interleaved: bool) -> str:
    events = table(spark, sf_small, "events").orderBy("ts")
    n = events.count()
    pdf = events.toPandas()
    # Keep timestamps at microsecond resolution — pandas' default ns would
    # round-trip through parquet as TIMESTAMP(NANOS), which Spark reads as
    # bigint under our nanosAsLong conf.
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    if interleaved:
        # Round-robin rows across files so every window spans all batches
        # (forces re-emission in update mode).
        chunks = [pdf.iloc[i::3] for i in range(3)]
    else:
        chunks = [pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :]]
    for i, chunk in enumerate(chunks):
        chunk.to_parquet(os.path.join(base, f"part-{i}.parquet"), index=False)
    return base


@pytest.fixture(scope="module")
def staged_stream_dir(spark, sf_small, tmp_path_factory):
    """3 chronological parquet files (in-order arrival)."""
    base = _stage(spark, sf_small, str(tmp_path_factory.mktemp("staged_events")), False)
    yield base
    shutil.rmtree(base, ignore_errors=True)


@pytest.fixture(scope="module")
def staged_interleaved_dir(spark, sf_small, tmp_path_factory):
    """3 round-robin parquet files (every window split across batches)."""
    base = _stage(spark, sf_small, str(tmp_path_factory.mktemp("staged_rr")), True)
    yield base
    shutil.rmtree(base, ignore_errors=True)


def _windowed_counts(df):
    return (
        df.select(F.window("ts", "1 minute").alias("w"), "user_id")
        .dropDuplicates(["w", "user_id"])
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("unique_users"))
        .select(F.col("w.start").cast("string").alias("window_start"), "unique_users")
    )


def _batch_truth(spark, sf_small) -> dict[str, int]:
    rows = (
        table(spark, sf_small, "events")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.countDistinct("user_id").alias("u"))
        .select(F.col("w.start").cast("string").alias("ws"), "u")
        .collect()
    )
    return {r.ws: r.u for r in rows}


def _run_stream(spark, src_dir: str, output_mode: str, with_watermark: bool):
    raw_schema = spark.read.parquet(src_dir).schema
    name = f"sem_{output_mode}_{next(_uniq)}"
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    if with_watermark:
        stream = stream.withWatermark("ts", "5 seconds")
    if output_mode == "update":
        # Faithful reproduction of the reference: per-batch updated counts.
        agg = (
            stream.groupBy(F.window("ts", "1 minute").alias("w"))
            .agg(F.approx_count_distinct("user_id").alias("unique_users"))
            .select(F.col("w.start").cast("string").alias("window_start"), "unique_users")
        )
        batches: list[list] = []

        def sink(df, _epoch):
            batches.append(df.collect())

        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return batches
    else:
        deduped = stream.select(
            F.window("ts", "1 minute").alias("w"), "user_id"
        ).dropDuplicates(["w", "user_id"])
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return (
            spark.table(name)
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("unique_users"))
            .select(F.col("w.start").cast("string").alias("window_start"), "unique_users")
            .collect()
        )


def test_update_mode_reproduces_reference_continuous_emission(
    spark, staged_interleaved_dir, sf_small
):
    """Counts for a window grow monotonically across batches (the
    reference's documented continuous emission, README.md:45-52)."""
    batches = _run_stream(spark, staged_interleaved_dir, "update", with_watermark=False)
    assert len(batches) >= 2, "expected multiple micro-batches"
    seen: dict[str, int] = {}
    re_emitted = 0
    for batch in batches:
        for row in batch:
            prev = seen.get(row.window_start)
            if prev is not None:
                re_emitted += 1
                assert row.unique_users >= prev, (
                    f"window {row.window_start} count decreased {prev} -> "
                    f"{row.unique_users}"
                )
            seen[row.window_start] = row.unique_users
    # The boundary windows spanning two files must be emitted repeatedly.
    assert re_emitted >= 1, "no window was ever updated across batches"


def test_append_mode_streaming_equals_batch(spark, staged_stream_dir, sf_small):
    """Append mode + stateful dedup over 3 micro-batches ≡ batch distinct
    count (exactly one final row per window)."""
    rows = _run_stream(spark, staged_stream_dir, "append", with_watermark=True)
    truth = _batch_truth(spark, sf_small)
    got = {r.window_start: r.unique_users for r in rows}
    assert len(got) == len(rows), "append emitted a window twice"
    assert got == truth


def test_streaming_session_windows_match_batch_for_closed_sessions(spark, sf_small):
    """Streaming session windows (append mode): every emitted session must
    exist identically in the batch result; only sessions still OPEN at the
    final watermark may be withheld (measured: exactly the tail sessions)."""
    from kafka_stream_processing_spark.sources.tables import normalize_events, table
    from kafka_stream_processing_spark.streaming.unique_users import _stream_source_dir

    path = _stream_source_dir(sf_small)
    raw = spark.read.parquet(path).schema
    stream = normalize_events(spark.readStream.schema(raw).parquet(path))
    name = f"sess_{next(_uniq)}"
    agg = (
        stream.withWatermark("ts", "5 seconds")
        .groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.unix_micros("w.start").alias("start_us"), "n_events")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.user_id, r.start_us): r.n_events for r in spark.table(name).collect()
    }

    from kafka_stream_processing_spark import registry

    batch = {
        (r.user_id, r.session_start_us): r.n_events
        for r in registry.all_specs()["session_windows_per_user"]
        .fn(spark, sf_small)
        .collect()
    }
    # Streamed sessions are exact.
    for key, n in streamed.items():
        assert batch.get(key) == n, (key, n, batch.get(key))
    # Only tail sessions may be missing.
    missing = set(batch) - set(streamed)
    max_ts = table(spark, sf_small, "events").agg(F.max("ts")).collect()[0][0]
    horizon_us = int(max_ts.timestamp() * 1e6) - (5 * 60 + 5) * 1_000_000
    assert all(start_us >= horizon_us for _, start_us in missing), missing


def test_streaming_survives_late_data_within_watermark(spark, tmp_path):
    """Events arriving out of order within the watermark still land in
    their event-time window (the reference, windowing on ingestion time,
    would miscount these — README.md:54-58)."""
    import pandas as pd

    src = str(tmp_path / "late")
    os.makedirs(src)
    base = pd.Timestamp("2024-01-01 00:00:00")

    def write(path, ts, users):
        df = pd.DataFrame({"ts": ts, "user_id": users})
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(path, index=False)

    # File 1: two users in minute 0, one in minute 1.
    write(
        os.path.join(src, "a.parquet"),
        [base, base + pd.Timedelta("10s"), base + pd.Timedelta("70s")],
        [1, 2, 3],
    )
    # File 2: a LATE arrival for minute 0 (new user 4), 3 s late.
    write(
        os.path.join(src, "b.parquet"),
        [base + pd.Timedelta("72s"), base + pd.Timedelta("20s")],
        [3, 4],
    )

    raw_schema = spark.read.parquet(src).schema
    name = f"late_{next(_uniq)}"
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "5 seconds")
        .select(F.window("ts", "1 minute").alias("w"), "user_id")
        .dropDuplicates(["w", "user_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    counts = {
        r.ws: r.c
        for r in spark.table(name)
        .groupBy(F.col("w.start").cast("string").alias("ws"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert counts["2024-01-01 00:00:00"] == 3  # users 1, 2 and LATE 4
    assert counts["2024-01-01 00:01:00"] == 1  # user 3 deduped across files


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates arriving within the
    watermark interval collapse EVEN IF their event times differ (retry
    semantics — same event_id re-sent with a slightly later timestamp),
    which plain dropDuplicates(["event_id"]) would keep unbounded state
    for.  State per key is evicted once the watermark passes — the
    bounded-state guarantee the reference's HashSet never had."""
    import pandas as pd

    src = str(tmp_path / "dupwm")
    os.makedirs(src)
    base = pd.Timestamp("2024-01-01 00:00:00")

    def write(path, ids, ts):
        df = pd.DataFrame({"event_id": ids, "ts": ts})
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(path, index=False)

    # Batch 1: events 1 and 2.
    write(os.path.join(src, "a.parquet"), [1, 2],
          [base, base + pd.Timedelta("1s")])
    # Batch 2: event 2 re-delivered 3 s later (same id, later ts) plus a
    # genuinely new event 3.
    write(os.path.join(src, "b.parquet"), [2, 3],
          [base + pd.Timedelta("4s"), base + pd.Timedelta("10s")])

    raw_schema = spark.read.parquet(src).schema
    name = f"dupwm_{next(_uniq)}"
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "5 seconds")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).select("event_id").collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3], ids  # the re-delivery of 2 was dropped
