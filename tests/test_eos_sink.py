"""Crash/replay test for the transactional foreachBatch sink
(streaming/eos_sink.py) — end-to-end exactly-once parity with the
reference's PROCESSING_GUARANTEE_CONFIG=EXACTLY_ONCE
(UniqueUsersCounter.java:56).

The query is killed INSIDE a transaction (after sends, before commit);
on restart from the checkpoint Spark replays that epoch.  Exactly-once
holds iff a read_committed view of the output contains every input
record exactly once — the aborted attempt invisible, the replay not
double-delivered, earlier committed epochs not re-emitted.
"""

from __future__ import annotations

import itertools
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kafka_stream_processing_spark.streaming.eos_sink import (
    FileTransactionLog,
    transactional_epoch_sink,
)
from kafka_stream_processing_spark.streaming.unique_users import (
    scoped_state_partitions,
)

_uniq = itertools.count()


class _Boom(Exception):
    pass


class _CrashyProducer(FileTransactionLog):
    """Crashes on commit of a chosen transaction's FIRST attempt —
    modeling a process death inside an open transaction."""

    crash_txn_ids: set[str] = set()

    def commit(self) -> None:
        if self.txn_id in self.crash_txn_ids:
            self.crash_txn_ids.discard(self.txn_id)
            raise _Boom(f"injected crash inside txn {self.txn_id}")
        super().commit()


def test_crash_inside_transaction_recovers_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = pd.Timestamp("2024-01-01 00:00:00")
    truth: set[tuple[str, str]] = set()
    for i in range(4):
        df = pd.DataFrame(
            {
                "k": [f"key-{i}-{j}" for j in range(5)],
                "v": [f"val-{i}-{j}" for j in range(5)],
                "ts": [base + pd.Timedelta(seconds=i * 60 + j) for j in range(5)],
            }
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(os.path.join(src, f"f{i}.parquet"), index=False)
        truth |= set(zip(df["k"], df["v"]))

    checkpoint = str(tmp_path / "chk")
    log_dir = str(tmp_path / "txlog")
    marker_dir = str(tmp_path / "markers")
    app_id = f"eos-test-{next(_uniq)}"
    raw_schema = spark.read.parquet(src).schema

    # Crash inside the 3rd epoch's transaction (first attempt only).
    _CrashyProducer.crash_txn_ids = {f"{app_id}-2"}

    def run_query():
        sink = transactional_epoch_sink(
            app_id,
            marker_dir,
            producer_factory=lambda txn_id: _CrashyProducer(log_dir, txn_id),
            row_to_kv=lambda r: (r["k"], r["v"]),
        )
        stream = (
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .select("k", "v")
        )
        with scoped_state_partitions(spark):
            q = (
                stream.writeStream.foreachBatch(sink)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    with pytest.raises(Exception) as exc_info:
        run_query()
    assert "injected crash" in str(exc_info.value)

    committed_mid = FileTransactionLog.read_committed(log_dir)
    # The crashed transaction is invisible: only fully committed epochs.
    assert set(committed_mid) < truth
    assert len(committed_mid) == len(set(committed_mid))

    run_query()  # restart from checkpoint; epoch 2 replays and commits

    committed = FileTransactionLog.read_committed(log_dir)
    assert len(committed) == len(truth), (
        f"{len(committed)} delivered vs {len(truth)} expected"
    )
    assert set(committed) == truth


def test_replayed_committed_epoch_is_skipped(spark, tmp_path):
    """If the crash lands BETWEEN commit and marker write, the replay
    re-commits under the same transactional id and the file log (like a
    fenced broker) keeps one copy; if the marker was written, the replay
    skips the epoch entirely.  Either way: exactly once."""
    log_dir = str(tmp_path / "txlog")
    marker_dir = str(tmp_path / "markers")
    sink = transactional_epoch_sink(
        "app",
        marker_dir,
        producer_factory=lambda txn_id: FileTransactionLog(log_dir, txn_id),
        row_to_kv=lambda r: (r["k"], r["v"]),
    )
    batch = spark.createDataFrame([("a", "1"), ("b", "2")], "k string, v string")
    sink(batch, 0)
    sink(batch, 0)  # replay after full commit → marker short-circuits
    assert FileTransactionLog.read_committed(log_dir) == [("a", "1"), ("b", "2")]

    # Same-txn-id re-commit (marker lost): content overwritten, not doubled.
    os.remove(os.path.join(marker_dir, "epoch-0"))
    sink(batch, 0)
    assert FileTransactionLog.read_committed(log_dir) == [("a", "1"), ("b", "2")]
