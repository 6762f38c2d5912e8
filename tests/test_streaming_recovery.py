"""Exactly-once recovery (reference X1 parity): the reference configures
Kafka-transaction exactly-once (PROCESSING_GUARANTEE_CONFIG at
UniqueUsersCounter.java:56); Spark's equivalent is checkpointed state +
an idempotent foreachBatch sink.  This test CRASHES the query mid-stream
and restarts it from the checkpoint, asserting the recovered output is
exactly the batch truth — no lost batches, no duplicated batches.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import functions as F

_uniq = itertools.count()


class _Boom(Exception):
    pass


def test_crash_restart_recovers_exactly_once(spark, tmp_path):
    import pandas as pd

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = pd.Timestamp("2024-01-01 00:00:00")
    for i in range(4):
        df = pd.DataFrame(
            {
                "ts": [base + pd.Timedelta(seconds=60 * i + j) for j in range(10)],
                "user_id": [100 * i + j for j in range(10)],
            }
        )
        df["ts"] = df["ts"].astype("datetime64[us]")
        df.to_parquet(os.path.join(src, f"f{i}.parquet"), index=False)

    checkpoint = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    raw_schema = spark.read.parquet(src).schema

    def build_query(fail_after: int | None):
        seen = {"n": 0}

        def sink(df, epoch_id):
            # Idempotent by epoch: rewrite the epoch's own partition dir.
            # A replayed epoch overwrites its previous (possibly partial)
            # output instead of appending a duplicate — this pairing of
            # checkpointed offsets + epoch-keyed overwrite IS the engine's
            # exactly-once sink recipe.
            df.write.mode("overwrite").parquet(os.path.join(out_dir, f"epoch={epoch_id}"))
            seen["n"] += 1
            if fail_after is not None and seen["n"] >= fail_after:
                raise _Boom("injected crash")

        stream = (
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # First run: crash after two successfully committed epochs.
    q = build_query(fail_after=2)
    try:
        q.awaitTermination()
    except Exception:
        pass
    assert not q.isActive

    # Restart from the same checkpoint: must resume, not reprocess epoch 0.
    q2 = build_query(fail_after=None)
    q2.awaitTermination()

    got = spark.read.parquet(out_dir).select("user_id").collect()
    got_ids = sorted(r.user_id for r in got)
    want_ids = sorted(
        r.user_id for r in spark.read.parquet(src).select("user_id").collect()
    )
    assert got_ids == want_ids, (
        f"exactly-once violated: {len(got_ids)} rows vs {len(want_ids)} expected"
    )
