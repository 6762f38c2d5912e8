"""Arbitrary stateful streaming — the engine's escape hatch for operators
Structured Streaming lacks natively (the tier-(b) path of SURVEY.md §7.4):
``applyInPandasWithState`` gives each key a persistent, checkpointed state
object across micro-batches, which is exactly what the reference's custom
``aggregate()`` + state store amounts to (UniqueUsersCounter.java:80-84) —
minus the unbounded Java-serialized HashSet.

The demonstration operator keeps per-user running statistics (event count,
value sum, last-seen timestamp) in O(1) state per user and emits the
updated row each batch; the LAST emission per user equals the batch
aggregate, which is what the oracle checks.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import normalize_events
from kafka_stream_processing_spark.streaming.unique_users import (
    _stream_chunked_source_dir,
    scoped_state_partitions,
)

_uniq = itertools.count()

STATE_SCHEMA = "n bigint, sum_value_micro bigint, last_us bigint"
OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, last_seen_us bigint"
)


def _update_user_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Running per-user stats.  Value sums are kept in integer micro-units
    inside the state so accumulation is exact and order-independent (the
    same decimal-not-double discipline as functions/exact.py)."""
    if state.exists:
        n, sum_micro, last_us = state.get
    else:
        n, sum_micro, last_us = 0, 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # Quantize PER ROW before summing: summing doubles first would let
        # fp error grow with batch size and could cross the 0.5-micro
        # rounding boundary at large scale, diverging from the oracle's
        # per-row DECIMAL(18,6) sum (same discipline as topk.py).
        # dropna first (SQL SUM skips NULLs; count(*) still counts the
        # row) and stay vectorized — a Python-level map is O(rows) and
        # int(nan) raises.
        sum_micro += int(
            pdf["value"].dropna().mul(1e6).round().astype("int64").sum()
        )
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, sum_micro, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [sum_micro / 1e6],
            "last_seen_us": [last_us],
        }
    )


@register(
    "stream_stateful_user_stats",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           max(epoch_us(ts)) AS last_seen_us
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState, run as a REAL
    multi-batch stream: the source is staged as 3 time-ordered chunk files
    fed one per trigger, so per-user state genuinely accumulates across
    micro-batches and each batch re-emits the updated row; the final
    emission per user must equal the batch aggregate.  State is 3 integers
    per user — bounded, checkpointed, and GC-able via timeouts at scale."""
    path = _stream_chunked_source_dir(sf_dir)
    raw_schema = spark.read.parquet(path).schema
    name = f"stateful_{next(_uniq)}"

    stream = (
        normalize_events(
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "value")
    )
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    with scoped_state_partitions(spark):
        query = (
            updated.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    # The memory sink holds one emission per (user, batch); the final one
    # per user (max n_events — counts are monotone) is the answer.
    sink = spark.table(name)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value", "last_seen_us")
    )
