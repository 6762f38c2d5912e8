#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (count() forces the full plan, no
driver-side collect of payload data) after one warm-up of the flagship to
amortize JVM/session startup out of per-query numbers.
"""

from __future__ import annotations

import json
import os
import time

from kafka_stream_processing_spark import registry
from kafka_stream_processing_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("kssp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = registry.all_specs()
    names = registry.headline_names()

    # Warm-up: JVM JIT, parquet footer caches, Python worker pool.
    specs["unique_users_per_minute"].fn(spark, sf_dir).count()

    # Untimed warm pass per query: parquet footers, JIT, shuffle-file page
    # cache for THIS query's tables (the flagship warm-up above only
    # touches events.parquet — q1 etc. read lineitem cold otherwise).
    for name in names:
        specs[name].fn(spark, sf_dir).count()

    # best-of-3: single-machine container timings jitter by 2-3x on
    # occasional scheduling/GC stalls; the minimum is the stable signal.
    # The 3 timed runs are INTERLEAVED round-robin passes over the whole
    # query set (pass 1 of every query, then pass 2, ...) so a sustained
    # host stall lands on different queries in different passes instead
    # of poisoning all 3 samples of whichever query it overlapped
    # (measured on the r04 box: same-code totals swung 6 s → 62 s when
    # one multi-minute stall covered one query's back-to-back runs).
    best: dict[str, float] = {name: float("inf") for name in names}
    for _ in range(3):
        for name in names:
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).count()
            best[name] = min(best[name], time.perf_counter() - t0)
    timings = {name: round(best[name], 4) for name in names}

    total = round(sum(timings.values()), 4)

    # Streaming headliners, reported SEPARATELY so `value` stays
    # apples-to-apples with BASELINE.md's 7-query batch total.  Each run
    # executes a full availableNow Structured Streaming query (source
    # staging, state store, sink) — wall here IS end-to-end trigger
    # latency, so wins/regressions in streaming state sizing are
    # measured, not anecdotal.
    stream_names = (
        "stream_unique_users_per_minute",
        "stream_chained_window_agg",
        "stream_session_windows_per_user",
    )
    for name in stream_names:
        specs[name].fn(spark, sf_dir).count()
    sbest: dict[str, float] = {name: float("inf") for name in stream_names}
    for _ in range(3):
        for name in stream_names:
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).count()
            sbest[name] = min(sbest[name], time.perf_counter() - t0)
    streaming = {name: round(sbest[name], 4) for name in stream_names}

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "streaming": streaming,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
