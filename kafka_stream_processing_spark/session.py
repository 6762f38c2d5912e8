"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
config block is what we would submit to a 1000-executor cluster — the only
cluster-specific knobs (executor count/memory) live outside this file.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs that query semantics/performance rely on.  These
#: are (re)applied by :func:`ensure_runtime_conf` even on a SparkSession we
#: did not create (the verification driver builds its own session).
RUNTIME_CONF: dict[str, str] = {
    # DuckDB oracle timestamps are naive; pinning the session TZ to UTC makes
    # Spark's window()/date_trunc() arithmetic agree with the oracle.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime re-plan — coalesce small shuffle partitions, convert
    # sort-merge joins to broadcast when the built side turns out small,
    # split skewed partitions.  All three matter at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas UDF / toPandas path (vector ops, multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects;
    # read nanos as raw longs and convert in the loader (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Unadjusted-UTC parquet timestamps must come back as TIMESTAMP (LTZ,
    # session tz pinned to UTC above), not TIMESTAMP_NTZ: watermarks/windows
    # require LTZ, and LTZ@UTC matches DuckDB's naive-timestamp semantics.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # InferFiltersFromGenerate synthesizes `size(arr)>0 AND isnotnull(arr)`
    # below every explode(arr).  When arr is a computed column (shingle/
    # gram/hash arrays here), the inferred filter INLINES the whole
    # generating expression and pushdown then drags it below the nearest
    # exchange — so the md5+transform chain runs once in the filter and
    # again in the project above (measured: contamination_ngram_overlap
    # spent ~7 s of its 7.6 s at sf0.1 evaluating shingles single-threaded
    # below the fanout repartition).  The rule only saves a per-row empty
    # generate, which explode handles for free; excluding it removes a
    # ~2x expression double-evaluation on every explode-after-compute
    # pipeline at any scale.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def ensure_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply semantic + adaptive confs to an existing session (idempotent)."""
    for key, value in RUNTIME_CONF.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf may be static in some envs
            pass
    return spark


def get_spark(app_name: str = "kafka_stream_processing_spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    On a real cluster the ``master`` is supplied by spark-submit; locally we
    run ``local[N]``.  Shuffle partitions default to the core count — at
    cluster scale this is overridden to ~2-3x total executor cores, and AQE
    coalesces down from there.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{n}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/kssp_warehouse"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for key, value in RUNTIME_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return ensure_runtime_conf(spark)
