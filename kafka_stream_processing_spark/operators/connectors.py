"""File-format connectors beyond parquet: CSV and JSON-lines, exercised as
full write→read round-trips (SURVEY.md §7.1 item 1; the reference has no
file formats at all, §2.1).

Each round-trip query writes a derived copy of `events` to /tmp in the
target format and reads it back with an EXPLICIT schema (schema inference
is banned in the engine: at 100 TB an inference pass is a full extra scan,
and inferred types drift).  The oracle reads the original parquet — so the
comparison proves end-to-end format fidelity, not just that a file
appeared.  Timestamps travel as epoch micros (bigint): both CSV and JSON
are type-poor formats and a lexical timestamp round-trip would be
locale/precision-fragile.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import table

_ROUNDTRIP_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, value double, ts_us bigint"
)

_ORACLE = """
    SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
    FROM events
"""


def _export_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )


def _tmp_dir(sf_dir: str, fmt: str) -> str:
    key = sf_dir.strip("/").replace("/", "_")
    return os.path.join("/tmp", "kssp_connectors", key, fmt)


@register("connector_csv_roundtrip", oracle=_ORACLE, tags=("connectors",))
def connector_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → CSV (header, explicit schema) → DataFrame.  Spark's CSV
    writer emits shortest-round-trip doubles, so `value` survives exactly."""
    path = _tmp_dir(sf_dir, "csv")
    _export_df(spark, sf_dir).write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(_ROUNDTRIP_SCHEMA).option("header", True).csv(path)


@register("connector_json_roundtrip", oracle=_ORACLE, tags=("connectors",))
def connector_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON-lines → DataFrame with explicit schema (the batch
    analog of the Kafka JSON source, sources/kafka.py)."""
    path = _tmp_dir(sf_dir, "json")
    _export_df(spark, sf_dir).write.mode("overwrite").json(path)
    return spark.read.schema(_ROUNDTRIP_SCHEMA).json(path)


@register("connector_orc_roundtrip", oracle=_ORACLE, tags=("connectors",))
def connector_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ORC → DataFrame.  ORC is the third columnar format the
    engine speaks natively (after parquet read/write); unlike CSV/JSON it
    carries real types, so the explicit schema here asserts rather than
    reconstructs.  ORC files get the same predicate-pushdown/column-
    pruning scan path as parquet (ORC row-group statistics)."""
    path = _tmp_dir(sf_dir, "orc")
    _export_df(spark, sf_dir).write.mode("overwrite").orc(path)
    return spark.read.schema(_ROUNDTRIP_SCHEMA).orc(path)


@register(
    "connector_custom_datasource",
    oracle="""
    SELECT CAST(i % 16 AS INT) AS bucket,
           count(*) AS n,
           min(md5(CAST(i AS VARCHAR))) AS min_hash
    FROM range(0, 4096) t(i)
    GROUP BY 1
    """,
    tags=("connectors", "custom-source"),
)
def connector_custom_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan through the engine's custom Python DataSource (format
    'kssp_sequence', sources/synthetic.py) and aggregate — proving the
    from-scratch connector plugs into the same planned, partitioned scan
    path as built-in formats (8 independent input partitions, no driver
    funnel)."""
    from kafka_stream_processing_spark.sources.synthetic import (
        FORMAT_NAME,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    seq = (
        spark.read.format(FORMAT_NAME)
        .option("n", 4096)
        .option("numPartitions", 8)
        .load()
    )
    return (
        seq.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("seq_hash").alias("min_hash"),
        )
    )


@register(
    "connector_parquet_write_partitioned",
    oracle="""
    SELECT event_type,
           CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS day,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    tags=("connectors",),
)
def connector_parquet_write_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink: write events partitioned by event_type
    (the layout that makes downstream `WHERE event_type = ...` a partition
    prune instead of a scan), read back, aggregate.  At 100 TB partition
    columns are the first line of defense before row-group statistics."""
    path = _tmp_dir(sf_dir, "parquet_part")
    (
        table(spark, sf_dir, "events")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.groupBy("event_type", F.date_trunc("day", "ts").cast("string").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "connector_dynamic_partition_overwrite",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CASE WHEN event_type = 'click'
                         THEN CAST(value * 2 AS DECIMAL(18,6))
                         ELSE CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
               AS total_value
    FROM events
    GROUP BY 1
    """,
    tags=("connectors",),
)
def connector_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: a full partitioned write, then an
    overwrite touching ONLY the 'click' partition (values doubled) —
    with partitionOverwriteMode=dynamic the other four partitions keep
    their original files.  The read-back aggregate proves it: 'click'
    reflects the rewrite, everything else the first write.

    This is the idempotent-backfill primitive at 100 TB: re-running a
    day's pipeline replaces exactly that day's partitions, never
    truncating the table (static mode's behavior) and never duplicating
    (plain append's).  Conf is scoped and restored — the engine never
    leaks write semantics into the session."""
    path = _tmp_dir(sf_dir, "parquet_dyn_overwrite")
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, "STATIC")
    try:
        spark.conf.set(key, "dynamic")
        (
            ev.filter(F.col("event_type") == "click")
            .withColumn("value", F.col("value") * 2)
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(path)
        )
    finally:
        spark.conf.set(key, old)
    back = spark.read.parquet(path)
    from kafka_stream_processing_spark.functions.exact import dec

    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )


@register(
    "connector_compact_small_files",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
    tags=("connectors", "maintenance"),
)
def connector_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction: a fragmented table (64 shards — the
    output profile of a high-parallelism streaming job) rewritten to a
    handful of right-sized files, byte-identical content proven by the
    oracle aggregate over the compacted copy.

    Scale: small files are the silent scan killer (per-file open/footer
    cost, starved vectorized readers, NameNode/object-store pressure);
    the fix is this exact pattern as a maintenance job — read, coalesce
    to target-size partitions, overwrite.  `coalesce` (narrow, no
    shuffle) is correct for pure compaction; use `repartition(cols)` only
    when re-clustering is also wanted.  tests/test_compaction.py asserts
    the file-count collapse itself."""
    frag = _tmp_dir(sf_dir, "fragmented")
    compact = _tmp_dir(sf_dir, "compacted")
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).coalesce(4).write.mode("overwrite").parquet(compact)
    back = spark.read.parquet(compact)
    from kafka_stream_processing_spark.functions.exact import dec

    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )


@register(
    "connector_write_audit_publish",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE value IS NOT NULL AND event_id IS NOT NULL
    GROUP BY 1
    """,
    tags=("connectors", "maintenance"),
)
def connector_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish: data lands in a STAGING path, audit rules run
    against the staged copy (row count > 0, no null keys, no null
    payloads), and only on a clean audit does an atomic rename promote it
    to the published path readers see.  A failed audit leaves the
    published path untouched — bad data can never be half-visible.

    This is the poor-table-format's transaction: without Iceberg/Delta
    snapshot isolation, the pointer swap IS the commit point (same
    atomic-rename reasoning as the EOS sink's transaction log).  The
    published path is a SYMLINK to an immutable versioned directory, and
    publish is an atomic symlink replace — so re-publish never has a
    reader-visible window where the published path is absent (a bare
    rmtree+rename would).  Old versions are deleted only after the swap,
    when no new reader can reach them.  The oracle checks the published
    copy's content exactly."""
    import shutil
    import uuid

    staging = _tmp_dir(sf_dir, "wap_staging")
    published = _tmp_dir(sf_dir, "wap_published")
    versions = _tmp_dir(sf_dir, "wap_versions")
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ev.write.mode("overwrite").parquet(staging)

    audit = spark.read.parquet(staging).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("event_id").isNull().cast("int")).alias("null_keys"),
        F.sum(F.col("value").isNull().cast("int")).alias("null_vals"),
    ).collect()[0]
    if audit.n == 0 or audit.null_keys or audit.null_vals:
        raise ValueError(f"audit failed, publish aborted: {audit}")

    # Promote: staged dir becomes an immutable version, then an atomic
    # symlink swap moves the published pointer (the commit point).
    os.makedirs(versions, exist_ok=True)
    version_dir = os.path.join(versions, f"v_{uuid.uuid4().hex}")
    os.replace(staging, version_dir)
    if os.path.isdir(published) and not os.path.islink(published):
        # One-time migration from the pre-symlink layout (or a leftover
        # real dir): remove it so the symlink can take its place.  This
        # is the only publish with a visibility gap, by construction.
        shutil.rmtree(published)
    tmp_link = published + ".tmp"
    if os.path.lexists(tmp_link):
        os.remove(tmp_link)
    os.symlink(version_dir, tmp_link)
    os.replace(tmp_link, published)  # the commit point
    for stale in os.listdir(versions):  # GC unreachable versions
        p = os.path.join(versions, stale)
        if p != version_dir:
            shutil.rmtree(p, ignore_errors=True)

    back = spark.read.parquet(published)
    from kafka_stream_processing_spark.functions.exact import dec

    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )


@register(
    "connector_schema_evolution_merge",
    oracle="""
    WITH v1 AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               NULL AS event_type, NULL AS value
        FROM events WHERE event_id % 2 = 0
    ),
    v2 AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        FROM events WHERE event_id % 2 = 1
    ),
    merged AS (
        SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2
    )
    SELECT count(*) AS n_rows,
           count(event_type) AS type_nonnull,
           count(value) AS value_nonnull,
           CAST(count(*) - count(event_type) AS BIGINT) AS type_backfilled,
           CAST(SUM(CAST(user_id AS DECIMAL(18,6))) AS DOUBLE) AS user_sum,
           CAST(SUM(CASE WHEN event_type IS NOT NULL
                    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
               AS value_sum
    FROM merged
    """,
    tags=("connectors", "schema-evolution"),
)
def connector_schema_evolution_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Schema evolution on read: a dataset written in two generations —
    v1 files carry (event_id, user_id, ts_us), v2 files add
    (event_type, value) — is read back as ONE table via
    ``mergeSchema``, with v1 rows NULL-backfilled in the added columns.
    This is the table-format capability every long-lived ingest needs
    (a 100 TB dataset is never rewritten when a column lands); the
    audit profiles exactly what evolution did: total rows, non-null
    counts per added column, and backfill count, plus decimal-exact
    sums proving no v2 value was lost or duplicated by the merge.
    The oracle rebuilds the same two generations relationally
    (UNION ALL BY NAME), so the parquet round-trip is checked against
    engine-independent semantics.

    Scale: mergeSchema unions FOOTERS, not data — the read remains one
    pruned columnar scan; writers never rewrite old files.  The v1/v2
    split keys on event_id parity so both generations exist at every
    scale factor."""
    base = _export_df(spark, sf_dir)
    path = _tmp_dir(sf_dir, "schema_evolution")
    v1 = base.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "ts_us"
    )
    v2 = base.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "ts_us", "event_type", "value"
    )
    v1.write.mode("overwrite").parquet(os.path.join(path, "gen=1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "gen=2"))
    merged = spark.read.option("mergeSchema", True).parquet(
        os.path.join(path, "gen=1"), os.path.join(path, "gen=2")
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("event_type").alias("type_nonnull"),
        F.count("value").alias("value_nonnull"),
        (F.count(F.lit(1)) - F.count("event_type"))
        .cast("bigint")
        .alias("type_backfilled"),
        F.sum(F.col("user_id").cast("decimal(18,6)"))
        .cast("double")
        .alias("user_sum"),
        F.sum(
            F.when(
                F.col("event_type").isNotNull(),
                F.col("value").cast("decimal(18,6)"),
            )
        )
        .cast("double")
        .alias("value_sum"),
    )


#: Bucket count for the co-located join demo — at 100 TB this is the
#: knob sized so each bucket file stays in the 128 MB–1 GB band.
BUCKETED_JOIN_BUCKETS = 8


@register(
    "connector_bucketed_join_colocated",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    tags=("connectors", "scale", "joins"),
)
def connector_bucketed_join_colocated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bucketed tables + shuffle-free fact⋈fact join — THE co-location
    primitive for repeated big joins at 100 TB: orders and lineitem are
    written ONCE as bucketed+sorted tables on the join key (bucketBy
    hashes o_orderkey/l_orderkey into the same bucket layout;
    sortBy pre-sorts within buckets), and the subsequent join reads
    both sides bucket-aligned — NO Exchange and NO Sort in the join
    plan (pinned in tests/test_round7_ops.py), because Spark's
    SortMergeJoin consumes the catalog's bucketing metadata directly.
    Pay one shuffle at WRITE time, amortize it over every future join
    on that key — the batch analogue of a co-partitioned Kafka topic
    pair, and what the reference's single-topic world cannot express.

    The aggregate (revenue by priority over the joined facts) is the
    oracle-checked result; exact decimal per-row products keep the sum
    engine-stable.  Tables are registered in the session catalog with
    run-unique names and dropped (with their /tmp data) before
    returning — the result is localCheckpoint-detached first."""
    import shutil
    import uuid

    from kafka_stream_processing_spark.functions.exact import dec

    run = uuid.uuid4().hex[:10]
    base = _tmp_dir(sf_dir, f"bucketed_{run}")
    names = {}
    for tbl, key_col, cols in (
        ("orders", "o_orderkey", ["o_orderkey", "o_orderpriority"]),
        (
            "lineitem",
            "l_orderkey",
            ["l_orderkey", "l_extendedprice", "l_discount"],
        ),
    ):
        name = f"kssp_bkt_{tbl}_{run}"
        (
            table(spark, sf_dir, tbl)
            .select(*cols)
            .write.mode("overwrite")
            .format("parquet")
            .option("path", os.path.join(base, tbl))
            .bucketBy(BUCKETED_JOIN_BUCKETS, key_col)
            .sortBy(key_col)
            .saveAsTable(name)
        )
        names[tbl] = name
    o = spark.table(names["orders"])
    li = spark.table(names["lineitem"])
    joined = o.join(li, li.l_orderkey == o.o_orderkey)
    result = joined.groupBy("o_orderpriority").agg(
        F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("revenue"),
    )
    final = result.localCheckpoint(eager=True)
    for name in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(base, ignore_errors=True)
    return final


def bucketed_join_plan(spark: SparkSession, sf_dir: str) -> str:
    """Executed-plan string of the bucketed join BEFORE aggregation —
    exposed for the no-Exchange/no-Sort plan pin (the registered query
    localCheckpoints its result, which erases the join plan)."""
    import shutil
    import uuid

    run = uuid.uuid4().hex[:10]
    base = _tmp_dir(sf_dir, f"bucketed_plan_{run}")
    names = []
    for tbl, key_col, cols in (
        ("orders", "o_orderkey", ["o_orderkey", "o_orderpriority"]),
        ("lineitem", "l_orderkey", ["l_orderkey", "l_extendedprice"]),
    ):
        name = f"kssp_bktp_{tbl}_{run}"
        (
            table(spark, sf_dir, tbl)
            .select(*cols)
            .write.mode("overwrite")
            .format("parquet")
            .option("path", os.path.join(base, tbl))
            .bucketBy(BUCKETED_JOIN_BUCKETS, key_col)
            .sortBy(key_col)
            .saveAsTable(name)
        )
        names.append(name)
    o = spark.table(names[0])
    li = spark.table(names[1])
    # At test SF the orders side fits the broadcast threshold, which
    # would hide the bucketing (a BroadcastHashJoin needs no
    # co-location).  Disable broadcast within this scope to surface the
    # 100 TB shape: fact⋈fact where NEITHER side broadcasts and the
    # SortMergeJoin must come from bucket alignment alone.
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        joined = o.join(li, li.l_orderkey == o.o_orderkey)
        joined.collect()  # materialize so AQE finalizes the plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(base, ignore_errors=True)
    return plan
