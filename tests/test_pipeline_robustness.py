"""Null/empty/degenerate-input policy for the round-2 pipeline operators:
the engine must degrade deterministically (NULL-safe expressions, empty
outputs) on inputs the synthetic corpus never produces — null text,
empty strings, single-word docs, null keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def test_gopher_features_on_degenerate_text(spark):
    """The rule-chain feature expressions are total functions: empty
    string (one empty token), single word, and NULL text all produce
    defined rows — NULL text yields NULL features, never a crash or a
    dropped row."""
    from kafka_stream_processing_spark.operators.pipeline import (
        gopher_feature_columns,
    )

    d = _docs(
        spark,
        [
            (1, "", "en", "s", 0),
            (2, "word", "en", "s", 4),
            (3, None, "en", "s", 0),
            (4, "the the the the", "en", "s", 15),
        ],
    )
    # The operator's own feature expressions — not a copy.
    feats = d.select("doc_id", *gopher_feature_columns()).collect()
    by_id = {r.doc_id: r for r in feats}
    assert by_id[1].n_words == 1 and by_id[1].total_chars == 0  # [''] token
    assert by_id[2].n_words == 1 and by_id[2].total_chars == 4
    assert by_id[3].n_words is None and by_id[3].total_chars is None
    assert by_id[4].n_top == 4


def test_split_assign_null_key_goes_to_one_split(spark):
    """A NULL doc_id must not crash hashing and lands deterministically
    in ONE split (md5 of NULL → NULL bucket → the otherwise() branch),
    never scattered or dropped."""
    from kafka_stream_processing_spark.operators.pipeline import split_assign

    d = spark.createDataFrame([(None,), (1,), (2,)], "doc_id bigint")
    rows = d.withColumn("split", split_assign(F.col("doc_id"))).collect()
    by_key = {r.doc_id: r.split for r in rows}
    assert by_key[None] == "test"  # CASE falls through to otherwise()
    assert all(s in ("train", "val", "test") for s in by_key.values())


def test_fuzzy_blocked_names_null_name_never_matches(spark):
    """NULL names: levenshtein(NULL, x) is NULL, the <= filter drops it —
    a null-keyed record silently produces no pairs (the record-linkage
    convention), not an error."""
    a = spark.createDataFrame(
        [(1, "B1", "red widget"), (2, "B1", None), (3, "B1", "red widgets")],
        "key bigint, brand string, name string",
    )
    b = (
        a.withColumnRenamed("key", "key_b")
        .withColumnRenamed("name", "name_b")
        .withColumnRenamed("brand", "brand_b")
    )
    pairs = (
        a.join(b, (F.col("brand") == F.col("brand_b")) & (F.col("key") < F.col("key_b")))
        .withColumn("d", F.levenshtein("name", "name_b"))
        .filter(F.col("d") <= 3)
        .collect()
    )
    assert {(r.key, r.key_b) for r in pairs} == {(1, 3)}


def test_eos_sink_empty_batch_commits_empty_transaction(spark, tmp_path):
    """An empty micro-batch must still commit (and write its marker):
    skipping it would leave the epoch permanently uncommitted and block
    the idempotence guard on replay."""
    import os

    from kafka_stream_processing_spark.streaming.eos_sink import (
        FileTransactionLog,
        transactional_epoch_sink,
    )

    log_dir, marker_dir = str(tmp_path / "log"), str(tmp_path / "markers")
    sink = transactional_epoch_sink(
        "app",
        marker_dir,
        producer_factory=lambda t: FileTransactionLog(log_dir, t),
        row_to_kv=lambda r: (r["k"], r["v"]),
    )
    empty = spark.createDataFrame([], "k string, v string")
    sink(empty, 0)
    assert os.path.exists(os.path.join(marker_dir, "epoch-0"))
    assert FileTransactionLog.read_committed(log_dir) == []


def test_grouped_agg_udaf_skips_nulls_like_sql_sum(spark):
    """The exact-sum grouped-agg pandas UDF must skip NULL values the way
    SQL SUM does (NULLs arrive as NaN in the Arrow series) — not crash
    converting NaN to int64."""
    from kafka_stream_processing_spark.operators.python_udfs import (
        _exact_value_sum_udf,
        _group_count_udf,
    )

    df = spark.createDataFrame(
        [("a", 1.5), ("a", None), ("a", 2.25), ("b", None)],
        "k string, value double",
    )
    rows = {
        r.k: (r.total, r.n)
        for r in df.groupBy("k")
        .agg(
            _exact_value_sum_udf()("value").alias("total"),
            _group_count_udf()("value").alias("n"),
        )
        .collect()
    }
    assert rows["a"] == (3.75, 3)  # sum skips the NULL; count counts rows
    assert rows["b"][0] == 0.0
