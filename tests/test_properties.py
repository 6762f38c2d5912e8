"""Property tests (SURVEY.md §5.4): algebraic identities that must hold for
any input, checked on the driver testdata plus hypothesis-generated floats.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_stream_processing_spark import registry
from kafka_stream_processing_spark.functions.exact import dec_sum
from kafka_stream_processing_spark.sources.tables import table

SPECS = registry.all_specs()


def test_window_counts_partition_total(spark, sf_small):
    """Tumbling windows partition the stream: per-window event counts sum
    to the table's row count."""
    per_window = SPECS["events_per_minute"].fn(spark, sf_small)
    total = per_window.agg(F.sum("n_events")).collect()[0][0]
    assert total == table(spark, sf_small, "events").count()


def test_approx_distinct_within_rsd(spark, sf_small):
    """approx_count_distinct stays within 5x its configured rsd (0.01) of
    the exact count on every window."""
    exact = {
        r.window_start: r.unique_users
        for r in SPECS["unique_users_per_minute"].fn(spark, sf_small).collect()
    }
    approx = {
        r.window_start: r.unique_users_approx
        for r in SPECS["unique_users_per_minute_approx"].fn(spark, sf_small).collect()
    }
    assert exact.keys() == approx.keys()
    for w, ex in exact.items():
        assert abs(approx[w] - ex) <= max(1, 0.05 * ex), (w, ex, approx[w])


def test_sliding_window_contains_tumbling(spark, sf_small):
    """Every tumbling 1-min window is also a sliding window (:00 starts),
    with identical counts."""
    tumbling = {
        r.window_start: r.unique_users
        for r in SPECS["unique_users_per_minute"].fn(spark, sf_small).collect()
    }
    sliding = {
        r.window_start: r.unique_users
        for r in SPECS["unique_users_sliding_window"].fn(spark, sf_small).collect()
    }
    for w, n in tumbling.items():
        assert sliding.get(w) == n, (w, n, sliding.get(w))


def test_exact_dedup_partitions_corpus(spark, sf_small):
    """Dedup groups partition the corpus: copies sum to the doc count and
    canonical ids are real doc ids."""
    rows = SPECS["dedup_exact_documents"].fn(spark, sf_small).collect()
    docs = table(spark, sf_small, "documents")
    assert sum(r.n_copies for r in rows) == docs.count()
    doc_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert all(r.canonical_doc_id in doc_ids for r in rows)


def test_lsh_recall_of_high_jaccard_pairs(spark, sf_small):
    """MinHash-LSH (16 hashes, 8 bands x 2) must recall essentially every
    pair with 3-gram Jaccard >= 0.6: P(miss) = (1-j^2)^8 <= 0.013."""
    true_pairs = {
        (r.doc_a, r.doc_b)
        for r in SPECS["dedup_ngram_jaccard"].fn(spark, sf_small).collect()
        if r.jaccard >= 0.6
    }
    candidates = {
        (r.doc_a, r.doc_b)
        for r in SPECS["dedup_minhash_lsh"].fn(spark, sf_small).collect()
    }
    missed = true_pairs - candidates
    assert len(missed) <= max(1, int(0.05 * len(true_pairs))), (
        f"LSH missed {len(missed)}/{len(true_pairs)} high-jaccard pairs: {missed}"
    )


def test_session_windows_partition_user_events(spark, sf_small):
    """Session windows partition each user's events."""
    rows = SPECS["session_windows_per_user"].fn(spark, sf_small).collect()
    events = table(spark, sf_small, "events")
    per_user_truth = {
        r.user_id: r.c
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    per_user = {}
    for r in rows:
        per_user[r.user_id] = per_user.get(r.user_id, 0) + r.n_events
    assert per_user == per_user_truth


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    )
)
def test_decimal_sum_is_order_independent(shared_spark, values):
    """dec_sum equals the exact Decimal sum of the 6-dp-quantized inputs,
    regardless of row order/partitioning (the property plain double sums
    lack, and the reason cross-engine hashes match)."""
    spark = shared_spark
    df = spark.createDataFrame([(v,) for v in values], "x double").repartition(4)
    got = df.agg(dec_sum("x", "s")).collect()[0].s
    # Decimal(v) is the EXACT binary expansion + HALF_UP — precisely
    # Spark's double->decimal cast semantics.
    expected = float(
        sum(
            Decimal(v).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
            for v in values
        )
    )
    rev = (
        spark.createDataFrame([(v,) for v in reversed(values)], "x double")
        .repartition(7)
        .agg(dec_sum("x", "s"))
        .collect()[0]
        .s
    )
    assert got == rev
    assert got == pytest.approx(expected, rel=1e-12, abs=1e-6)


@pytest.fixture(scope="session")
def shared_spark(spark):
    # hypothesis needs a non-function-scoped handle to the session fixture.
    return spark


def test_approx_quantiles_within_rank_error(spark, sf_small):
    """approx_percentile(accuracy=10000) must sit within a small rank
    neighborhood of the exact interpolated percentile per group."""
    from pyspark.sql import functions as F

    from kafka_stream_processing_spark.sources.tables import table

    approx = {
        r["o_orderstatus"]: (r["p50_approx"], r["p90_approx"], r["p99_approx"])
        for r in SPECS["quality_approx_quantiles"].fn(spark, sf_small).collect()
    }
    exact_df = (
        table(spark, sf_small, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.expr(
                "percentile(o_totalprice, array(0.5, 0.9, 0.99))"
            ).alias("pcts"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .collect()
    )
    for r in exact_df:
        spread = r["hi"] - r["lo"]
        for got, want in zip(approx[r["o_orderstatus"]], r["pcts"]):
            # rank error 1/accuracy translates to a value tolerance of a
            # few % of the group's value spread on this distribution.
            assert abs(got - want) <= 0.05 * spread + 1e-9, (
                r["o_orderstatus"], got, want)
