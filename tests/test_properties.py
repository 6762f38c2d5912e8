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


def test_hash_split_partitions_and_is_stable(spark, sf_small):
    """The hash split partitions the corpus (every doc in exactly one
    split), holds proportions loosely around 80/10/10, and a document's
    assignment is a pure function of doc_id — recomputing on a shuffled,
    repartitioned copy yields the identical per-split totals."""
    from kafka_stream_processing_spark.operators.pipeline import split_assign
    from kafka_stream_processing_spark.sources.tables import table

    d = table(spark, sf_small, "documents")
    n = d.count()
    assigned = d.withColumn("split", split_assign(F.col("doc_id")))
    counts = {r.split: r.n for r in assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n
    assert 0.65 * n <= counts["train"] <= 0.95 * n, counts
    # Stability under physical reorganization.
    reshuffled = (
        d.repartition(7, "lang")
        .withColumn("split", split_assign(F.col("doc_id")))
        .groupBy("split").agg(F.count(F.lit(1)).alias("n"))
    )
    assert {r.split: r.n for r in reshuffled.collect()} == counts
    # Per-doc assignment identical, not just totals.
    a = {r.doc_id: r.split for r in assigned.select("doc_id", "split").collect()}
    b = {
        r.doc_id: r.split
        for r in d.repartition(13)
        .withColumn("split", split_assign(F.col("doc_id")))
        .select("doc_id", "split").collect()
    }
    assert a == b


def test_stratified_sample_exact_k_per_stratum(spark, sf_small):
    """The stratified sample returns exactly min(10, stratum size) docs
    per language, all ranks 1..k, drawn from the right stratum."""
    from kafka_stream_processing_spark.sources.tables import table

    sizes = {
        r.lang: r.n
        for r in table(spark, sf_small, "documents")
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = SPECS["sample_stratified_topn"].fn(spark, sf_small).collect()
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.rank)
    assert set(by_lang) == set(sizes)
    for lang, ranks in by_lang.items():
        k = min(10, sizes[lang])
        assert sorted(ranks) == list(range(1, k + 1)), (lang, ranks)


def test_pii_scrub_leaves_no_matches(spark, sf_small):
    """After scrubbing, the scrubbed text contains no email/phone pattern
    matches at all, and every injected doc (doc_id % 3 == 0) was found
    with exactly one email and one phone."""
    from kafka_stream_processing_spark.operators.pipeline import (
        _EMAIL_RE,
        _PHONE_RE,
        text_pii_scrub,
    )

    out = text_pii_scrub(spark, sf_small)
    rows = out.collect()
    for r in rows:
        expected = 1 if r.doc_id % 3 == 0 else 0
        assert r.n_emails == expected, (r.doc_id, r.n_emails)
        assert r.n_phones == expected, (r.doc_id, r.n_phones)
    # Re-run the scrubber ON the scrubbed text: zero matches remain.
    # The expression chain comes from the operator module itself
    # (pii_augmented/pii_scrubbed) so this assertion tracks the operator,
    # not a copy that could go stale.
    from kafka_stream_processing_spark.operators.pipeline import (
        pii_augmented,
        pii_scrubbed,
    )
    from kafka_stream_processing_spark.sources.tables import table

    d = table(spark, sf_small, "documents")
    scrubbed = pii_scrubbed(pii_augmented())
    residue = d.select(
        (
            F.size(F.regexp_extract_all(scrubbed, F.lit(_EMAIL_RE), F.lit(0)))
            + F.size(F.regexp_extract_all(scrubbed, F.lit(_PHONE_RE), F.lit(0)))
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert residue == 0


def test_gopher_filter_counts_are_consistent(spark, sf_small):
    """Per-language counters are internally consistent: kept docs can fail
    no rule, and n_keep + (docs failing >=1 rule) == n_docs; totals match
    the corpus."""
    from kafka_stream_processing_spark.sources.tables import table

    rows = SPECS["quality_gopher_filters"].fn(spark, sf_small).collect()
    n_corpus = table(spark, sf_small, "documents").count()
    assert sum(r.n_docs for r in rows) == n_corpus
    for r in rows:
        assert 0 <= r.n_keep <= r.n_docs
        for flag in ("n_fail_minlen", "n_fail_meanlen",
                     "n_fail_repetition", "n_fail_stopword"):
            assert 0 <= getattr(r, flag) <= r.n_docs - r.n_keep, (r, flag)


def test_hll_daily_merge_is_consistent_and_bounded(spark, sf_small):
    """The merged-daily-sketches estimate must (a) agree with a direct
    whole-period sketch within HLL error bounds and (b) land within 5%
    of the exact distinct count — the merge loses no more accuracy than
    the sketch itself."""
    from kafka_stream_processing_spark.sources.tables import table

    merged = (
        SPECS["sketch_hll_daily_merge"].fn(spark, sf_small).collect()[0]
    )
    events = table(spark, sf_small, "events")
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0].est
    exact = events.select("user_id").distinct().count()
    assert merged.n_days >= 2
    assert abs(merged.merged_unique_users - exact) <= max(2, 0.05 * exact)
    assert abs(direct - exact) <= max(2, 0.05 * exact)
    assert abs(merged.merged_unique_users - direct) <= max(2, 0.05 * exact)


def test_ann_variants_recall_bruteforce_topk(spark, sf_small):
    """Structural-recall floors for the approximate similarity paths vs
    the exact brute-force top-10.  Measured recall (deterministic, fixed
    planes / TRAINED centroids): LSH-bucketed 8/50 at sf0.001
    (single-probe, 4 planes -> 1/16 of the corpus scored: cheap and
    proportionally accurate; multi-probe or more bands is the recall
    knob), IVF nprobe=2 of 8 cells: 46/50 with the trained coarse
    quantizer — up from 26/50 on the old fixed-seed stand-in centroids,
    the measured payoff of closing the trainer→index loop.  The floors
    below are set well under the measured values — they catch structural
    regressions (wrong bucket join, empty probe), not tuning drift."""
    bf = {}
    for r in SPECS["similarity_bruteforce_topk"].fn(spark, sf_small).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    floors = {
        "similarity_lsh_bucketed_topk": 0.08,
        "similarity_ivf_probed_topk": 0.5,
    }
    for variant, floor in floors.items():
        approx = {}
        for r in SPECS[variant].fn(spark, sf_small).collect():
            approx.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert approx.keys() == bf.keys(), variant
        total = sum(len(v) for v in bf.values())
        hit = sum(len(bf[q] & approx[q]) for q in bf)
        assert hit >= floor * total, (variant, hit, total)


def test_funnel_counts_are_monotonic(spark, sf_small):
    """Conversions are a subset of the entry step, and the total gap is
    positive only when conversions exist."""
    r = SPECS["funnel_click_to_purchase"].fn(spark, sf_small).collect()[0]
    assert 0 <= r.n_converted <= r.n_clicked
    assert (r.total_gap_us or 0) >= 0
    assert (r.n_converted == 0) == (r.total_gap_us is None or r.total_gap_us == 0)


def test_mixture_samples_are_nested_supersets(spark, sf_small):
    """The docstring's nested-sample claim, tested: a document accepted
    at rate p stays accepted at every rate >= p (bucket is fixed per
    doc), so mixture ablations are supersets of each other."""
    from kafka_stream_processing_spark.operators.dedup import hash64
    from kafka_stream_processing_spark.sources.tables import table

    d = table(spark, sf_small, "documents").select(
        "doc_id", (hash64(F.col("doc_id").cast("string")) % 100).alias("bucket")
    )
    rows = d.collect()
    at_25 = {r.doc_id for r in rows if r.bucket < 25}
    at_50 = {r.doc_id for r in rows if r.bucket < 50}
    at_100 = {r.doc_id for r in rows}
    assert at_25 <= at_50 <= at_100
    assert len(at_25) < len(at_50) < len(at_100)


def test_snapshot_diff_classes_partition_both_sides(spark, sf_small):
    """added + changed + identical == |now|;
    removed + changed + identical == |prev| — the diff classes exactly
    partition both snapshots."""
    from kafka_stream_processing_spark.sources.tables import table

    r = SPECS["quality_snapshot_diff"].fn(spark, sf_small).collect()[0]
    n_events = table(spark, sf_small, "events").count()
    n_now = n_events
    # prev = events minus every-101st key plus every-103rd phantom.
    ev = table(spark, sf_small, "events")
    n_prev = (
        ev.filter(F.col("event_id") % 101 != 0).count()
        + ev.filter(F.col("event_id") % 103 == 0).count()
    )
    assert r.n_added + r.n_changed + r.n_identical == n_now
    assert r.n_removed + r.n_changed + r.n_identical == n_prev
    assert r.n_added > 0 and r.n_removed > 0 and r.n_changed > 0
