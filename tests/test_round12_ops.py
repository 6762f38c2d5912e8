"""Round-12 operator tests: property pins for the five r12
registrations (all five also ride the full oracle-parity differential
in tests/test_oracle_parity.py automatically).
"""

from __future__ import annotations

import math


def test_gries_dp_bounds_and_even_term(spark, sf_small):
    """DP ∈ [0, 1); DP_norm ≥ DP; a term present in every part with
    frequency proportional to part size would have DP ≈ 0 — check the
    minimum is small for the corpus-wide stop-word-like terms; tf sums
    to the corpus token count."""
    from kafka_stream_processing_spark.operators.corpus import (
        corpus_term_dispersion_gries_dp,
    )

    out = corpus_term_dispersion_gries_dp(spark, sf_small).toPandas()
    assert ((out["dp"] >= 0) & (out["dp"] < 1)).all()
    assert (out["dp_norm"] >= out["dp"] - 1e-12).all()
    assert (out["n_parts"] >= 1).all()
    # tf accounting: Σ tf over terms = total corpus tokens
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    from pyspark.sql import functions as F

    n_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    assert int(out["tf"].sum()) == int(n_tokens)


def test_simpson_reversal_overall_row_consistency(spark, sf_small):
    """The stratum −1 row must equal the column sums of the stratum
    rows; reversed is pinned false on the pooled row; assoc_sign
    agrees with the rate comparison recomputed in pandas."""
    from kafka_stream_processing_spark.operators.quality_audit import (
        quality_simpson_reversal_audit,
    )

    out = quality_simpson_reversal_audit(spark, sf_small).toPandas()
    overall = out[out["stratum"] == -1].iloc[0]
    per = out[out["stratum"] >= 0]
    for c in ("n_a", "s_a", "n_b", "s_b"):
        assert int(per[c].sum()) == int(overall[c])
    assert not bool(overall["reversed"])
    for _, row in out.iterrows():
        cross = row["s_a"] * row["n_b"] - row["s_b"] * row["n_a"]
        want = 0 if cross == 0 else (1 if cross > 0 else -1)
        assert int(row["assoc_sign"]) == want
        if row["stratum"] >= 0 and row["assoc_sign"] != 0 and overall[
            "assoc_sign"
        ] != 0:
            assert bool(row["reversed"]) == (
                int(row["assoc_sign"]) != int(overall["assoc_sign"])
            )


def test_anisotropy_identities(spark, sf_small):
    """Energy ratios are shares: 0 ≤ common_direction_energy ≤ 1 (by
    Cauchy–Schwarz / Jensen ‖μ‖² ≤ E[‖x‖²]); var_max_share ∈ (0, 1];
    var_total ≈ mean_sq_norm − mu_sq_norm (the variance decomposition,
    up to the round-12 quantization)."""
    from kafka_stream_processing_spark.operators.similarity import (
        embedding_anisotropy_common_direction,
    )

    row = embedding_anisotropy_common_direction(spark, sf_small).toPandas()
    assert len(row) == 1
    r = row.iloc[0]
    assert int(r["dim"]) == 64
    assert 0.0 <= r["common_direction_energy"] <= 1.0
    assert 0.0 < r["var_max_share"] <= 1.0
    assert math.isclose(
        r["var_total"],
        r["mean_sq_norm"] - r["mu_sq_norm"],
        rel_tol=1e-6,
        abs_tol=1e-6,
    )
    assert math.isclose(
        r["common_direction_energy"],
        r["mu_sq_norm"] / r["mean_sq_norm"],
        rel_tol=1e-12,
    )


def test_fellegi_sunter_properties(spark, sf_small):
    """3 field rows; m > u for every field under the symmetric init
    (agreement evidence must point toward match); weights have the
    right signs (w_agree > 0 > w_disagree); est_match_share ∈ (0, 1)
    and identical across rows; candidate count is n·W-linear (≤ rows ×
    FS_WINDOW)."""
    from kafka_stream_processing_spark.operators.dedup import (
        FS_WINDOW,
        dedup_fellegi_sunter_linkage,
    )

    out = dedup_fellegi_sunter_linkage(spark, sf_small).toPandas()
    assert sorted(out["field"]) == [
        "acctbal_bucket",
        "acctbal_cents",
        "mktsegment",
    ]
    assert (out["m"] > out["u"]).all()
    assert (out["w_agree"] > 0).all()
    assert (out["w_disagree"] < 0).all()
    shares = set(out["est_match_share"])
    assert len(shares) == 1
    assert 0.0 < out["est_match_share"].iloc[0] < 1.0
    # Recompute the sorted-neighborhood candidate count and assert the
    # actual n·W linearity bound (each record pairs with at most its
    # next FS_WINDOW in-block neighbors) — not a structural tautology.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{sf_small}/customer.parquet")
    n_cust = cust.count()
    ranked = cust.select("c_custkey", "c_nationkey").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("c_nationkey").orderBy("c_custkey")
        ),
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    n_pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("b.rn") > F.col("a.rn"))
        & (F.col("b.rn") <= F.col("a.rn") + FS_WINDOW),
    ).count()
    assert 0 < n_pairs <= n_cust * FS_WINDOW


def test_unigram_em_segmentation_accounting(spark, sf_small):
    """Probabilities sum to 1 (round-12); every piece is 1-2 chars;
    Σ cnt·len over pieces = total characters of all word occurrences
    (a Viterbi segmentation is a partition — no char lost or duplicated
    regardless of which path won)."""
    from pyspark.sql import functions as F

    from kafka_stream_processing_spark.operators.tokenizer import (
        UNIGRAM_WORD_MAX_LEN,
        tokenizer_unigram_em,
    )

    out = tokenizer_unigram_em(spark, sf_small).toPandas()
    assert set(out["piece_len"]) <= {1, 2}
    assert abs(out["prob"].sum() - 1.0) < 1e-9
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    chars = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(
            (F.length("w") >= 1) & (F.length("w") <= UNIGRAM_WORD_MAX_LEN)
        )
        .select(F.sum(F.length("w")).alias("n"))
        .collect()[0]["n"]
    )
    assert int((out["cnt"] * out["piece_len"]).sum()) == int(chars)
    # new_score is the round-12 ln of the FULL-PRECISION ratio
    # cnt/total (not of the round-12 prob column)
    total = int(out["cnt"].sum())
    for _, r in out.iterrows():
        want = round(math.log(int(r["cnt"]) / total), 12)
        assert abs(r["new_score"] - want) < 1e-11


def test_script_mix_partition(spark, sf_small):
    """Class counts partition the character count: all nonnegative and
    Σ class counts + n_other = n_chars; n_chars matches length(text)."""
    from kafka_stream_processing_spark.operators.text import (
        SCRIPT_CLASSES,
        text_script_mix_profile,
    )

    out = text_script_mix_profile(spark, sf_small).toPandas()
    cols = [f"n_{k}" for k in SCRIPT_CLASSES] + ["n_other"]
    for c in cols:
        assert (out[c] >= 0).all(), c
    assert (out[cols].sum(axis=1) == out["n_chars"]).all()


def test_t_closeness_bounds_and_flag(spark, sf_small):
    """TVD ∈ [0, 1]; violates_t agrees with tvd > 0.2 recomputed in
    pandas; group sizes sum to corpus size."""
    from kafka_stream_processing_spark.operators.quality_audit import (
        quality_t_closeness_audit,
    )

    out = quality_t_closeness_audit(spark, sf_small).toPandas()
    assert ((out["tvd"] >= 0) & (out["tvd"] <= 1)).all()
    for _, r in out.iterrows():
        assert bool(r["violates_t"]) == (r["tvd"] > 0.2)
    n_docs = spark.read.parquet(f"{sf_small}/documents.parquet").count()
    assert int(out["k"].sum()) == n_docs


def test_jackknife_matches_numpy_replay(spark, sf_small):
    """The jackknife SE must match a pandas/numpy replay of the same
    formula from the same per-source totals (round-12 tolerances)."""
    import math

    from pyspark.sql import functions as F

    from kafka_stream_processing_spark.operators.quality_audit import (
        quality_jackknife_source_variance,
    )

    out = quality_jackknife_source_variance(spark, sf_small).toPandas()
    assert len(out) == 1
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    per = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.sum(F.size(F.split("text", " "))).alias("s_i"),
        )
        .toPandas()
    )
    g = len(per)
    n, s = per["n_i"].sum(), per["s_i"].sum()
    ti = [
        round((s - si) / (n - ni), 12)
        for si, ni in zip(per["s_i"], per["n_i"])
    ]
    tbar = sum(ti) / g
    var = (g - 1) / g * sum(round((t - tbar) ** 2, 12) for t in ti)
    r = out.iloc[0]
    assert int(r["g"]) == g and int(r["n_docs"]) == n
    assert abs(r["theta_hat"] - round(s / n, 12)) < 1e-9
    assert abs(r["jk_se"] - round(math.sqrt(var), 12)) < 1e-9


def test_group_kfold_leakage_free_and_complete(spark, sf_small):
    """Fold shares sum to 1; doc/source counts sum to corpus totals;
    re-deriving the assignment per document confirms every doc of a
    source shares its fold (structural, since fold is a function of
    source — this guards the hash mirror)."""
    from kafka_stream_processing_spark.operators.dedup import hash64
    from kafka_stream_processing_spark.operators.pipeline import (
        GROUP_KFOLD_K,
        sample_group_kfold_hash,
    )
    from pyspark.sql import functions as F

    out = sample_group_kfold_hash(spark, sf_small).toPandas()
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    assert int(out["n_docs"].sum()) == docs.count()
    assert abs(out["doc_share"].sum() - 1.0) < 1e-9
    assert set(out["fold"]) <= set(range(GROUP_KFOLD_K))
    per_doc = docs.select(
        (hash64(F.col("source")) % GROUP_KFOLD_K).alias("fold"), "source"
    )
    assert (
        per_doc.groupBy("source")
        .agg(F.countDistinct("fold").alias("d"))
        .filter(F.col("d") > 1)
        .count()
        == 0
    )


def test_ams_join_size_truth_and_linearity(spark, sf_small):
    """join_true must equal the exact pandas recomputation; the sketch
    estimate must be within the AMS error envelope for this geometry
    (generous bound — the pinned cross-engine value is what the oracle
    checks); sketches built on split halves of A must sum to the full
    sketch (linearity)."""
    from pyspark.sql import functions as F

    from kafka_stream_processing_spark.operators.corpus import (
        ams_z,
        sketch_ams_join_size_estimate,
    )

    out = sketch_ams_join_size_estimate(spark, sf_small).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    ev = spark.read.parquet(f"{sf_small}/events.parquet").toPandas()
    ca = ev[ev.event_type == "click"].groupby("user_id").size()
    cb = ev[ev.event_type == "purchase"].groupby("user_id").size()
    want = int((ca * cb).dropna().sum())
    assert int(r["join_true"]) == want
    assert abs(r["rel_err"]) < 5.0  # envelope, not precision, at tiny sf
    # linearity: Z(first half) + Z(second half) == Z(all)
    a = (
        spark.read.parquet(f"{sf_small}/events.parquet")
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").cast("string").alias("item"),
                "event_id")
    )
    z_all = ams_z(a.select("item")).toPandas().set_index("r")["zr"]
    z1 = ams_z(
        a.filter(F.col("event_id") % 2 == 0).select("item")
    ).toPandas().set_index("r")["zr"]
    z2 = ams_z(
        a.filter(F.col("event_id") % 2 == 1).select("item")
    ).toPandas().set_index("r")["zr"]
    merged = z1.add(z2, fill_value=0)
    assert (merged.sort_index() == z_all.sort_index()).all()


def test_periodogram_parseval_and_dominance(spark, sf_small):
    """Exactly one dominant row; power ≥ 0 everywhere; the dominant
    period has max power with smallest-period tie-break; n_days
    constant across rows."""
    from kafka_stream_processing_spark.operators.windowed import (
        window_periodogram_daily,
    )

    out = window_periodogram_daily(spark, sf_small).toPandas()
    assert (out["power"] >= 0).all()
    assert len(set(out["n_days"])) == 1
    dom = out[out["is_dominant"]]
    assert len(dom) == 1
    pmax = out["power"].max()
    best = out[out["power"] == pmax].sort_values("period").iloc[0]
    assert int(dom.iloc[0]["period"]) == int(best["period"])


def test_fleiss_kappa_replay(spark, sf_small):
    """Replay Fleiss' kappa in pandas from the same three raters and
    compare; kappa ≤ 1 always; pbar/pe in [0,1]."""
    from kafka_stream_processing_spark.operators.text import (
        quality_fleiss_kappa_langid,
        text_language_id,
    )

    out = quality_fleiss_kappa_langid(spark, sf_small).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    preds = text_language_id(spark, sf_small).toPandas()
    rows = list(zip(preds["labeled_lang"], preds["predicted_lang"]))
    n = len(rows)
    s = sum(
        3 + 2 * ((a == b) + (a == "en") + (b == "en")) for a, b in rows
    )
    from collections import Counter

    cats = Counter()
    for a, b in rows:
        cats[a] += 1
        cats[b] += 1
        cats["en"] += 1
    e = sum(c * c for c in cats.values())
    pbar = (s - 3 * n) / (6 * n)
    pe = e / (3 * n) ** 2
    kappa = (pbar - pe) / (1 - pe)
    assert int(r["n_docs"]) == n
    assert 0.0 <= r["pbar"] <= 1.0 and 0.0 <= r["pe"] <= 1.0
    assert r["kappa"] <= 1.0
    assert abs(r["pbar"] - pbar) < 1e-12
    assert abs(r["pe"] - pe) < 1e-12
    assert abs(r["kappa"] - kappa) < 1e-12
