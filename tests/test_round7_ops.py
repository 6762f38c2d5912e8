"""Round-7 operators: winsorized moments, streaming Benford monitor,
incremental split-leakage audit, bucketed co-located join."""

from __future__ import annotations

import os

import duckdb
import pyspark.sql.functions as F

from kafka_stream_processing_spark.registry import all_specs

SPECS = all_specs()


# ------------------------------------------------- winsorized moments


def test_winsorized_exact_equals_approx_and_python_reference(
    spark, sf_small
):
    exact = SPECS["quality_winsorized_stats"].fn(spark, sf_small).collect()
    approx = (
        SPECS["quality_winsorized_stats"]
        .fn(spark, sf_small, frontier="approx")
        .collect()
    )
    assert [r.asDict() for r in exact] == [r.asDict() for r in approx]
    (row,) = exact
    # independent pure-Python reference
    con = duckdb.connect()
    vals = sorted(
        v
        for (v,) in con.execute(
            f"SELECT n_chars FROM '{sf_small}/documents.parquet'"
        ).fetchall()
    )
    n = len(vals)
    lo = vals[max(1, (n * 1 + 99) // 100) - 1]
    hi = vals[max(1, (n * 99 + 99) // 100) - 1]
    clamped = [min(max(v, lo), hi) for v in vals]
    mean = sum(clamped) / n
    var = (
        sum(v * v for v in clamped) - sum(clamped) ** 2 / n
    ) / (n - 1)
    assert row.n_docs == n
    assert (row.cut_lo, row.cut_hi) == (lo, hi)
    assert row.n_clipped_lo == sum(1 for v in vals if v < lo)
    assert row.n_clipped_hi == sum(1 for v in vals if v > hi)
    assert abs(row.win_mean - mean) < 1e-9
    assert abs(row.win_std - var**0.5) < 1e-9
    # winsorization tamed the tails: std can only shrink vs raw
    raw_mean = sum(vals) / n
    raw_var = (sum(v * v for v in vals) - sum(vals) ** 2 / n) / (n - 1)
    assert row.win_std <= raw_var**0.5 + 1e-12


# --------------------------------------------- streaming Benford gate


def test_stream_benford_three_chunks_full_frames(spark, sf_small):
    rows = SPECS["stream_benford_digit_monitor"].fn(spark, sf_small).collect()
    by_chunk: dict[int, list] = {}
    for r in rows:
        by_chunk.setdefault(r.chunk_min_event_id, []).append(r)
    # 3 micro-batches, each with the FULL 9-digit frame (absent digits
    # present with n_obs=0) and one chunk-level chi2/drift verdict
    assert len(by_chunk) == 3
    for chunk, rs in by_chunk.items():
        assert sorted(r.digit for r in rs) == list(range(1, 10))
        assert len({(r.chi2, r.drift) for r in rs}) == 1
        assert all(r.n_obs >= 0 for r in rs)
    # verdict is exactly the chi2-vs-critical compare (events.value
    # spans ~4 decades, so unlike lineitem prices it sits NEAR Benford
    # at this size — the gate must not fire spuriously, and must fire
    # iff chi2 crosses the dof=8 line)
    from kafka_stream_processing_spark.operators.quality_kernel import (
        CHI2_CRIT_005,
    )

    for rs in by_chunk.values():
        assert rs[0].drift == (rs[0].chi2 > CHI2_CRIT_005[8])


def test_stream_benford_histograms_reconcile_with_batch(spark, sf_small):
    rows = SPECS["stream_benford_digit_monitor"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    (want_total,) = con.execute(
        f"SELECT count(*) FROM '{sf_small}/events.parquet' WHERE value >= 1"
    ).fetchone()
    assert sum(r.n_obs for r in rows) == want_total


# -------------------------------------- incremental split leakage


def test_stream_split_leakage_equals_batch_audit_and_cleans_tmp(
    spark, sf_small
):
    key = sf_small.strip("/").replace("/", "_")
    root = os.path.join("/tmp", "kssp_leak_idx", key)
    before = set(os.listdir(root)) if os.path.isdir(root) else set()
    df = SPECS["stream_split_leakage_incremental"].fn(spark, sf_small)
    got = {
        (r.split_lo, r.split_hi): (r.is_leak, r.n_pairs, r.n_doc_slots)
        for r in df.collect()
    }
    after = set(os.listdir(root)) if os.path.isdir(root) else set()
    # completed run leaves no /tmp state; the result is checkpoint-backed
    assert after - before == set()
    want = {
        (r.split_lo, r.split_hi): (r.is_leak, r.n_pairs, r.n_doc_slots)
        for r in SPECS["pipeline_split_leakage_audit"]
        .fn(spark, sf_small)
        .collect()
    }
    assert got == want
    # re-trigger works after the run dir is gone (localCheckpoint)
    assert len(df.collect()) == len(got)


def test_minhash_band_rows_matches_lsh_kernel(spark, sf_small):
    """The extracted band kernel reproduces dedup_minhash_lsh's pair
    set when self-joined — guards the refactor."""
    from kafka_stream_processing_spark.operators.dedup import (
        minhash_band_rows,
    )
    from kafka_stream_processing_spark.sources.tables import table

    bands = minhash_band_rows(
        table(spark, sf_small, "documents").select("doc_id", "text")
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.mh0") == F.col("b.mh0"))
            & (F.col("a.mh1") == F.col("b.mh1"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r.doc_a, r.doc_b): r.n for r in pairs.collect()}
    want = {
        (r.doc_a, r.doc_b): r.n_shared_bands
        for r in SPECS["dedup_minhash_lsh"].fn(spark, sf_small).collect()
    }
    assert got == want and len(want) > 0


# ------------------------------------------------ bucketed join plan


def test_bucketed_join_no_shuffle_no_broadcast(spark, sf_small):
    from kafka_stream_processing_spark.operators.connectors import (
        bucketed_join_plan,
    )

    plan = bucketed_join_plan(spark, sf_small)
    lines = plan.splitlines()
    assert any("SortMergeJoin" in l for l in lines)
    # co-location: the join consumes bucket layout, never a shuffle
    assert not any(
        "Exchange hashpartitioning" in l or "ShuffleExchange" in l
        for l in lines
    )
    assert "Bucketed: true" in plan


# --------------------------------------------- nearest as-of join


def test_asof_nearest_python_replay(spark, sf_small):
    """Independent brute-force replay: for every purchase scan ALL the
    user's clicks within tolerance and apply the documented tie rules."""
    from kafka_stream_processing_spark.operators.relational import (
        ASOF_NEAREST_TOL_US,
    )

    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_id, user_id, event_type, epoch_us(ts) "
        f"FROM '{sf_small}/events.parquet'"
    ).fetchall()
    clicks: dict[str, list] = {}
    purchases = []
    for eid, uid, et, ts in ev:
        if et == "click":
            clicks.setdefault(uid, []).append((ts, eid))
        elif et == "purchase":
            purchases.append((eid, uid, ts))
    want = {}
    for eid, uid, pts in purchases:
        best = None
        for cts, cid in clicks.get(uid, []):
            ad = abs(cts - pts)
            if ad > ASOF_NEAREST_TOL_US:
                continue
            is_fwd = cts > pts
            key = (ad, is_fwd, cid if is_fwd else -cid)
            if best is None or key < best[0]:
                best = (key, cts, cid)
        want[eid] = (
            (best[1], best[2], best[1] - pts) if best else (None, None, None)
        )
    rows = SPECS["join_asof_nearest_click"].fn(spark, sf_small).collect()
    got = {
        r.event_id: (r.click_ts_us, r.click_id, r.delta_us) for r in rows
    }
    assert got == want and len(want) > 50


# --------------------------------------------- Simpson diversity


def test_simpson_diversity_bounds_and_reference(spark, sf_small):
    rows = {
        r.dimension: r
        for r in SPECS["quality_simpson_diversity"].fn(spark, sf_small).collect()
    }
    assert set(rows) == {"source", "lang", "word"}
    con = duckdb.connect()
    for dim, expr in (
        ("source", "source"),
        ("lang", "lang"),
        ("word", "unnest(string_split(text, ' '))"),
    ):
        counts = [
            c
            for (c,) in con.execute(
                f"SELECT count(*) FROM (SELECT {expr} AS g FROM "
                f"'{sf_small}/documents.parquet') GROUP BY g"
            ).fetchall()
        ]
        n = sum(counts)
        lam = sum(c * c for c in counts) / (n * n)
        r = rows[dim]
        assert r.n_groups == len(counts) and r.n_total == n
        assert abs(r.simpson - lam) < 1e-12
        assert abs(r.effective_n - 1 / lam) < 1e-9 * (1 / lam)
        # 1 <= effective_n <= n_groups always
        assert 1 - 1e-9 <= r.effective_n <= r.n_groups + 1e-9


# --------------------------------------------- leakage remediation


def test_leakage_remediation_clears_all_cross_split_pairs(spark, sf_small):
    """Sufficiency: after dropping the later member of every leaky
    pair, NO near-dup pair straddles two splits among kept docs."""
    from kafka_stream_processing_spark.operators.pipeline import (
        split_assign,
    )

    pairs = [
        (r.doc_a, r.doc_b)
        for r in SPECS["dedup_minhash_lsh"].fn(spark, sf_small).collect()
    ]
    # recover split labels via the engine's own expression
    from kafka_stream_processing_spark.sources.tables import table

    lab = (
        table(spark, sf_small, "documents")
        .select("doc_id", split_assign(F.col("doc_id")).alias("split"))
        .collect()
    )
    split_of = {r.doc_id: r.split for r in lab}
    dropped = {b for a, b in pairs if split_of[a] != split_of[b]}
    for a, b in pairs:
        if a in dropped or b in dropped:
            continue
        assert split_of[a] == split_of[b], (a, b)
    ledger = {
        r.split: (r.n_docs, r.n_dropped, r.n_kept)
        for r in SPECS["pipeline_leakage_remediation"]
        .fn(spark, sf_small)
        .collect()
    }
    assert sum(v[1] for v in ledger.values()) == len(dropped)
    for split, (n, nd, nk) in ledger.items():
        assert n == nd + nk


# --------------------------------------------- Mann-Whitney drift


def test_mannwhitney_python_reference(spark, sf_small):
    """Pure-Python midrank rank-sum replay (independent of the
    histogram/cumulative formulation) + range invariants."""
    rows = SPECS["quality_mannwhitney_drift"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    data = con.execute(
        f"SELECT source, n_chars FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    ref = sorted(v for s, v in data if s == "src0")
    by_src: dict[str, list] = {}
    for s, v in data:
        if s != "src0":
            by_src.setdefault(s, []).append(v)
    assert {r.source for r in rows} == set(by_src)
    for r in rows:
        b = sorted(by_src[r.source])
        combined = sorted(ref + b)
        # midranks via first/last occurrence
        from collections import Counter

        cnt = Counter(combined)
        midrank = {}
        pos = 0
        for v in sorted(cnt):
            m = cnt[v]
            midrank[v] = pos + (m + 1) / 2
            pos += m
        rb = sum(midrank[v] for v in b)
        nb, na = len(b), len(ref)
        u = rb - nb * (nb + 1) / 2
        assert r.n_ref == na and r.n_src == nb
        assert r.u2 == round(2 * u)
        assert 0 <= r.u2 <= 2 * na * nb
        n = na + nb
        tie = sum(m**3 - m for m in cnt.values())
        sigma = (
            (na * nb / 12) * ((n + 1) - tie / (n * (n - 1)))
        ) ** 0.5
        z = (u - na * nb / 2) / sigma
        assert abs(r.z - z) < 1e-9
        from kafka_stream_processing_spark.operators.quality_rank import (
            MWU_Z_CRIT_005,
        )

        assert r.drift == (abs(r.z) > MWU_Z_CRIT_005)
