"""Round-7 eighth wave: the K-sample / effect-size completion of the
drift family — Kruskal-Wallis omnibus, Cliff's delta, Welch's t.

Each test replays the statistic in plain Python with the TEXTBOOK
per-row definition (sorting raw values / scanning raw pairs), i.e. a
deliberately different algorithm from the engine's count-of-counts
histogram kernels; the DuckDB differential is covered by the
oracle-parity sweep separately.
"""

from __future__ import annotations

import itertools
import math
import statistics

import duckdb

from kafka_stream_processing_spark.registry import all_specs

SPECS = all_specs()


def _lengths_by_source(sf_dir: str) -> dict[str, list[int]]:
    rows = duckdb.connect().execute(
        f"SELECT source, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    out: dict[str, list[int]] = {}
    for s, v in rows:
        out.setdefault(s, []).append(int(v))
    return out


def _midranks(values: list[int]) -> list[float]:
    """Textbook midranks of a pooled sample (1-based, ties averaged)."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while (
            j + 1 < len(order)
            and values[order[j + 1]] == values[order[i]]
        ):
            j += 1
        mid = (i + 1 + j + 1) / 2.0
        for k in range(i, j + 1):
            ranks[order[k]] = mid
        i = j + 1
    return ranks


def test_kruskal_wallis_textbook_replay(spark, sf_small):
    """H from raw pooled midranks (sort-based) must match the engine's
    histogram/doubled-midrank form to float tolerance, and the exact
    integer fields must match exactly."""
    by_src = _lengths_by_source(sf_small)
    pooled = [v for vs in by_src.values() for v in vs]
    ranks = _midranks(pooled)
    # per-group rank sums, walking the pooled order
    sums: dict[str, float] = {s: 0.0 for s in by_src}
    idx = 0
    flat_src = [s for s, vs in by_src.items() for _ in vs]
    for s, r in zip(flat_src, ranks):
        sums[s] += r
    n = len(pooled)
    h = (
        12.0 / (n * (n + 1))
        * sum(sums[s] ** 2 / len(by_src[s]) for s in by_src)
        - 3 * (n + 1)
    )
    from collections import Counter

    cnt = Counter(pooled)
    tie = sum(m**3 - m for m in cnt.values())
    h_c = h / (1 - tie / (n**3 - n))

    row = SPECS["quality_kruskal_wallis_drift"].fn(
        spark, sf_small
    ).collect()[0]
    assert row.k == len(by_src)
    assert row.n == n
    assert row.dof == len(by_src) - 1
    assert abs(row.h - h) < 1e-6
    assert abs(row.h_tie_corrected - h_c) < 1e-6
    assert row.drift == (row.h_tie_corrected > row.critical_005)


def test_cliffs_delta_bruteforce_pairs(spark, sf_small):
    """delta per source from the O(n_a*n_b) raw pair scan the engine's
    two-window histogram form avoids."""
    by_src = _lengths_by_source(sf_small)
    ref = by_src["src0"]
    rows = SPECS["quality_cliffs_delta_effect"].fn(
        spark, sf_small
    ).collect()
    got = {r.source: r for r in rows}
    assert set(got) == set(by_src) - {"src0"}
    for s, vs in by_src.items():
        if s == "src0":
            continue
        gt = sum(1 for b, a in itertools.product(vs, ref) if b > a)
        lt = sum(1 for b, a in itertools.product(vs, ref) if b < a)
        r = got[s]
        assert (r.n_gt, r.n_lt) == (gt, lt)
        assert (r.n_ref, r.n_src) == (len(ref), len(vs))
        delta = (gt - lt) / (len(ref) * len(vs))
        assert abs(r.delta - delta) < 1e-12
        mag = (
            "negligible"
            if abs(delta) < 0.147
            else "small"
            if abs(delta) < 0.33
            else "medium"
            if abs(delta) < 0.474
            else "large"
        )
        assert r.magnitude == mag


def test_welch_ttest_statistics_replay(spark, sf_small):
    """t and the Welch-Satterthwaite dof from statistics.mean/variance
    (a different accumulation path from the engine's integer moments)."""
    by_src = _lengths_by_source(sf_small)
    ref = by_src["src0"]
    ma, va, na = statistics.mean(ref), statistics.variance(ref), len(ref)
    rows = SPECS["quality_welch_ttest_drift"].fn(
        spark, sf_small
    ).collect()
    got = {r.source: r for r in rows}
    for s, vs in by_src.items():
        if s == "src0":
            continue
        mb, vb, nb = (
            statistics.mean(vs),
            statistics.variance(vs),
            len(vs),
        )
        se2 = va / na + vb / nb
        t = (mb - ma) / math.sqrt(se2)
        dof = se2**2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
        r = got[s]
        assert (r.n_ref, r.n_src) == (na, nb)
        assert abs(r.mean_ref - ma) < 1e-9
        assert abs(r.mean_src - mb) < 1e-9
        assert abs(r.t - t) < 1e-9
        assert abs(r.dof_welch - dof) < 1e-6
        assert r.drift == (abs(r.t) > 1.959963984540054)


def test_mwu_and_kw_agree_on_two_groups(spark, sf_small):
    """Consistency across the family: for any single source, the
    Kruskal-Wallis H restricted to {src0, s} equals z² from the
    Mann-Whitney gate (the classic KW(2 groups) == U-test identity),
    checked via the tie-corrected forms on raw data."""
    by_src = _lengths_by_source(sf_small)
    mwu = {
        r.source: r
        for r in SPECS["quality_mannwhitney_drift"].fn(
            spark, sf_small
        ).collect()
    }
    s = sorted(mwu)[0]
    pooled = by_src["src0"] + by_src[s]
    ranks = _midranks(pooled)
    na = len(by_src["src0"])
    r1 = sum(ranks[:na])
    r2 = sum(ranks[na:])
    n = len(pooled)
    h = (
        12.0 / (n * (n + 1))
        * (r1**2 / na + r2**2 / (n - na))
        - 3 * (n + 1)
    )
    from collections import Counter

    tie = sum(m**3 - m for m in Counter(pooled).values())
    h_c = h / (1 - tie / (n**3 - n))
    assert abs(h_c - mwu[s].z ** 2) < 1e-6


# ----------------------------------------------- survival additions


def _lifetimes(sf_dir: str) -> list[tuple[int, int, int]]:
    """(user_id, t_days, censored) lifetimes replayed from raw events."""
    rows = duckdb.connect().execute(
        f"""
        SELECT user_id,
               CAST(max(CAST(date_trunc('day', ts) AS DATE))
                    - min(CAST(date_trunc('day', ts) AS DATE)) AS INT),
               max(CAST(date_trunc('day', ts) AS DATE))
        FROM '{sf_dir}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    horizon = max(r[2] for r in rows)
    return [
        (int(u), int(t), 1 if d1 == horizon else 0) for u, t, d1 in rows
    ]


def test_nelson_aalen_textbook_replay(spark, sf_small):
    """H(t) and Klein's variance from a plain per-step loop over raw
    lifetimes (the engine computes them from windowed risk tables)."""
    life = _lifetimes(sf_small)
    n = len(life)
    from collections import Counter

    deaths = Counter(t for _, t, c in life if c == 0)
    cens = Counter(t for _, t, c in life if c == 1)
    times = sorted(set(deaths) | set(cens))
    rows = SPECS["window_nelson_aalen_hazard"].fn(
        spark, sf_small
    ).collect()
    got = {r.t_days: r for r in rows}
    at_risk = n
    cum_h = 0.0
    cum_v = 0.0
    seen = set()
    for t in times:
        d, c = deaths.get(t, 0), cens.get(t, 0)
        if d > 0:
            cum_h += round(d / at_risk, 6)
            cum_v += round(
                (at_risk - d) * d / (at_risk**3), 12
            )
            r = got[t]
            seen.add(t)
            assert r.n_at_risk == at_risk
            assert (r.d_events, r.c_censored) == (d, c)
            assert abs(r.hazard_step - d / at_risk) < 1e-12
            assert abs(r.cum_hazard - cum_h) < 1e-9
            assert abs(r.cum_var - cum_v) < 1e-12
        at_risk -= d + c
    assert seen == set(got)


def test_logrank_textbook_replay(spark, sf_small):
    """O/E/V from the per-time hypergeometric loop over raw lifetimes
    split by user-id parity."""
    import math

    life = _lifetimes(sf_small)
    groups = {0: [], 1: []}
    for u, t, c in life:
        groups[u % 2].append((t, c))
    times = sorted({t for g in groups.values() for t, _ in g})
    n1 = len(groups[0])
    n2 = len(groups[1])
    r1, r2 = n1, n2
    o1 = 0
    e1 = 0.0
    v = 0.0
    for t in times:
        d1 = sum(1 for tt, c in groups[0] if tt == t and c == 0)
        c1 = sum(1 for tt, c in groups[0] if tt == t and c == 1)
        d2 = sum(1 for tt, c in groups[1] if tt == t and c == 0)
        c2 = sum(1 for tt, c in groups[1] if tt == t and c == 1)
        d, nn = d1 + d2, r1 + r2
        if d > 0 and nn > 1:
            o1 += d1
            e1 += round(d * r1 / nn, 6)
            v += round(
                (d * r1 / nn) * (1 - r1 / nn) * ((nn - d) / (nn - 1)),
                12,
            )
        r1 -= d1 + c1
        r2 -= d2 + c2
    row = SPECS["window_logrank_test_cohorts"].fn(
        spark, sf_small
    ).collect()[0]
    assert (row.n_users_a, row.n_users_b) == (n1, n2)
    assert row.o_a == o1
    assert abs(row.e_a - e1) < 1e-9
    assert abs(row.v - v) < 1e-9
    z = (o1 - e1) / math.sqrt(v)
    assert abs(row.z - z) < 1e-9
    assert row.survival_differs == (abs(row.z) > 1.959963984540054)


# ----------------------------------------------- NDCG sweep


def test_ndcg_sweep_monotone_and_perfect_at_full_probe(spark, sf_small):
    """Candidates rank by EXACT cosine, so the curve is non-decreasing
    in nprobe; probing all 8 cells recovers the exact top-k in exact
    order, so ndcg@nprobe=8 == 1 (up to the round-12 term quantization
    shared with the IDCG literal); dcg/ndcg tie to the IDCG constant;
    and wherever the recall sweep reports recall == 1 the NDCG sweep
    must report ndcg == 1 (same candidates, same exact ordering)."""
    from kafka_stream_processing_spark.operators.similarity import (
        NDCG_IDCG,
        RECALL_SWEEP_NPROBES,
    )

    rows = SPECS["similarity_ndcg_eval"].fn(spark, sf_small).collect()
    by_q: dict[int, dict[int, tuple[int, float, float]]] = {}
    for r in rows:
        assert abs(r.ndcg - r.dcg / NDCG_IDCG) < 1e-12
        assert -1e-12 < r.ndcg < 1 + 1e-9
        by_q.setdefault(r.query_id, {})[r.nprobe] = (
            r.n_candidates,
            r.ndcg,
        )
    recall = {
        (r.query_id, r.nprobe): r.recall
        for r in SPECS["similarity_ann_recall_eval"].fn(
            spark, sf_small
        ).collect()
    }
    for q, curve in by_q.items():
        assert set(curve) == set(RECALL_SWEEP_NPROBES)
        ordered = [curve[n] for n in sorted(curve)]
        for (c1, g1), (c2, g2) in zip(ordered, ordered[1:]):
            assert c2 >= c1, q
            assert g2 >= g1 - 1e-12, q
        assert abs(curve[8][1] - 1.0) < 1e-9, q
        for nprobe in RECALL_SWEEP_NPROBES:
            if recall[(q, nprobe)] == 1.0:
                assert abs(curve[nprobe][1] - 1.0) < 1e-9, (q, nprobe)


def test_km_na_risk_table_reuse(spark, sf_small):
    """The KM curve and the NA hazard must agree on the shared risk
    set: joining on t_days, n_at_risk and d_events are identical (NA
    keeps absorbed steps; KM drops them — so compare on the KM rows)."""
    km = {
        r.t_days: r
        for r in SPECS["window_kaplan_meier_retention"].fn(
            spark, sf_small
        ).collect()
    }
    na = {
        r.t_days: r
        for r in SPECS["window_nelson_aalen_hazard"].fn(
            spark, sf_small
        ).collect()
    }
    assert set(km) <= set(na)
    for t, kr in km.items():
        assert na[t].n_at_risk == kr.n_at_risk
        assert na[t].d_events == kr.d_events


# ----------------------------------------------- calibration / clustering


def test_ece_python_replay_and_brier_bin_consistency(spark, sf_small):
    """ECE/MCE replayed from raw documents with a dict loop, and the
    reliability table (f_pred, obs_rate per bin) must agree exactly
    with the Brier op's — one diagram, three scores."""
    from kafka_stream_processing_spark.operators.quality_calibration import (
        ISO_BIN_CHARS,
        ISO_TOKEN_THRESHOLD,
    )

    docs = duckdb.connect().execute(
        f"SELECT n_chars, text, source FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    train: dict[int, list[int]] = {}
    test: dict[int, list[int]] = {}
    for n_chars, text, source in docs:
        b = int(n_chars) // ISO_BIN_CHARS
        y = 1 if len(text.split(" ")) > ISO_TOKEN_THRESHOLD else 0
        (test if source == "src0" else train).setdefault(b, []).append(y)
    bins = {
        b: (
            sum(train[b]) / len(train[b]),
            sum(ys) / len(ys),
            len(ys),
        )
        for b, ys in test.items()
        if b in train
    }
    n = sum(nt for _, _, nt in bins.values())
    ece = (
        sum(round(nt * abs(f - o), 12) for f, o, nt in bins.values()) / n
    )
    mce = max(abs(f - o) for f, o, _ in bins.values())
    rows = SPECS["quality_expected_calibration_error"].fn(
        spark, sf_small
    ).collect()
    assert {r.bin for r in rows} == set(bins)
    for r in rows:
        f, o, nt = bins[r.bin]
        assert r.n_test == nt
        assert abs(r.f_pred - f) < 1e-12
        assert abs(r.obs_rate - o) < 1e-12
        assert abs(r.abs_gap - abs(f - o)) < 1e-12
        assert abs(r.ece - ece) < 1e-9
        assert abs(r.mce - mce) < 1e-12
    brier = {
        r.bin: r
        for r in SPECS["quality_brier_calibration_split"].fn(
            spark, sf_small
        ).collect()
    }
    assert set(brier) == {r.bin for r in rows}
    for r in rows:
        assert abs(brier[r.bin].f_pred - r.f_pred) < 1e-12
        assert abs(brier[r.bin].obs_rate - r.obs_rate) < 1e-12


def test_calinski_harabasz_numpy_replay(spark, sf_small):
    """Full numpy replay: per-label within/between scatter and the
    variance-ratio index from raw embeddings."""
    import numpy as np

    rows = duckdb.connect().execute(
        f"SELECT label, embedding FROM '{sf_small}/embeddings.parquet'"
    ).fetchall()
    by_label: dict[int, list] = {}
    for label, emb in rows:
        by_label.setdefault(int(label), []).append(
            np.array(emb, dtype=np.float64)
        )
    gmean = np.mean(
        np.stack([e for es in by_label.values() for e in es]), axis=0
    )
    W = B = 0.0
    per = {}
    for label, es in by_label.items():
        X = np.stack(es)
        c = X.mean(axis=0)
        w_i = float(((X - c) ** 2).sum())
        b_i = float(len(es) * ((c - gmean) ** 2).sum())
        per[label] = (len(es), w_i, b_i)
        W += w_i
        B += b_i
    n = sum(len(es) for es in by_label.values())
    k = len(by_label)
    ch = (B / (k - 1)) / (W / (n - k))
    got = {
        r.label: r
        for r in SPECS["embedding_calinski_harabasz"].fn(
            spark, sf_small
        ).collect()
    }
    assert set(got) == set(per)
    for label, (nn, w_i, b_i) in per.items():
        r = got[label]
        assert r.n == nn
        assert abs(r.within_ss - w_i) < 1e-4
        assert abs(r.between_ss - b_i) < 1e-4
        assert abs(r.ch_index - ch) < 1e-3


def test_stream_attribution_per_chunk_replay(spark, sf_small):
    """Within-chunk journey assembly replayed with plain Python loops
    over the (ts, event_id)-sorted staging split."""
    import datetime as dt
    import json

    rows = duckdb.connect().execute(
        f"""
        SELECT event_id, ts, user_id, event_type, value, props
        FROM '{sf_small}/events.parquet' ORDER BY ts, event_id
        """
    ).fetchall()
    n = len(rows)
    csize = (n + 2) // 3
    got = SPECS["stream_attribution_monitor"].fn(
        spark, sf_small
    ).collect()
    got_map = {
        (r.chunk_min_event_id, r.channel): r for r in got
    }
    want_keys = set()
    for ci in range(3):
        chunk = rows[ci * csize : (ci + 1) * csize]
        if not chunk:
            continue
        mi = min(r[0] for r in chunk)
        clicks = [
            (r[1], r[0], r[2], "ch%d" % (json.loads(r[5])["k"] % 4))
            for r in chunk
            if r[3] == "click"
        ]
        agg: dict[str, list] = {}
        for r in chunk:
            if r[3] != "purchase":
                continue
            p_ts, p_val, p_user = r[1], r[4], r[2]
            touches = sorted(
                (
                    (c_ts, c_id, ch)
                    for c_ts, c_id, c_user, ch in clicks
                    if c_user == p_user
                    and c_ts < p_ts
                    and c_ts >= p_ts - dt.timedelta(days=7)
                ),
            )
            for i, (c_ts, c_id, ch) in enumerate(touches):
                a = agg.setdefault(ch, [0, 0, 0.0, 0.0])
                a[0] += 1
                if i == len(touches) - 1:
                    a[1] += 1
                    a[2] += round(p_val, 6)
                a[3] += round(p_val / len(touches), 6)
        for ch, (nt, nl, last_c, lin_c) in agg.items():
            want_keys.add((mi, ch))
            r = got_map[(mi, ch)]
            assert (r.n_touches, r.n_last) == (nt, nl)
            assert abs(r.last_touch_credit - last_c) < 1e-6
            assert abs(r.linear_credit - lin_c) < 1e-5
    assert want_keys == set(got_map)
