"""Round-7 seventh wave: Holt-Winters additive smoothing, Durbin
closed-form PACF, Pettitt changepoint, Markov event transitions,
multi-touch attribution, and the z-test empty-variant guard.

Each test replays the statistic in plain Python from the parquet
(independent arithmetic path — the Pettitt replay deliberately uses
the O(n²) pair-sum definition the engine's rank identity replaces);
the oracle-parity sweep (test_oracle_parity.py) covers the DuckDB
differential separately.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from kafka_stream_processing_spark.registry import all_specs
from tests.test_round7f_ops import _daily

SPECS = all_specs()


def _r6(v: float) -> float:
    return math.copysign(math.floor(abs(v) * 1e6 + 0.5) / 1e6, v)


def test_holt_winters_python_replay(spark, sf_small):
    """Full textbook replay of the additive recursion per event_type,
    plus the forecast-decomposition identity f_t = l+b+s on the
    engine's own columns."""
    from kafka_stream_processing_spark.operators.windowed import (
        HW_PERIOD,
    )

    m = HW_PERIOD
    rows = (
        SPECS["window_holt_winters_additive"].fn(spark, sf_small).collect()
    )
    acc = _daily(sf_small, by_type=True)
    series: dict[str, list] = {}
    for (et, day), v in sorted(acc.items()):
        series.setdefault(et, []).append((day, float(v)))
    n_rows = 0
    for et, pts in series.items():
        if len(pts) < 2 * m:
            continue
        xs = [x for _, x in pts]
        micro = [round(x * 1e6) for x in xs]
        m1 = (sum(micro[:m]) / 1e6) / m
        m2 = (sum(micro[m : 2 * m]) / 1e6) / m
        l, b = _r6(m1), _r6((m2 - m1) / m)
        s = [_r6(xs[i] - m1) for i in range(m)]
        exp = {m: (l, b, s[m - 1], None, None)}
        for t in range(m + 1, len(xs) + 1):
            x = xs[t - 1]
            f = l + b + s[0]
            l_new = _r6(0.5 * (x - s[0]) + 0.5 * (l + b))
            b_new = _r6(0.5 * (l_new - l) + 0.5 * b)
            s_new = _r6(0.5 * (x - l_new) + 0.5 * s[0])
            exp[t] = (l_new, b_new, s_new, f, x - f)
            l, b, s = l_new, b_new, s[1:] + [s_new]
        got = {r.idx: r for r in rows if r.event_type == et}
        assert set(got) == set(exp)
        n_rows += len(exp)
        for t, (el, eb, es, ef, er) in exp.items():
            r = got[t]
            assert r.level == el and r.trend == eb and r.seasonal == es
            if t == m:
                assert r.forecast is None and r.residual is None
            else:
                assert abs(r.forecast - ef) < 1e-9
                assert abs(r.residual - er) < 1e-9
    assert len(rows) == n_rows and n_rows > 0


def test_pacf_durbin_replay(spark, sf_small):
    """ACF from exact daily deviations, then the Durbin-Levinson
    closed forms; pacf(1) must equal acf(1) exactly."""
    rows = sorted(
        SPECS["window_pacf_daily_revenue"].fn(spark, sf_small).collect(),
        key=lambda r: r.lag_k,
    )
    acc = _daily(sf_small, by_type=False)
    days = sorted(acc)
    d0 = {(d - dt.date(1970, 1, 1)).days: float(acc[d]) for d in days}
    n = len(d0)
    mu = float(sum(acc.values())) / n
    e = {d: x - mu for d, x in d0.items()}
    s0 = sum(round(v * v, 6) for v in e.values())
    r = {}
    for k in (1, 2, 3):
        r[k] = (
            sum(
                round(e[d] * e[d + k], 6)
                for d in e
                if d + k in e
            )
            / s0
        )
    phi22 = (r[2] - r[1] * r[1]) / (1.0 - r[1] * r[1])
    phi21 = r[1] - phi22 * r[1]
    phi33 = (r[3] - phi21 * r[2] - phi22 * r[1]) / (
        1.0 - phi21 * r[1] - phi22 * r[2]
    )
    assert [x.lag_k for x in rows] == [1, 2, 3]
    assert rows[0].pacf == rows[0].acf
    for row, (ek, ep) in zip(
        rows, [(r[1], r[1]), (r[2], phi22), (r[3], phi33)]
    ):
        assert abs(row.acf - ek) < 1e-9
        assert abs(row.pacf - ep) < 1e-9


def test_pettitt_pair_sum_replay(spark, sf_small):
    """Replays U_t by the O(n²) pair-sum DEFINITION (the engine uses
    the midrank identity — different algorithm), plus the verdict
    arithmetic."""
    from kafka_stream_processing_spark.operators.windowed import (
        PETTITT_LN40,
    )

    rows = sorted(
        SPECS["window_pettitt_changepoint"].fn(spark, sf_small).collect(),
        key=lambda r: r.day,
    )
    acc = _daily(sf_small, by_type=False)
    days = sorted(acc)
    xs = [acc[d] for d in days]  # exact Fractions — sgn is exact
    n = len(xs)

    def sgn(v):
        return (v > 0) - (v < 0)

    u = {}
    for t in range(1, n):
        u[t] = sum(
            sgn(xs[j] - xs[i])
            for i in range(t)
            for j in range(t, n)
        )
    k_stat = max(abs(v) for v in u.values())
    change_day = min(
        days[t - 1] for t, v in u.items() if abs(v) == k_stat
    )
    z = (6.0 * k_stat * k_stat) / (
        float(n) * n * n + float(n) * n
    )
    assert len(rows) == n - 1
    for t, row in enumerate(rows, start=1):
        assert row.u_t == u[t]
        assert row.k_stat == k_stat
        assert row.change_day == change_day.isoformat()
        assert abs(row.pettitt_z - z) < 1e-12
        assert row.significant_005 == (z > PETTITT_LN40)


def test_markov_transitions_replay(spark, sf_small):
    """Counts replayed from per-user (ts, event_id)-sorted sequences;
    every from-row of P is a probability distribution."""
    rows = SPECS["window_markov_event_transitions"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, ts, event_id, event_type"
        f" FROM '{sf_small}/events.parquet'"
        f" ORDER BY user_id, ts, event_id"
    ).fetchall()
    counts: dict[tuple[str, str], int] = {}
    prev_user, prev_type = None, None
    for user, _, _, et in ev:
        if user == prev_user:
            counts[(prev_type, et)] = counts.get((prev_type, et), 0) + 1
        prev_user, prev_type = user, et
    got = {(r.from_type, r.to_type): r for r in rows}
    assert set(got) == set(counts)
    totals: dict[str, int] = {}
    for (f_t, _), nn in counts.items():
        totals[f_t] = totals.get(f_t, 0) + nn
    for (f_t, t_t), nn in counts.items():
        r = got[(f_t, t_t)]
        assert r.n == nn
        assert r.from_total == totals[f_t]
        assert r.p == nn / totals[f_t]
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.p
    for s in by_from.values():
        assert abs(s - 1.0) < 1e-9


def test_attribution_journeys_replay(spark, sf_small):
    """Journey assembly + all three credit models replayed in Python;
    conservation: first/last credits each sum to the total value of
    attributed purchases, and linear totals match up to the round-6
    per-share quantization."""
    from kafka_stream_processing_spark.operators.relational import (
        ATTRIB_CHANNELS,
        ATTRIB_LOOKBACK_DAYS,
    )

    rows = SPECS["join_attribution_multitouch"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, ts, event_id, event_type, value,"
        f" CAST(json_extract_string(props, '$.k') AS BIGINT)"
        f" FROM '{sf_small}/events.parquet'"
    ).fetchall()
    clicks: dict[int, list] = {}
    purchases = []
    for user, ts, eid, et, value, k in ev:
        if et == "click":
            clicks.setdefault(user, []).append((ts, eid, k))
        elif et == "purchase":
            purchases.append((user, ts, eid, value))
    agg: dict[str, list] = {}
    lookback = dt.timedelta(days=ATTRIB_LOOKBACK_DAYS)
    n_journeys = 0
    for user, p_ts, _, value in purchases:
        touches = sorted(
            (ts, eid, k)
            for ts, eid, k in clicks.get(user, [])
            if p_ts - lookback <= ts < p_ts
        )
        if not touches:
            continue
        n_journeys += 1
        cnt = len(touches)
        for i, (_, _, k) in enumerate(touches):
            ch = f"ch{k % ATTRIB_CHANNELS}"
            a = agg.setdefault(ch, [0, 0, 0, 0.0, 0.0, 0.0])
            a[0] += 1
            if i == 0:
                a[1] += 1
                a[3] += round(value, 6)
            if i == cnt - 1:
                a[2] += 1
                a[4] += round(value, 6)
            a[5] += round(value / cnt, 6)
    got = {r.channel: r for r in rows}
    assert set(got) == set(agg)
    for ch, (nt, nf, nl, fc, lc, lin) in agg.items():
        r = got[ch]
        assert r.n_touches == nt and r.n_first == nf and r.n_last == nl
        assert abs(r.first_touch_credit - fc) < 1e-6
        assert abs(r.last_touch_credit - lc) < 1e-6
        assert abs(r.linear_credit - lin) < 1e-6
    assert sum(r.n_first for r in rows) == n_journeys
    assert sum(r.n_last for r in rows) == n_journeys
    total_first = sum(r.first_touch_credit for r in rows)
    total_last = sum(r.last_touch_credit for r in rows)
    assert abs(total_first - total_last) < 1e-6
    total_linear = sum(r.linear_credit for r in rows)
    # linear shares are round-6 per touch: bounded quantization drift
    assert abs(total_linear - total_first) < 1e-6 * max(
        1, sum(r.n_touches for r in rows)
    )


def test_ztest_guard_passthrough(spark, sf_small):
    """The empty-variant guard must not perturb the populated case:
    both variants are non-empty on this data, so z and the verdict
    are non-NULL and consistent."""
    from kafka_stream_processing_spark.operators.quality_kernel import (
        Z_CRIT_005,
    )

    row = SPECS["quality_two_proportion_ztest"].fn(
        spark, sf_small
    ).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert row.z_stat is not None
    assert row.significant_005 == (abs(row.z_stat) > Z_CRIT_005)


def test_ccf_python_replay(spark, sf_small):
    """CCF replayed from exact daily click/purchase counts; ccf(0) is
    the plain Pearson correlation and |ccf| obeys Cauchy-Schwarz."""
    from kafka_stream_processing_spark.operators.windowed import (
        CCF_MAX_LAG,
    )

    rows = sorted(
        SPECS["window_ccf_click_purchase"].fn(spark, sf_small).collect(),
        key=lambda r: r.lag_k,
    )
    con = duckdb.connect()
    daily = con.execute(
        f"SELECT CAST(date_trunc('day', ts) AS DATE)"
        f" - DATE '1970-01-01' AS d,"
        f" SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END),"
        f" SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        f" FROM '{sf_small}/events.parquet' GROUP BY 1"
    ).fetchall()
    n = len(daily)
    mx = sum(c for _, c, _ in daily) / n
    my = sum(p for _, _, p in daily) / n
    ex = {d: c - mx for d, c, _ in daily}
    ey = {d: p - my for d, _, p in daily}
    sx = sum(round(v * v, 6) for v in ex.values())
    sy = sum(round(v * v, 6) for v in ey.values())
    den = math.sqrt(sx * sy)
    exp = {}
    for k in range(-CCF_MAX_LAG, CCF_MAX_LAG + 1):
        exp[k] = (
            sum(
                round(ex[d] * ey[d + k], 6)
                for d in ex
                if d + k in ey
            )
            / den
        )
    assert [r.lag_k for r in rows] == list(
        range(-CCF_MAX_LAG, CCF_MAX_LAG + 1)
    )
    for r in rows:
        assert abs(r.ccf - exp[r.lag_k]) < 1e-9
        assert abs(r.ccf) <= 1.0 + 1e-9


def test_lagged_ols_python_replay(spark, sf_small):
    """Exact-integer moment replay; slope/intercept reproduce the
    normal equations and r2 in [0, 1]."""
    row = SPECS["window_lagged_ols_clicks_purchases"].fn(
        spark, sf_small
    ).collect()[0]
    con = duckdb.connect()
    daily = {
        d: (c, p)
        for d, c, p in con.execute(
            f"SELECT CAST(date_trunc('day', ts) AS DATE)"
            f" - DATE '1970-01-01' AS d,"
            f" SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END),"
            f" SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
            f" FROM '{sf_small}/events.parquet' GROUP BY 1"
        ).fetchall()
    }
    pairs = [
        (daily[d][0], daily[d + 1][1])
        for d in daily
        if d + 1 in daily
    ]
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    cov_t = float(n * sxy - sx * sy)
    varx_t = float(n * sxx - sx * sx)
    vary_t = float(n * syy - sy * sy)
    assert row.n_pairs == n
    assert row.slope == cov_t / varx_t
    assert row.intercept == (sy - (cov_t / varx_t) * sx) / n
    assert row.r2 == (cov_t * cov_t) / (varx_t * vary_t)
    assert 0.0 <= row.r2 <= 1.0


def test_audience_overlap_replay(spark, sf_small):
    """Set replay from python sets; jaccard <= overlap_coef <= 1 and
    inclusion-exclusion consistency."""
    rows = SPECS["setops_audience_overlap_jaccard"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    pairs = con.execute(
        f"SELECT DISTINCT event_type, user_id"
        f" FROM '{sf_small}/events.parquet'"
    ).fetchall()
    sets: dict[str, set] = {}
    for et, u in pairs:
        sets.setdefault(et, set()).add(u)
    types = sorted(sets)
    exp = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            inter = len(sets[ta] & sets[tb])
            if inter:
                exp[(ta, tb)] = inter
    got = {(r.type_a, r.type_b): r for r in rows}
    assert set(got) == set(exp)
    for (ta, tb), inter in exp.items():
        r = got[(ta, tb)]
        assert r.n_a == len(sets[ta]) and r.n_b == len(sets[tb])
        assert r.n_both == inter
        assert r.jaccard == inter / (r.n_a + r.n_b - inter)
        assert r.overlap_coef == inter / min(r.n_a, r.n_b)
        assert r.jaccard <= r.overlap_coef <= 1.0


def test_cooccurrence_lift_replay(spark, sf_small):
    """Basket replay; support <= both confidences <= 1, and
    lift == conf_a_to_b / P(b) exactly in the integer arithmetic."""
    rows = SPECS["agg_cooccurrence_lift"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    members = con.execute(
        f"SELECT DISTINCT user_id,"
        f" CAST(date_trunc('day', ts) AS DATE), event_type"
        f" FROM '{sf_small}/events.parquet'"
    ).fetchall()
    baskets: dict[tuple, set] = {}
    for u, d, et in members:
        baskets.setdefault((u, d), set()).add(et)
    n_baskets = len(baskets)
    item: dict[str, int] = {}
    pair: dict[tuple, int] = {}
    for types in baskets.values():
        ts = sorted(types)
        for t in ts:
            item[t] = item.get(t, 0) + 1
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                pair[(a, b)] = pair.get((a, b), 0) + 1
    got = {(r.type_a, r.type_b): r for r in rows}
    assert set(got) == set(pair)
    for (a, b), np_ in pair.items():
        r = got[(a, b)]
        assert r.n_pair == np_ and r.n_baskets == n_baskets
        assert r.n_a == item[a] and r.n_b == item[b]
        assert r.support == np_ / n_baskets
        assert r.conf_a_to_b == np_ / item[a]
        assert r.conf_b_to_a == np_ / item[b]
        assert abs(r.lift - (np_ * n_baskets) / (item[a] * item[b])) < 1e-12
        assert r.support <= min(r.conf_a_to_b, r.conf_b_to_a) <= 1.0


def test_page_hinkley_python_replay(spark, sf_small):
    """Layered-window replay: running mean, round-6 cumulated
    deviations, prefix-min; ph >= 0 everywhere and max_ph attained at
    detect_day."""
    rows = sorted(
        SPECS["window_page_hinkley_drift"].fn(spark, sf_small).collect(),
        key=lambda r: r.day,
    )
    acc = _daily(sf_small, by_type=False)
    days = sorted(acc)
    cums = 0
    mt = 0.0
    mt_acc = 0  # micro units, exact
    runmin = None
    exp = []
    for t, d in enumerate(days, start=1):
        cums += acc[d]
        dev = float(acc[d]) - float(cums) / t
        mt_acc += round(dev * 1e6)
        mt = mt_acc / 1e6
        runmin = mt if runmin is None else min(runmin, mt)
        exp.append((d.isoformat(), mt, mt - runmin))
    max_ph = max(p for _, _, p in exp)
    detect_day = min(d for d, _, p in exp if p == max_ph)
    assert len(rows) == len(exp)
    for r, (d, emt, eph) in zip(rows, exp):
        assert r.day == d
        assert abs(r.mt - emt) < 1e-9
        assert abs(r.ph - eph) < 1e-9
        assert r.ph >= 0.0
        assert abs(r.max_ph - max_ph) < 1e-9
        assert r.detect_day == detect_day


def test_centroid_separation_replay(spark, sf_small):
    """Centroids and both separations replayed with Fractions over the
    quantized sums; cosine within [-1, 1], l2 >= 0, and the pair set
    covers every label pair."""
    rows = SPECS["embedding_centroid_separation"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    data = con.execute(
        f"SELECT label, embedding"
        f" FROM '{sf_small}/embeddings.parquet'"
    ).fetchall()
    groups: dict[int, list] = {}
    for label, emb in data:
        groups.setdefault(label, []).append(emb)
    # exact decimal(18,12) sums then one double division per dim
    cents = {}
    for label, embs in groups.items():
        n = len(embs)
        c = []
        for i in range(64):
            s = sum(round(float(e[i]) * 10**12) for e in embs)
            c.append((s / 10**12) / n)
        cents[label] = c
    labels = sorted(groups)
    exp = {}
    for i, a in enumerate(labels):
        for b in labels[i + 1 :]:
            ca, cb = cents[a], cents[b]
            dot_ab = sum(round(x * y * 10**12) for x, y in zip(ca, cb)) / 10**12
            dot_aa = sum(round(x * x * 10**12) for x in ca) / 10**12
            dot_bb = sum(round(y * y * 10**12) for y in cb) / 10**12
            d2 = sum(round((x - y) ** 2 * 10**12) for x, y in zip(ca, cb)) / 10**12
            exp[(a, b)] = (
                dot_ab / (math.sqrt(dot_aa) * math.sqrt(dot_bb)),
                math.sqrt(d2),
            )
    got = {(r.label_a, r.label_b): r for r in rows}
    assert set(got) == set(exp)
    for (a, b), (ecos, el2) in exp.items():
        r = got[(a, b)]
        assert r.n_a == len(groups[a]) and r.n_b == len(groups[b])
        assert abs(r.cosine - ecos) < 1e-6
        assert abs(r.l2_dist - el2) < 1e-6
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9
        assert r.l2_dist >= 0.0


def test_stream_pettitt_matches_per_chunk_pair_sum(spark, sf_small):
    """Per-chunk replay by the O(n²) pair-sum definition on the
    deterministic (ts, event_id)-sorted thirds of the event log."""
    from kafka_stream_processing_spark.operators.windowed import (
        PETTITT_LN40,
    )

    rows = SPECS["stream_pettitt_monitor"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_id, ts, value FROM '{sf_small}/events.parquet'"
        f" ORDER BY ts, event_id"
    ).fetchall()
    n = len(ev)
    step = (n + 2) // 3
    by_chunk: dict[int, dict] = {}
    chunk_key: dict[int, int] = {}
    for rn, (eid, ts, v) in enumerate(ev):
        cid = rn // step
        chunk_key[cid] = min(chunk_key.get(cid, eid), eid)
        daily = by_chunk.setdefault(cid, {})
        d = ts.date()
        daily[d] = daily.get(d, 0) + round(v * 10**6)

    def sgn(v):
        return (v > 0) - (v < 0)

    got: dict[tuple[int, str], object] = {
        (r.chunk_min_event_id, r.day): r for r in rows
    }
    n_expected = 0
    for cid, daily in by_chunk.items():
        days = sorted(daily)
        xs = [daily[d] for d in days]
        nd = len(xs)
        u = {}
        for t in range(1, nd):
            u[t] = sum(
                sgn(xs[j] - xs[i])
                for i in range(t)
                for j in range(t, nd)
            )
        k_stat = max(abs(v) for v in u.values())
        change_day = min(
            days[t - 1] for t, v in u.items() if abs(v) == k_stat
        )
        z = (6.0 * k_stat * k_stat) / (
            float(nd) * nd * nd + float(nd) * nd
        )
        n_expected += nd - 1
        ck = chunk_key[cid]
        for t in range(1, nd):
            r = got[(ck, days[t - 1].isoformat())]
            assert r.u_t == u[t]
            assert r.k_stat == k_stat
            assert r.change_day == change_day.isoformat()
            assert abs(r.pettitt_z - z) < 1e-12
            assert r.significant_005 == (z > PETTITT_LN40)
    assert len(rows) == n_expected


def test_cvm_drift_rank_definition_replay(spark, sf_small):
    """Replays 4U by the per-element DEFINITION (doubled midranks from
    the sorted combined sample; the engine uses the per-value-block
    closed form — different algorithm), then the T arithmetic."""
    from kafka_stream_processing_spark.operators.quality_edf import (
        CVM_CRIT_005,
    )

    row = SPECS["quality_cvm_drift"].fn(spark, sf_small).collect()[0]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT n_chars, source FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    a = sorted(v for v, s in docs if s == "src0")
    b = sorted(v for v, s in docs if s != "src0")
    combined = sorted(a + b)
    from bisect import bisect_left, bisect_right

    def r2(v):  # doubled midrank in the combined sample
        return (
            2 * bisect_left(combined, v)
            + (bisect_right(combined, v) - bisect_left(combined, v))
            + 1
        )

    u4 = len(a) * sum(
        (r2(v) - 2 * (i + 1)) ** 2 for i, v in enumerate(a)
    ) + len(b) * sum(
        (r2(v) - 2 * (j + 1)) ** 2 for j, v in enumerate(b)
    )
    na, nb = len(a), len(b)
    t = (u4 / (4.0 * na * nb * (na + nb))) - (
        4.0 * na * nb - 1.0
    ) / (6.0 * (na + nb))
    assert row.na == na and row.nb == nb
    assert row.u4 == float(u4)
    assert abs(row.t_stat - t) < 1e-9
    assert row.drift == (t > CVM_CRIT_005)


def test_hodges_lehmann_bruteforce_replay(spark, sf_small):
    """Replays the HL estimate over ALL n_a*n_b materialized pairwise
    differences (the engine never materializes them)."""
    row = SPECS["quality_hodges_lehmann_shift"].fn(
        spark, sf_small
    ).collect()[0]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT n_chars, source FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    a = [v for v, s in docs if s == "src0"]
    b = [v for v, s in docs if s != "src0"]
    diffs = sorted(vb - va for va in a for vb in b)
    w = len(diffs)
    k1, k2 = (w + 1) // 2, (w + 2) // 2
    hl = (diffs[k1 - 1] + diffs[k2 - 1]) / 2.0
    assert row.na == len(a) and row.nb == len(b)
    assert row.n_pairs == w
    assert row.hl_shift == hl


def test_qq_deciles_numpy_replay(spark, sf_small):
    """Exact linear-interpolation deciles replayed with numpy; the gap
    column is consistent with the two quantile columns."""
    import numpy as np

    rows = SPECS["quality_qq_deciles_sources"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT n_chars, source FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    by_src: dict[str, list] = {}
    for v, s in docs:
        by_src.setdefault(s, []).append(v)
    qs = [i / 10 for i in range(1, 10)]
    ref = [
        round(float(x), 6)
        for x in np.percentile(
            by_src["src0"], [q * 100 for q in qs], method="linear"
        )
    ]
    others = sorted(s for s in by_src if s != "src0")
    assert len(rows) == 9 * len(others)
    got = {(r.source, r.q): r for r in rows}
    for s in others:
        cur = [
            round(float(x), 6)
            for x in np.percentile(
                by_src[s], [q * 100 for q in qs], method="linear"
            )
        ]
        for q in range(1, 10):
            r = got[(s, q)]
            assert abs(r.ref_value - ref[q - 1]) < 1e-9
            assert abs(r.cur_value - cur[q - 1]) < 1e-9
            assert abs(
                r.gap - round(r.cur_value - r.ref_value, 6)
            ) < 1e-12


def test_stream_markov_monitor_per_chunk_replay(spark, sf_small):
    """Within-chunk transition counts replayed from the deterministic
    (ts, event_id)-sorted thirds; each (chunk, from) row of P is a
    probability distribution."""
    rows = SPECS["stream_markov_transition_monitor"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_id, ts, user_id, event_type"
        f" FROM '{sf_small}/events.parquet'"
        f" ORDER BY ts, event_id"
    ).fetchall()
    n = len(ev)
    step = (n + 2) // 3
    counts: dict[tuple[int, str, str], int] = {}
    chunk_key: dict[int, int] = {}
    chunks: dict[int, list] = {}
    for rn, (eid, ts, user, et) in enumerate(ev):
        cid = rn // step
        chunk_key[cid] = min(chunk_key.get(cid, eid), eid)
        chunks.setdefault(cid, []).append((user, ts, eid, et))
    for cid, evs in chunks.items():
        evs.sort(key=lambda r: (r[0], r[1], r[2]))
        prev_user, prev_type = None, None
        for user, _, _, et in evs:
            if user == prev_user:
                key = (chunk_key[cid], prev_type, et)
                counts[key] = counts.get(key, 0) + 1
            prev_user, prev_type = user, et
    got = {(r.chunk_min_event_id, r.from_type, r.to_type): r for r in rows}
    assert set(got) == set(counts)
    totals: dict[tuple[int, str], int] = {}
    for (ck, f_t, _), nn in counts.items():
        totals[(ck, f_t)] = totals.get((ck, f_t), 0) + nn
    for (ck, f_t, t_t), nn in counts.items():
        r = got[(ck, f_t, t_t)]
        assert r.n == nn
        assert r.from_total == totals[(ck, f_t)]
        assert r.p == nn / totals[(ck, f_t)]


def test_abc_classification_replay(spark, sf_small):
    """ABC classes replayed from a python sort; classes partition the
    customers, A-revenue covers <= 80% + one customer, and cum_share
    is monotone ending at 1."""
    rows = sorted(
        SPECS["window_abc_classification"].fn(spark, sf_small).collect(),
        key=lambda r: r.cum_share,
    )
    con = duckdb.connect()
    rev = con.execute(
        f"SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,6)))"
        f" FROM '{sf_small}/orders.parquet' GROUP BY 1"
    ).fetchall()
    ordered = sorted(rev, key=lambda t: (-t[1], t[0]))
    total = sum(v for _, v in ordered)
    cum = 0
    exp = {}
    for ck, v in ordered:
        cum += v
        share = float(cum) / float(total)
        exp[ck] = (
            float(v),
            share,
            "A" if share <= 0.80 else ("B" if share <= 0.95 else "C"),
        )
    assert len(rows) == len(exp)
    prev = 0.0
    for r in rows:
        ev, es, ec = exp[r.o_custkey]
        assert abs(r.revenue - ev) < 1e-9
        assert abs(r.cum_share - es) < 1e-12
        assert r.abc_class == ec
        assert r.cum_share >= prev
        prev = r.cum_share
    assert abs(rows[-1].cum_share - 1.0) < 1e-12


def test_global_prefix_sum_distributed_matches_exact(spark, sf_small):
    """frontier.global_prefix_sum: the distributed two-phase form is
    bit-identical to the exact single-window form on decimal values."""
    from kafka_stream_processing_spark.functions.exact import dec
    from kafka_stream_processing_spark.operators.frontier import (
        global_prefix_sum,
    )
    from kafka_stream_processing_spark.sources.tables import table
    from pyspark.sql import functions as F

    rev = (
        table(spark, sf_small, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("revenue"))
    )
    order = [F.col("revenue").desc(), F.col("o_custkey")]
    exact = {
        r.o_custkey: r.cum
        for r in global_prefix_sum(
            rev, order, "revenue", mode="exact"
        ).collect()
    }
    dist = {
        r.o_custkey: r.cum
        for r in global_prefix_sum(
            rev, order, "revenue", mode="distributed"
        ).collect()
    }
    assert exact == dist and len(exact) > 0


def test_forecast_skill_scores_replay(spark, sf_small):
    """MASE and Theil U2 replayed from exact daily totals on the
    common-day pair set."""
    row = SPECS["window_forecast_skill_scores"].fn(
        spark, sf_small
    ).collect()[0]
    acc = _daily(sf_small, by_type=False)
    d0 = {
        (d - dt.date(1970, 1, 1)).days: float(acc[d]) for d in acc
    }
    triples = [
        (d0[d], d0[d - 1], d0[d - 7])
        for d in d0
        if d - 1 in d0 and d - 7 in d0
    ]
    n = len(triples)
    sae1 = sum(round(abs(x - f1), 6) for x, f1, _ in triples)
    sae7 = sum(round(abs(x - f7), 6) for x, _, f7 in triples)
    sse1 = sum(round((x - f1) ** 2, 6) for x, f1, _ in triples)
    sse7 = sum(round((x - f7) ** 2, 6) for x, _, f7 in triples)
    assert row.n_days == n
    assert abs(row.mae_naive1 - sae1 / n) < 1e-9
    assert abs(row.mae_seasonal7 - sae7 / n) < 1e-9
    assert abs(row.mase_seasonal - (sae7 / n) / (sae1 / n)) < 1e-9
    assert abs(row.theil_u2 - math.sqrt(sse7 / sse1)) < 1e-9


def test_yule_k_python_replay(spark, sf_small):
    """K, vocab, hapax replayed from a python Counter; K >= 0 and
    hapax <= vocab."""
    from collections import Counter

    row = SPECS["text_yule_k_diversity"].fn(spark, sf_small).collect()[0]
    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    cnt = Counter()
    for (t,) in texts:
        cnt.update(t.split(" "))
    n = sum(cnt.values())
    vocab = len(cnt)
    s2 = sum(m * m for m in cnt.values())
    hapax = sum(1 for m in cnt.values() if m == 1)
    assert row.n_tokens == n and row.vocab == vocab
    assert row.s2 == s2 and row.hapax == hapax
    assert row.hapax_ratio == hapax / vocab
    assert abs(row.yule_k - 10000.0 * (s2 - n) / (float(n) * n)) < 1e-12
    assert row.yule_k >= 0.0


def test_powerlaw_mle_replay(spark, sf_small):
    """alpha replayed from the sparsified adjacency's degree list with
    the CSN formula; alpha > 1 whenever any degree exceeds d_min."""
    from kafka_stream_processing_spark.operators.graph import (
        _sig_adj_df,
    )

    row = SPECS["graph_degree_powerlaw_mle"].fn(
        spark, sf_small
    ).collect()[0]
    adj = _sig_adj_df(spark, sf_small).collect()
    deg: dict[str, int] = {}
    for r in adj:
        deg[r.a] = deg.get(r.a, 0) + 1
        deg[r.b] = deg.get(r.b, 0) + 1
    n = len(deg)
    dmin = min(deg.values())
    sln = sum(
        round(math.log(d / dmin), 12) for d in deg.values()
    )
    assert row.n_nodes == n and row.d_min == dmin
    assert abs(row.sum_ln - sln) < 1e-9
    if sln > 0:
        assert abs(row.alpha - (1.0 + n / sln)) < 1e-9
        assert row.alpha > 1.0
    else:
        assert row.alpha is None


def test_weighted_reservoir_es_replay(spark, sf_small):
    """ES keys replayed via hashlib md5; the engine's top-k equals the
    python top-k and is deterministic across reruns."""
    import hashlib

    from kafka_stream_processing_spark.operators.pipeline import (
        ES_SAMPLE_K,
        _ES_SCALE,
    )

    rows = SPECS["sample_weighted_reservoir_es"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, n_chars FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    keyed = []
    for doc_id, w in docs:
        h = int(
            hashlib.md5(f"{doc_id}_es".encode()).hexdigest()[:15], 16
        )
        keyed.append((math.log((h + 1) / _ES_SCALE) / w, doc_id, w))
    top = sorted(keyed, key=lambda t: (-t[0], t[1]))[:ES_SAMPLE_K]
    assert len(rows) == ES_SAMPLE_K
    got = sorted(rows, key=lambda r: (-r.es_key, r.doc_id))
    for r, (k, doc_id, w) in zip(got, top):
        assert r.doc_id == doc_id and r.weight == w
        # python's math.log can differ from the JVM/DuckDB ln by one
        # ulp; the cross-ENGINE comparison is the strict gate
        assert math.isclose(r.es_key, k, rel_tol=1e-12)
    rerun = SPECS["sample_weighted_reservoir_es"].fn(
        spark, sf_small
    ).collect()
    assert sorted(r.doc_id for r in rerun) == sorted(
        r.doc_id for r in rows
    )


def test_curriculum_order_replay(spark, sf_small):
    """ntile + round-robin interleave replayed in python; positions
    form a permutation and rounds are difficulty-complete."""
    from kafka_stream_processing_spark.operators.pipeline import (
        CURRICULUM_BUCKETS,
    )

    rows = SPECS["pipeline_curriculum_order"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    docs = sorted(
        con.execute(
            f"SELECT n_chars, doc_id FROM '{sf_small}/documents.parquet'"
        ).fetchall()
    )
    n = len(docs)
    k = CURRICULUM_BUCKETS
    base, extra = divmod(n, k)
    # ntile: first `extra` buckets get base+1 rows
    exp_decile = {}
    exp_within = {}
    idx = 0
    for b in range(1, k + 1):
        size = base + (1 if b <= extra else 0)
        for j in range(size):
            _, doc_id = docs[idx]
            exp_decile[doc_id] = b
            exp_within[doc_id] = j + 1
            idx += 1
    order = sorted(
        ((exp_within[d], exp_decile[d], d) for _, d in docs)
    )
    exp_pos = {d: i + 1 for i, (_, _, d) in enumerate(order)}
    assert len(rows) == n
    for r in rows:
        assert r.decile == exp_decile[r.doc_id]
        assert r.within_rank == exp_within[r.doc_id]
        assert r.curriculum_pos == exp_pos[r.doc_id]
    assert sorted(r.curriculum_pos for r in rows) == list(
        range(1, n + 1)
    )


def test_davies_bouldin_numpy_replay(spark, sf_small):
    """Scatter via the mean-centroid identity, R matrix, and the index
    replayed with numpy; db_component is the row max of R."""
    import numpy as np

    rows = SPECS["embedding_davies_bouldin_index"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    data = con.execute(
        f"SELECT label, embedding FROM '{sf_small}/embeddings.parquet'"
    ).fetchall()
    groups: dict[int, list] = {}
    for label, emb in data:
        groups.setdefault(label, []).append(
            np.array(emb, dtype=np.float64)
        )
    labels = sorted(groups)
    cents = {}
    scat = {}
    for lb in labels:
        X = np.stack(groups[lb])
        n = len(X)
        c = X.sum(axis=0) / n
        cents[lb] = c
        sxx = float((X * X).sum())
        cc = float((c * c).sum())
        scat[lb] = math.sqrt(max(0.0, (sxx - n * cc) / n))
    comp = {}
    for i in labels:
        rs = []
        for j in labels:
            if i == j:
                continue
            d = float(np.linalg.norm(cents[i] - cents[j]))
            rs.append((scat[i] + scat[j]) / d)
        comp[i] = max(rs)
    db = sum(comp.values()) / len(labels)
    got = {r.label: r for r in rows}
    assert set(got) == set(labels)
    for lb in labels:
        r = got[lb]
        assert r.n == len(groups[lb])
        assert abs(r.scatter - scat[lb]) < 1e-6
        assert abs(r.db_component - comp[lb]) < 1e-6
        assert abs(r.db_index - db) < 1e-6
        assert r.scatter >= 0.0


def test_decomposition_strength_by_type_replay(spark, sf_small):
    """Per-series strengths replayed with the classical-decomposition
    arithmetic partitioned by event_type."""
    from kafka_stream_processing_spark.operators.windowed import (
        DECOMP_PERIOD,
    )

    rows = SPECS["window_decomposition_strength_by_type"].fn(
        spark, sf_small
    ).collect()
    acc = _daily(sf_small, by_type=True)
    series: dict[str, list] = {}
    for (et, day), v in sorted(acc.items()):
        series.setdefault(et, []).append((day, float(v)))
    half = DECOMP_PERIOD // 2
    got = {r.event_type: r for r in rows}
    for et, pts in series.items():
        days = [d for d, _ in pts]
        xs = [x for _, x in pts]
        trend = {}
        for i in range(half, len(days) - half):
            trend[days[i]] = (
                sum(xs[i - half : i + half + 1]) / DECOMP_PERIOD
            )
        det = {d: xs[days.index(d)] - t for d, t in trend.items()}
        by_dow: dict[int, list] = {}
        for d, v in det.items():
            by_dow.setdefault(d.weekday(), []).append(v)
        seas = {
            kk: sum(round(v, 6) for v in vs) / len(vs)
            for kk, vs in by_dow.items()
        }
        rem = {d: det[d] - seas[d.weekday()] for d in det}
        n = len(rem)
        vr = sum(round(v * v, 6) for v in rem.values()) / n
        vsr = (
            sum(
                round((seas[d.weekday()] + rem[d]) ** 2, 6)
                for d in rem
            )
            / n
        )
        vtr = (
            sum(round((trend[d] + rem[d]) ** 2, 6) for d in rem) / n
        )
        r = got[et]
        assert r.n_days_used == n
        assert abs(
            r.seasonal_strength - max(0.0, 1.0 - vr / vsr)
        ) < 1e-9
        assert abs(r.trend_strength - max(0.0, 1.0 - vr / vtr)) < 1e-9


def test_markov_entropy_rate_replay(spark, sf_small):
    """Entropy rate replayed from the python transition counts of
    test_markov_transitions_replay; 0 <= H <= ln(#types), and the
    pi column sums to 1."""
    rows = SPECS["window_markov_entropy_rate"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, ts, event_id, event_type"
        f" FROM '{sf_small}/events.parquet'"
        f" ORDER BY user_id, ts, event_id"
    ).fetchall()
    counts: dict[tuple[str, str], int] = {}
    prev_user, prev_type = None, None
    for user, _, _, et in ev:
        if user == prev_user:
            counts[(prev_type, et)] = counts.get((prev_type, et), 0) + 1
        prev_user, prev_type = user, et
    totals: dict[str, int] = {}
    for (f_t, _), nn in counts.items():
        totals[f_t] = totals.get(f_t, 0) + nn
    grand = sum(totals.values())
    h_cond = {}
    for f_t, tot in totals.items():
        h_cond[f_t] = sum(
            round(
                -(nn / tot) * math.log(nn / tot), 12
            )
            for (ft2, _), nn in counts.items()
            if ft2 == f_t
        )
    rate = sum(
        round((totals[f_t] / grand) * h_cond[f_t], 12)
        for f_t in totals
    )
    got = {r.from_type: r for r in rows}
    assert set(got) == set(totals)
    n_types = len({t for _, t in counts} | set(totals))
    for f_t, r in got.items():
        assert r.from_total == totals[f_t]
        assert abs(r.pi - totals[f_t] / grand) < 1e-12
        assert abs(r.h_cond - h_cond[f_t]) < 1e-9
        assert abs(r.entropy_rate - rate) < 1e-9
        assert -1e-12 <= r.h_cond <= math.log(n_types) + 1e-9
    assert abs(sum(r.pi for r in rows) - 1.0) < 1e-12


def test_silhouette_lite_numpy_replay(spark, sf_small):
    """Per-label and global simplified silhouettes replayed with
    numpy; every mean is within [-1, 1]."""
    import numpy as np

    rows = SPECS["embedding_silhouette_lite"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, label, embedding"
        f" FROM '{sf_small}/embeddings.parquet'"
    ).fetchall()
    groups: dict[int, list] = {}
    vecs = {}
    labels_of = {}
    for vec_id, label, emb in data:
        v = np.array(emb, dtype=np.float64)
        groups.setdefault(label, []).append(v)
        vecs[vec_id] = v
        labels_of[vec_id] = label
    cents = {
        lb: np.stack(vs).sum(axis=0) / len(vs)
        for lb, vs in groups.items()
    }
    sils: dict[int, list] = {}
    all_sils = []
    for vec_id, v in vecs.items():
        own = labels_of[vec_id]
        a = float(np.linalg.norm(v - cents[own]))
        b = min(
            float(np.linalg.norm(v - cents[lb]))
            for lb in cents
            if lb != own
        )
        s = (b - a) / max(a, b)
        sils.setdefault(own, []).append(round(s, 12))
        all_sils.append(round(s, 12))
    got = {r.label: r for r in rows}
    assert set(got) == set(groups)
    for lb, ss in sils.items():
        r = got[lb]
        assert r.n == len(ss)
        assert abs(r.mean_sil - sum(ss) / len(ss)) < 1e-6
        assert -1.0 <= r.mean_sil <= 1.0
        assert abs(
            r.global_mean_sil - sum(all_sils) / len(all_sils)
        ) < 1e-6


def test_funnel_time_constrained_replay(spark, sf_small):
    """Step counts replayed from per-user event scans with the 24h
    deadlines; funnel counts are monotone non-increasing."""
    from kafka_stream_processing_spark.operators.relational import (
        FUNNEL_STEP_GAP_HOURS,
    )

    row = SPECS["funnel_view_click_purchase_24h"].fn(
        spark, sf_small
    ).collect()[0]
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, ts, event_type"
        f" FROM '{sf_small}/events.parquet'"
    ).fetchall()
    by_user: dict[int, list] = {}
    for user, ts, et in ev:
        by_user.setdefault(user, []).append((ts, et))
    gap = dt.timedelta(hours=FUNNEL_STEP_GAP_HOURS)
    nv = nc = np_ = 0
    for user, evs in by_user.items():
        views = [t for t, e in evs if e == "view"]
        if not views:
            continue
        nv += 1
        v = min(views)
        clicks = [
            t for t, e in evs if e == "click" and v < t <= v + gap
        ]
        if not clicks:
            continue
        nc += 1
        c = min(clicks)
        purch = [
            t
            for t, e in evs
            if e == "purchase" and c < t <= c + gap
        ]
        if purch:
            np_ += 1
    assert (row.n_viewed, row.n_clicked, row.n_purchased) == (
        nv,
        nc,
        np_,
    )
    assert row.n_viewed >= row.n_clicked >= row.n_purchased
    assert row.view_to_click == nc / nv
    assert row.click_to_purchase == np_ / nc
    assert row.overall == np_ / nv


def test_stream_weighted_sample_equals_batch_subset(spark, sf_small):
    """Mergeability pin: the streaming reservoir equals the one-shot
    batch ES sample over the same training pool."""
    import hashlib

    from kafka_stream_processing_spark.operators.pipeline import (
        ES_SAMPLE_K,
        _ES_SCALE,
    )

    rows = SPECS["stream_weighted_sample_merge"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, n_chars FROM '{sf_small}/documents.parquet'"
        f" WHERE source <> 'src0'"
    ).fetchall()
    keyed = []
    for doc_id, w in docs:
        h = int(
            hashlib.md5(f"{doc_id}_es".encode()).hexdigest()[:15], 16
        )
        keyed.append((math.log((h + 1) / _ES_SCALE) / w, doc_id, w))
    top = sorted(keyed, key=lambda t: (-t[0], t[1]))[:ES_SAMPLE_K]
    assert len(rows) == ES_SAMPLE_K
    got = sorted(rows, key=lambda r: (-r.es_key, r.doc_id))
    for r, (k, doc_id, w) in zip(got, top):
        assert r.doc_id == doc_id and r.weight == w
        assert math.isclose(r.es_key, k, rel_tol=1e-12)


def test_brier_murphy_replay(spark, sf_small):
    """Train rates, test evaluation, and the Murphy identity replayed
    in python; Brier == REL − RES + UNC exactly (bin-constant
    forecasts) and all three parts are non-negative."""
    from kafka_stream_processing_spark.operators.quality_calibration import (
        ISO_BIN_CHARS,
        ISO_TOKEN_THRESHOLD,
    )

    rows = SPECS["quality_brier_calibration_split"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT n_chars, text, source"
        f" FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    train: dict[int, list] = {}
    test: dict[int, list] = {}
    for n_chars, text, source in docs:
        b = n_chars // ISO_BIN_CHARS
        y = 1 if len(text.split(" ")) > ISO_TOKEN_THRESHOLD else 0
        (test if source == "src0" else train).setdefault(b, []).append(y)
    bins = {
        b: (
            sum(train[b]) / len(train[b]),
            sum(ys) / len(ys),
            len(ys),
            sum(ys),
        )
        for b, ys in test.items()
        if b in train
    }
    n = sum(nt for _, _, nt, _ in bins.values())
    obar = sum(yt for _, _, _, yt in bins.values()) / n
    rel = (
        sum(
            round(nt * (f - o) ** 2, 12)
            for f, o, nt, _ in bins.values()
        )
        / n
    )
    res = (
        sum(
            round(nt * (o - obar) ** 2, 12)
            for _, o, nt, _ in bins.values()
        )
        / n
    )
    unc = obar * (1 - obar)
    got = {r.bin: r for r in rows}
    assert set(got) == set(bins)
    for b, (f, o, nt, _) in bins.items():
        r = got[b]
        assert r.n_test == nt
        assert abs(r.f_pred - f) < 1e-12
        assert abs(r.obs_rate - o) < 1e-12
        assert abs(r.reliability - rel) < 1e-9
        assert abs(r.resolution - res) < 1e-9
        assert abs(r.uncertainty - unc) < 1e-12
        assert abs(r.brier - (rel - res + unc)) < 1e-9
        assert r.reliability >= 0 and r.resolution >= 0
        assert 0 <= r.uncertainty <= 0.25


def test_interevent_burstiness_replay(spark, sf_small):
    """Gap moments replayed from sorted per-type sequences; B within
    (-1, 1)."""
    rows = SPECS["window_interevent_burstiness"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_type, epoch_us(ts), event_id"
        f" FROM '{sf_small}/events.parquet'"
        f" ORDER BY event_type, 2, 3"
    ).fetchall()
    gaps: dict[str, list] = {}
    prev = {}
    for et, us, _ in ev:
        if et in prev:
            gaps.setdefault(et, []).append(us - prev[et])
        prev[et] = us
    got = {r.event_type: r for r in rows}
    assert set(got) == set(gaps)
    for et, ds in gaps.items():
        n = len(ds)
        mu = sum(ds) / n
        sigma = math.sqrt(sum(d * d for d in ds) / n - mu * mu)
        r = got[et]
        assert r.n_gaps == n
        assert abs(r.mean_gap_us - mu) < 1e-6
        assert abs(r.std_gap_us - sigma) < 1e-6
        assert abs(r.burstiness - (sigma - mu) / (sigma + mu)) < 1e-9
        assert -1.0 < r.burstiness < 1.0


def test_trade_reciprocity_replay(spark, sf_small):
    """Edge and weight reciprocity replayed from the directed edge
    dict; weighted <= binary reciprocity on trade-count weights."""
    row = SPECS["graph_trade_reciprocity"].fn(spark, sf_small).collect()[0]
    con = duckdb.connect()
    edges = {
        (s, d): w
        for s, d, w in con.execute(
            f"""
            SELECT n1.n_name, n2.n_name, count(*)
            FROM '{sf_small}/lineitem.parquet' l
            JOIN '{sf_small}/orders.parquet' o ON o_orderkey = l_orderkey
            JOIN '{sf_small}/customer.parquet' c ON c_custkey = o_custkey
            JOIN '{sf_small}/supplier.parquet' s ON s_suppkey = l_suppkey
            JOIN '{sf_small}/nation.parquet' n1
              ON n1.n_nationkey = s.s_nationkey
            JOIN '{sf_small}/nation.parquet' n2
              ON n2.n_nationkey = c.c_nationkey
            WHERE n1.n_name <> n2.n_name GROUP BY 1, 2
            """
        ).fetchall()
    }
    n_edges = len(edges)
    n_rec = sum(1 for (s, d) in edges if (d, s) in edges)
    w_total = sum(edges.values())
    w_rec = sum(
        min(w, edges.get((d, s), 0)) for (s, d), w in edges.items()
    )
    assert row.n_edges == n_edges
    assert row.n_reciprocated == n_rec
    assert row.reciprocity == n_rec / n_edges
    assert row.w_total == w_total and row.w_reciprocal == w_rec
    assert row.weighted_reciprocity == w_rec / w_total
    assert row.weighted_reciprocity <= row.reciprocity + 1e-12


def test_stream_funnel_monitor_per_chunk_replay(spark, sf_small):
    """Within-chunk funnel counts replayed from the deterministic
    (ts, event_id)-sorted thirds."""
    rows = SPECS["stream_funnel_monitor"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_id, ts, user_id, event_type"
        f" FROM '{sf_small}/events.parquet'"
        f" ORDER BY ts, event_id"
    ).fetchall()
    n = len(ev)
    step = (n + 2) // 3
    chunks: dict[int, list] = {}
    chunk_key: dict[int, int] = {}
    for rn, (eid, ts, user, et) in enumerate(ev):
        cid = rn // step
        chunk_key[cid] = min(chunk_key.get(cid, eid), eid)
        chunks.setdefault(cid, []).append((user, ts, et))
    got = {r.chunk_min_event_id: r for r in rows}
    assert set(got) == {chunk_key[c] for c in chunks}
    for cid, evs in chunks.items():
        fc: dict[int, object] = {}
        for user, ts, et in evs:
            if et == "click" and (
                user not in fc or ts < fc[user]
            ):
                fc[user] = ts
        conv = {
            user
            for user, ts, et in evs
            if et == "purchase" and user in fc and ts > fc[user]
        }
        r = got[chunk_key[cid]]
        assert r.n_clicked == len(fc)
        assert r.n_converted == len(conv)
        if len(fc):
            assert r.conversion_rate == len(conv) / len(fc)


def test_phash_near_dup_positive_path(spark, tmp_path):
    """The banded-Hamming kernel on a STAGED corpus with crafted
    perceptual duplicates: case/whitespace variants collide at
    Hamming 0; distinct content does not pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_stream_processing_spark.operators.multimodal import (
        phash_stub,
    )
    from kafka_stream_processing_spark.registry import all_specs

    docs = [
        (1, "The Quick Brown Fox"),
        (2, "the  quick   brown fox"),   # whitespace+case variant of 1
        (3, "a completely different document body"),
        (4, "A COMPLETELY DIFFERENT DOCUMENT BODY"),  # case variant of 3
        (5, "nothing like the others at all whatsoever"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": [d for d, _ in docs],
                "text": [t for _, t in docs],
                "lang": ["en"] * 5,
                "source": ["src1"] * 5,
                "n_chars": [len(t) for _, t in docs],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = all_specs()["multimodal_phash_near_dup"].fn(
        spark, str(tmp_path)
    ).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert pairs == {(1, 2): 0, (3, 4): 0}
    # the stub itself is invariant exactly to case+whitespace
    assert phash_stub(b"The Quick Brown Fox") == phash_stub(
        b"the  quick   brown fox"
    )
    assert phash_stub(b"abc") != phash_stub(b"abd")


def test_phash_near_dup_empty_on_distinct_corpus(spark, sf_small):
    """The synthetic corpus has no perceptual duplicates: uniform
    60-bit hashes sharing a 15-bit band never sit within Hamming 8 —
    the op's empty result is the CORRECT verdict, not a dead path
    (the positive path is pinned by the staged-corpus test)."""
    rows = SPECS["multimodal_phash_near_dup"].fn(
        spark, sf_small
    ).collect()
    assert rows == []


def test_vocab_coverage_spectrum_replay(spark, sf_small):
    """Spectrum replayed from a Counter; monotone in both cumulative
    columns, top row covers the max-frequency types, bottom row covers
    the whole mass."""
    from collections import Counter

    rows = sorted(
        SPECS["text_vocab_coverage_spectrum"].fn(
            spark, sf_small
        ).collect(),
        key=lambda r: -r.freq,
    )
    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    cnt = Counter()
    for (t,) in texts:
        cnt.update(t.split(" "))
    coc = Counter(cnt.values())
    n = sum(cnt.values())
    freqs = sorted(coc, reverse=True)
    assert [r.freq for r in rows] == freqs
    types_ge = mass_ge = 0
    for r, m in zip(rows, freqs):
        types_ge += coc[m]
        mass_ge += m * coc[m]
        assert r.n_types_at == coc[m]
        assert r.n_types_ge == types_ge
        assert r.mass_ge == mass_ge
        assert r.mass_share == mass_ge / n
    assert rows[-1].n_types_ge == len(cnt)
    assert rows[-1].mass_ge == n and rows[-1].mass_share == 1.0


def test_top_event_paths_replay(spark, sf_small):
    """3-gram path counts replayed from per-user sorted sequences;
    the cut respects (count desc, path) and shares sum over the
    reported subset consistently."""
    from kafka_stream_processing_spark.operators.windowed import (
        PATHS_TOP_K,
    )

    rows = SPECS["window_top_event_paths"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, ts, event_id, event_type"
        f" FROM '{sf_small}/events.parquet'"
        f" ORDER BY user_id, ts, event_id"
    ).fetchall()
    counts: dict[str, int] = {}
    hist: list = []
    prev_user = None
    for user, _, _, et in ev:
        if user != prev_user:
            hist = []
            prev_user = user
        hist.append(et)
        if len(hist) >= 3:
            p = ">".join(hist[-3:])
            counts[p] = counts.get(p, 0) + 1
    total = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        :PATHS_TOP_K
    ]
    assert len(rows) == min(PATHS_TOP_K, len(counts))
    for r, (p, n) in zip(rows, top):
        assert r.path == p and r.n == n
        assert r.share == n / total


def test_record_days_trend_replay(spark, sf_small):
    """Record flags, H_n, and the ratio replayed; exactly n_records
    True flags and day 1 is always a record."""
    rows = sorted(
        SPECS["window_record_days_trend"].fn(spark, sf_small).collect(),
        key=lambda r: r.day,
    )
    acc = _daily(sf_small, by_type=False)
    days = sorted(acc)
    n = len(days)
    run_max = None
    exp_flags = []
    for d in days:
        x = acc[d]
        exp_flags.append(run_max is None or x > run_max)
        run_max = x if run_max is None else max(run_max, x)
    n_records = sum(exp_flags)
    h_n = sum(round(1.0 / k, 12) for k in range(1, n + 1))
    assert len(rows) == n
    for r, flag in zip(rows, exp_flags):
        assert r.is_record == flag
        assert r.n_records == n_records
        assert abs(r.expected_records_iid - h_n) < 1e-9
        assert abs(r.records_ratio - n_records / h_n) < 1e-9
    assert rows[0].is_record is True


def test_capture_recapture_replay(spark, sf_small):
    """Chapman estimator replayed from python sets; the estimate is
    at least the overlap-based lower bound and n_observed is sane."""
    row = SPECS["quality_capture_recapture_users"].fn(
        spark, sf_small
    ).collect()[0]
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, ts FROM '{sf_small}/events.parquet'"
    ).fetchall()
    cut = dt.datetime(2024, 1, 16)
    w1 = {u for u, ts in ev if ts < cut}
    w2 = {u for u, ts in ev if ts >= cut}
    m = len(w1 & w2)
    chapman = (len(w1) + 1) * (len(w2) + 1) / (m + 1) - 1.0
    assert (row.n1, row.n2, row.n_both) == (len(w1), len(w2), m)
    assert row.n_observed == len(w1 | w2)
    assert abs(row.chapman_estimate - chapman) < 1e-9
    assert abs(row.est_unseen - (chapman - len(w1 | w2))) < 1e-9


def test_hw_skill_vs_naive_replay(spark, sf_small):
    """MASE/U2 replayed by re-running the Holt-Winters python fold of
    test_holt_winters_python_replay and the lag-7 naive on common
    days."""
    from kafka_stream_processing_spark.operators.windowed import (
        HW_PERIOD,
    )

    m = HW_PERIOD
    rows = SPECS["window_hw_skill_vs_naive"].fn(spark, sf_small).collect()
    acc = _daily(sf_small, by_type=True)
    series: dict[str, list] = {}
    for (et, day), v in sorted(acc.items()):
        series.setdefault(et, []).append(float(v))
    got = {r.event_type: r for r in rows}
    for et, xs in series.items():
        if len(xs) < 2 * m:
            assert et not in got
            continue
        micro = [round(x * 1e6) for x in xs]
        m1 = (sum(micro[:m]) / 1e6) / m
        m2 = (sum(micro[m : 2 * m]) / 1e6) / m
        l, b = _r6(m1), _r6((m2 - m1) / m)
        s = [_r6(xs[i] - m1) for i in range(m)]
        fs = {}
        for t in range(m + 1, len(xs) + 1):
            x = xs[t - 1]
            fs[t] = l + b + s[0]
            l_new = _r6(0.5 * (x - s[0]) + 0.5 * (l + b))
            b_new = _r6(0.5 * (l_new - l) + 0.5 * b)
            s_new = _r6(0.5 * (x - l_new) + 0.5 * s[0])
            l, b, s = l_new, b_new, s[1:] + [s_new]
        pts = [
            (xs[t - 1], fs[t], xs[t - 1 - m])
            for t in range(m + 1, len(xs) + 1)
        ]
        n = len(pts)
        sae_hw = sum(round(abs(x - f), 6) for x, f, _ in pts)
        sae7 = sum(round(abs(x - f7), 6) for x, _, f7 in pts)
        sse_hw = sum(round((x - f) ** 2, 6) for x, f, _ in pts)
        sse7 = sum(round((x - f7) ** 2, 6) for x, _, f7 in pts)
        r = got[et]
        assert r.n_eval == n
        assert abs(r.mae_hw - sae_hw / n) < 1e-9
        assert abs(r.mae_naive7 - sae7 / n) < 1e-9
        assert abs(r.mase_hw - (sae_hw / n) / (sae7 / n)) < 1e-9
        assert abs(r.theil_u2_hw - math.sqrt(sse_hw / sse7)) < 1e-9


def test_rich_club_replay(spark, sf_small):
    """phi(k) replayed from the sparsified adjacency; phi is defined
    exactly where >= 2 nodes qualify and n_nodes_gt strictly
    decreases in k."""
    from kafka_stream_processing_spark.operators.graph import (
        _sig_adj_df,
    )

    rows = sorted(
        SPECS["graph_rich_club_coefficient"].fn(
            spark, sf_small
        ).collect(),
        key=lambda r: r.k,
    )
    adj = [(r.a, r.b) for r in _sig_adj_df(spark, sf_small).collect()]
    deg: dict[str, int] = {}
    for a, b in adj:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    # thresholds whose club is empty (k = max degree) emit no row on
    # either engine — the inner-join convention
    ks = sorted(
        k
        for k in set(deg.values())
        if any(d > k for d in deg.values())
    )
    exp = {}
    for k in ks:
        rich = {n for n, d in deg.items() if d > k}
        e_within = sum(1 for a, b in adj if a in rich and b in rich)
        nk = len(rich)
        phi = (
            2 * e_within / (nk * (nk - 1)) if nk >= 2 else None
        )
        exp[k] = (nk, e_within, phi)
    assert [r.k for r in rows] == ks
    prev_n = None
    for r in rows:
        nk, e_within, phi = exp[r.k]
        assert r.n_nodes_gt == nk
        assert r.n_edges_within == e_within
        if phi is None:
            assert r.phi is None
        else:
            assert abs(r.phi - phi) < 1e-12
        if prev_n is not None:
            assert r.n_nodes_gt <= prev_n
        prev_n = r.n_nodes_gt


def test_intraday_profile_replay(spark, sf_small):
    """dow×hour grid replayed; shares sum to 1 and dow uses the
    0=Sunday..6 convention on both engines."""
    rows = SPECS["window_intraday_seasonal_profile"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT ts, value FROM '{sf_small}/events.parquet'"
    ).fetchall()
    cells: dict[tuple[int, int], list] = {}
    for ts, v in ev:
        # python weekday(): Mon=0..Sun=6 → 0=Sunday convention
        dow = (ts.weekday() + 1) % 7
        key = (dow, ts.hour)
        c = cells.setdefault(key, [0, 0])
        c[0] += 1
        c[1] += round(v * 10**6)
    total = sum(c[1] for c in cells.values())
    got = {(r.dow, r.hour): r for r in rows}
    assert set(got) == set(cells)
    for key, (n, rev) in cells.items():
        r = got[key]
        assert r.n_events == n
        assert abs(r.revenue - rev / 1e6) < 1e-6
        assert abs(r.share - (rev / 1e6) / (total / 1e6)) < 1e-9
        assert 0 <= r.dow <= 6 and 0 <= r.hour <= 23
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9


def test_user_growth_curve_replay(spark, sf_small):
    """First-seen cohorts replayed; cum is monotone and penetration
    ends at exactly 1."""
    rows = sorted(
        SPECS["window_user_growth_curve"].fn(spark, sf_small).collect(),
        key=lambda r: r.day,
    )
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE))"
        f" FROM '{sf_small}/events.parquet' GROUP BY 1"
    ).fetchall()
    cohorts: dict = {}
    for _, d in ev:
        cohorts[d] = cohorts.get(d, 0) + 1
    total = sum(cohorts.values())
    assert len(rows) == len(cohorts)
    cum = 0
    for r in rows:
        d = dt.date.fromisoformat(r.day)
        cum += cohorts[d]
        assert r.new_users == cohorts[d]
        assert r.cum_users == cum
        assert r.penetration == cum / total
    assert rows[-1].penetration == 1.0


def test_dau_wau_mau_replay(spark, sf_small):
    """Sliding distinct counts replayed from python presence sets;
    dau <= wau <= mau and stickiness in (0, 1]."""
    from kafka_stream_processing_spark.operators.windowed import (
        MAU_DAYS,
        WAU_DAYS,
    )

    rows = SPECS["window_dau_wau_mau"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE)"
        f" FROM '{sf_small}/events.parquet'"
    ).fetchall()
    by_day: dict = {}
    for u, d in ev:
        by_day.setdefault(d, set()).add(u)
    days = sorted(by_day)
    got = {r.day: r for r in rows}
    assert set(got) == {d.isoformat() for d in days}
    for d in days:
        wau = set()
        mau = set()
        for d2 in days:
            delta = (d - d2).days
            if 0 <= delta < WAU_DAYS:
                wau |= by_day[d2]
            if 0 <= delta < MAU_DAYS:
                mau |= by_day[d2]
        r = got[d.isoformat()]
        assert r.dau == len(by_day[d])
        assert r.wau == len(wau)
        assert r.mau == len(mau)
        assert r.dau <= r.wau <= r.mau
        assert r.stickiness == len(by_day[d]) / len(mau)
        assert 0 < r.stickiness <= 1.0


def test_roc_auc_bruteforce_replay(spark, sf_small):
    """AUC replayed by the brute-force pair DEFINITION
    P(s⁺>s⁻) + ½P(s⁺=s⁻) (the engine uses the rank identity —
    different algorithm); AUC in [0, 1]."""
    from kafka_stream_processing_spark.operators.quality_calibration import (
        ISO_TOKEN_THRESHOLD,
    )

    row = SPECS["quality_roc_auc_length_classifier"].fn(
        spark, sf_small
    ).collect()[0]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT n_chars, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    pos, neg = [], []
    for n_chars, text in docs:
        (
            pos
            if len(text.split(" ")) > ISO_TOKEN_THRESHOLD
            else neg
        ).append(n_chars)
    wins = ties = 0
    for p in pos:
        for q in neg:
            if p > q:
                wins += 1
            elif p == q:
                ties += 1
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    assert abs(row.auc - auc) < 1e-12
    assert 0.0 <= row.auc <= 1.0


def test_ljung_box_replay(spark, sf_small):
    """Residual ACF and Q replayed from exact daily totals; verdict
    matches the chi2_7 cutoff."""
    from kafka_stream_processing_spark.operators.windowed import (
        ACF_MAX_LAG,
        CHI2_7_005,
    )

    rows = sorted(
        SPECS["window_ljung_box_residuals"].fn(
            spark, sf_small
        ).collect(),
        key=lambda r: r.lag_k,
    )
    acc = _daily(sf_small, by_type=False)
    d0 = {
        (d - dt.date(1970, 1, 1)).days: float(acc[d]) for d in acc
    }
    res = {d: d0[d] - d0[d - 7] for d in d0 if d - 7 in d0}
    n = len(res)
    mu = sum(round(e, 6) for e in res.values()) / n
    v = {d: e - mu for d, e in res.items()}
    s0 = sum(round(x * x, 6) for x in v.values())
    rho = {}
    npairs = {}
    for k in range(1, ACF_MAX_LAG + 1):
        pairs = [(v[d], v[d + k]) for d in v if d + k in v]
        npairs[k] = len(pairs)
        rho[k] = sum(round(a * b, 6) for a, b in pairs) / s0
    ssum = sum(
        round(rho[k] * rho[k] / npairs[k], 12)
        for k in range(1, ACF_MAX_LAG + 1)
    )
    q = ssum * n * (n + 2)
    assert [r.lag_k for r in rows] == list(range(1, ACF_MAX_LAG + 1))
    for r in rows:
        assert r.n_pairs == npairs[r.lag_k]
        assert abs(r.acf_resid - rho[r.lag_k]) < 1e-9
        assert abs(r.q_stat - q) < 1e-9
        assert r.autocorrelated_005 == (q > CHI2_7_005)


def test_cohort_ltv_replay(spark, sf_small):
    """LTV grid replayed from per-user first-seen days; cum_revenue is
    monotone within each cohort and ltv = cum / cohort size."""
    from kafka_stream_processing_spark.operators.windowed import (
        LTV_AGE_WEEKS,
    )

    rows = SPECS["window_cohort_ltv_curve"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, CAST(date_trunc('day', ts) AS DATE),"
        f" event_type, value FROM '{sf_small}/events.parquet'"
    ).fetchall()
    first: dict[int, dt.date] = {}
    for u, d, _, _ in ev:
        if u not in first or d < first[u]:
            first[u] = d

    def week_of(d):
        return d - dt.timedelta(days=d.weekday())

    sizes: dict[dt.date, int] = {}
    for u, d in first.items():
        w = week_of(d)
        sizes[w] = sizes.get(w, 0) + 1
    grid: dict[tuple, int] = {}
    for u, d, et, v in ev:
        if et != "purchase":
            continue
        age = (d - first[u]).days // 7
        if age >= LTV_AGE_WEEKS:
            continue
        key = (week_of(first[u]), age)
        grid[key] = grid.get(key, 0) + round(v * 10**6)
    got = {
        (dt.date.fromisoformat(r.cohort_week), r.age_week): r
        for r in rows
    }
    assert set(got) == set(grid)
    by_cohort: dict[dt.date, int] = {}
    for (cw, age) in sorted(grid):
        by_cohort[cw] = by_cohort.get(cw, 0) + grid[(cw, age)]
        r = got[(cw, age)]
        assert r.cohort_users == sizes[cw]
        assert abs(r.week_revenue - grid[(cw, age)] / 1e6) < 1e-6
        assert abs(r.cum_revenue - by_cohort[cw] / 1e6) < 1e-6
        assert abs(
            r.ltv_per_user - (by_cohort[cw] / 1e6) / sizes[cw]
        ) < 1e-6
