"""Round-7 tenth wave: Holt-Winters multiplicative, Croston
intermittent-demand, seasonal Mann-Kendall, Theil decomposition.

Replays use the SEQUENTIAL / textbook definitions (plain float
recursions, per-season loops, direct global Theil) — deliberately
different algorithms from the engine's closed-form / histogram
kernels.  DuckDB differentials are covered by the oracle-parity sweep.
"""

from __future__ import annotations

import math

import duckdb

from kafka_stream_processing_spark.registry import all_specs

SPECS = all_specs()


def _daily_by_type(sf_dir: str) -> dict[str, list[tuple[str, float]]]:
    rows = duckdb.connect().execute(
        f"""SELECT event_type, CAST(CAST(date_trunc('day', ts) AS DATE)
        AS VARCHAR) AS day,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    out: dict[str, list[tuple[str, float]]] = {}
    for t, d, x in rows:
        out.setdefault(t, []).append((d, x))
    return out


def _r6(v: float) -> float:
    return math.copysign(math.floor(abs(v) * 1e6 + 0.5) / 1e6, v)


def test_hw_multiplicative_sequential_replay(spark, sf_small):
    m = 7
    series = _daily_by_type(sf_small)
    rows = SPECS["window_holt_winters_multiplicative"].fn(
        spark, sf_small
    ).collect()
    got: dict[tuple[str, int], object] = {
        (r.event_type, r.idx): r for r in rows
    }
    n_expected = 0
    for t, pts in series.items():
        xs = [x for _, x in pts]
        if len(xs) < 2 * m or min(xs) <= 0:
            continue
        m1 = sum(xs[:m]) / m
        m2 = sum(xs[m : 2 * m]) / m
        l, b = _r6(m1), _r6((m2 - m1) / m)
        s = [_r6(x / m1) for x in xs[:m]]
        n_expected += len(xs) - m + 1
        r0 = got[(t, m)]
        assert abs(r0.level - l) < 2e-6 and abs(r0.trend - b) < 2e-6
        assert r0.forecast is None
        for i in range(m + 1, len(xs) + 1):
            x = xs[i - 1]
            f = (l + b) * s[0]
            l_new = _r6(0.5 * (x / s[0]) + 0.5 * (l + b))
            b_new = _r6(0.5 * (l_new - l) + 0.5 * b)
            s_new = _r6(0.5 * (x / l_new) + 0.5 * s[0])
            r = got[(t, i)]
            assert abs(r.forecast - f) < 1e-3
            assert abs(r.level - l_new) < 1e-3
            assert abs(r.trend - b_new) < 1e-3
            assert abs(r.seasonal - s_new) < 1e-3
            assert abs(r.residual - (x - f)) < 1e-3
            l, b, s = l_new, b_new, s[1:] + [s_new]
    assert len(got) == n_expected


def test_croston_sequential_recursion_replay(spark, sf_small):
    """Engine's dyadic-weight closed form vs the sequential definition
    z_hat_j = (z_j + z_hat_(j-1))/2 run WITHOUT intermediate rounding."""
    rows = duckdb.connect().execute(
        f"""SELECT l_partkey,
        (CAST(date_trunc('week', l_shipdate) AS DATE)
             - DATE '1970-01-01' - 4) // 7 AS t,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        FROM '{sf_small}/lineitem.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series: dict[int, list[tuple[int, float]]] = {}
    for p, t, z in rows:
        series.setdefault(int(p), []).append((int(t), z))
    got = {
        r.part: r
        for r in SPECS["window_croston_intermittent"]
        .fn(spark, sf_small)
        .collect()
    }
    assert set(got) == set(series)
    for p, pts in series.items():
        z_hat = pts[0][1]
        p_hat = 1.0
        prev_t = pts[0][0]
        for t, z in pts[1:]:
            z_hat = 0.5 * z + 0.5 * z_hat
            p_hat = 0.5 * (t - prev_t) + 0.5 * p_hat
            prev_t = t
        r = got[p]
        assert r.n_demands == len(pts)
        assert r.last_week == pts[-1][0]
        assert abs(r.z_hat - z_hat) < 1e-3
        assert abs(r.p_hat - p_hat) < 1e-4
        assert abs(r.croston_forecast - z_hat / p_hat) < 1e-3
        assert abs(r.sba_forecast - 0.75 * r.croston_forecast) < 1e-9


def test_seasonal_mk_per_season_replay(spark, sf_small):
    rows = duckdb.connect().execute(
        f"""SELECT event_type,
        CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS d,
        SUM(CAST(value AS DECIMAL(18,6)))
        FROM '{sf_small}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    by_type: dict[str, list[tuple[int, object]]] = {}
    for t, d, x in rows:
        by_type.setdefault(t, []).append((int(d), x))
    got = {
        r.event_type: r
        for r in SPECS["window_seasonal_mann_kendall"]
        .fn(spark, sf_small)
        .collect()
    }
    for t, pts in by_type.items():
        s_total, var_total, n_total = 0, 0.0, 0
        for w in range(7):
            season = sorted(
                (d, x) for d, x in pts if d % 7 == w
            )
            n = len(season)
            n_total += n
            for i in range(n):
                for j in range(i + 1, n):
                    if season[j][1] > season[i][1]:
                        s_total += 1
                    elif season[j][1] < season[i][1]:
                        s_total -= 1
            from collections import Counter

            ties = Counter(x for _, x in season)
            ts = sum(
                c * (c - 1) * (2 * c + 5)
                for c in ties.values()
                if c > 1
            )
            var_total += (n * (n - 1) * (2 * n + 5) - ts) / 18.0
        r = got[t]
        assert r.n_days == n_total
        assert r.s_stat == s_total
        assert abs(r.var_s - var_total) < 1e-9
        if s_total > 0:
            z = (s_total - 1) / math.sqrt(var_total)
        elif s_total < 0:
            z = (s_total + 1) / math.sqrt(var_total)
        else:
            z = 0.0
        assert abs(r.z_stat - z) < 1e-12
        assert r.trend_005 == (abs(z) > 1.959963984540054)


def test_theil_decomposition_identity(spark, sf_small):
    """sum(within_contrib) + sum(between_contrib) must equal the
    directly computed global Theil T — the decomposition is exact."""
    rows = duckdb.connect().execute(
        f"""SELECT n_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        AS DOUBLE)
        FROM '{sf_small}/orders.parquet' o
        JOIN '{sf_small}/customer.parquet' c ON c_custkey = o_custkey
        JOIN '{sf_small}/nation.parquet' n ON n_nationkey = c_nationkey
        GROUP BY c_custkey, n_name"""
    ).fetchall()
    ys = [y for _, y in rows]
    n = len(ys)
    mu = sum(ys) / n
    t_global = sum((y / mu) * math.log(y / mu) for y in ys) / n
    out = SPECS["window_theil_inequality_decomposition"].fn(
        spark, sf_small
    ).collect()
    total = sum(r.within_contrib for r in out) + sum(
        r.between_contrib for r in out
    )
    assert abs(total - t_global) < 1e-4
    # per-nation replay of T_g and shares
    by_nat: dict[str, list[float]] = {}
    for nat, y in rows:
        by_nat.setdefault(nat, []).append(y)
    got = {r.nation: r for r in out}
    assert set(got) == set(by_nat)
    yy = sum(ys)
    for nat, vals in by_nat.items():
        mg = sum(vals) / len(vals)
        tg = sum((y / mg) * math.log(y / mg) for y in vals) / len(vals)
        r = got[nat]
        assert r.n_customers == len(vals)
        assert abs(r.revenue_share - sum(vals) / yy) < 1e-9
        assert abs(r.t_within - tg) < 1e-6
        assert abs(
            r.between_contrib
            - (sum(vals) / yy) * math.log(mg / mu)
        ) < 1e-6


def test_holt_damped_sequential_replay(spark, sf_small):
    """Damped recursion replayed in plain python; damping must also
    flatten: |forecast_h10 - level| <= 10*|trend| strictly below the
    undamped linear extrapolation when trend != 0."""
    PHI = 0.9
    PHI_SUM = sum(PHI**h for h in range(1, 11))

    def r6(v):
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5) / 1e6, v)

    series = _daily_by_type(sf_small)
    rows = SPECS["window_holt_damped_trend"].fn(
        spark, sf_small
    ).collect()
    got = {(r.event_type, r.idx): r for r in rows}
    for t, pts in series.items():
        xs = [x for _, x in pts]
        if len(xs) < 2:
            continue
        l, b = xs[0], xs[1] - xs[0]
        assert got[(t, 1)].forecast is None
        assert abs(got[(t, 1)].forecast_h10 - (l + b * PHI_SUM)) < 1e-6
        for i in range(2, len(xs) + 1):
            x = xs[i - 1]
            f = l + PHI * b
            l_new = r6(0.5 * x + 0.5 * (l + PHI * b))
            b_new = r6(0.5 * (l_new - l) + 0.5 * PHI * b)
            r = got[(t, i)]
            assert abs(r.forecast - f) < 1e-9
            assert abs(r.level - l_new) < 1e-9
            assert abs(r.trend - b_new) < 1e-9
            assert abs(r.forecast_h10 - (l_new + b_new * PHI_SUM)) < 1e-6
            # damped 10-step extrapolation is strictly inside the
            # undamped one whenever there is any trend at all
            if abs(b_new) > 1e-9:
                assert abs(r.forecast_h10 - r.level) < 10 * abs(
                    b_new
                )
            l, b = l_new, b_new


def test_char_ngram_langid_python_replay(spark, sf_small):
    """Profiles and predictions replayed with plain dict counting."""
    from collections import Counter, defaultdict

    docs = duckdb.connect().execute(
        f"SELECT doc_id, lang, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    by_lang = defaultdict(Counter)
    tri_of = {}
    for doc_id, lang, text in docs:
        tris = [text[p : p + 3] for p in range(len(text) - 2)]
        tri_of[doc_id] = tris
        by_lang[lang].update(tris)
    profiles = {
        lang: {
            t
            for t, _ in sorted(
                cnt.items(), key=lambda kv: (-kv[1], kv[0])
            )[:50]
        }
        for lang, cnt in by_lang.items()
    }
    rows = SPECS["text_langid_char_ngram_profile"].fn(
        spark, sf_small
    ).collect()
    assert len(rows) == len(docs)
    got = {r.doc_id: r for r in rows}
    n_correct = 0
    for doc_id, lang, text in docs:
        scores = {
            pl: sum(1 for t in tri_of[doc_id] if t in prof)
            for pl, prof in profiles.items()
        }
        best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        pred = best[0] if best[1] > 0 else "und"
        r = got[doc_id]
        assert r.labeled_lang == lang
        assert r.predicted_lang == pred
        n_correct += pred == lang
    # factual floor only: predictions live in the label space and at
    # least SOME docs are classified correctly.  (On this synthetic
    # corpus the languages share one vocabulary pool, so trigram
    # profiles overlap heavily — absolute accuracy is a property of
    # the DATA, not of the operator, and is not asserted.)
    labels = {lang for _, lang, _ in docs}
    assert {r.predicted_lang for r in rows} <= labels | {"und"}
    assert n_correct > 0
