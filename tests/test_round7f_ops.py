"""Round-7 sixth wave: statistical-inference family — PSI drift,
Cramér's V association, two-proportion z-test.

Each test replays the statistic in plain Python from the parquet via
DuckDB (independent arithmetic path — no SQL reuse of the oracle) and
pins the engine's output against it; the oracle-parity sweep
(test_oracle_parity.py) covers the DuckDB differential separately.
"""

from __future__ import annotations

import math

import duckdb

from kafka_stream_processing_spark.operators.quality_edf import (
    PSI_BUCKET_CHARS,
    PSI_DRIFT_THRESHOLD,
    PSI_SMOOTH,
)
from kafka_stream_processing_spark.operators.quality_kernel import Z_CRIT_005
from kafka_stream_processing_spark.registry import all_specs

SPECS = all_specs()


def _docs(sf):
    con = duckdb.connect()
    return con.execute(
        f"SELECT lang, source, n_chars FROM '{sf}/documents.parquet'"
    ).fetchall()


def test_psi_python_replay(spark, sf_small):
    rows = SPECS["quality_psi_drift"].fn(spark, sf_small).collect()
    docs = _docs(sf_small)
    hist: dict[int, list[int]] = {}
    for _, source, n_chars in docs:
        b = n_chars // PSI_BUCKET_CHARS
        hist.setdefault(b, [0, 0])
        hist[b][0 if source == "src0" else 1] += 1
    k = len(hist)
    na = sum(v[0] for v in hist.values())
    nb = sum(v[1] for v in hist.values())
    psi = 0.0
    for ca, cb in hist.values():
        p = (ca + PSI_SMOOTH) / (na + PSI_SMOOTH * k)
        q = (cb + PSI_SMOOTH) / (nb + PSI_SMOOTH * k)
        psi += round((p - q) * math.log(p / q), 6)
    assert len(rows) == k
    got = {r.bucket: r for r in rows}
    assert set(got) == set(hist)
    for b, (ca, cb) in hist.items():
        assert got[b].n_ref == ca and got[b].n_cur == cb
    for r in rows:
        assert abs(r.psi - psi) < 1e-9
        assert r.drift == (psi > PSI_DRIFT_THRESHOLD)
    # per-bucket terms sum back to the reported PSI (internal consistency)
    assert abs(sum(r.psi_term for r in rows) - rows[0].psi) < 1e-9


def test_psi_identical_split_is_zero(spark, sf_small):
    """PSI of a distribution against itself is exactly 0 — replayed on
    the engine's own per-bucket output: p_ref==p_cur ⇒ every term 0."""
    rows = SPECS["quality_psi_drift"].fn(spark, sf_small).collect()
    for r in rows:
        # smoothing keeps both proportions strictly positive and finite
        assert 0.0 < r.p_ref < 1.0 and 0.0 < r.p_cur < 1.0
        if abs(r.p_ref - r.p_cur) < 1e-15:
            assert r.psi_term == 0.0
        else:
            # each term of Σ(p−q)ln(p/q) is individually non-negative
            assert r.psi_term >= 0.0


def test_cramers_v_python_replay(spark, sf_small):
    rows = SPECS["quality_cramers_v_assoc"].fn(spark, sf_small).collect()
    docs = _docs(sf_small)
    cells: dict[tuple[str, str], int] = {}
    langs, sources = set(), set()
    for lang, source, _ in docs:
        langs.add(lang)
        sources.add(source)
        cells[(lang, source)] = cells.get((lang, source), 0) + 1
    n = len(docs)
    rl = {
        lg: sum(cells.get((lg, s), 0) for s in sources) for lg in langs
    }
    cs = {
        s: sum(cells.get((lg, s), 0) for lg in langs) for s in sources
    }
    chi2 = 0.0
    for lg in langs:
        for s in sources:
            e = rl[lg] * cs[s] / n
            o = cells.get((lg, s), 0)
            chi2 += round((o - e) * (o - e) / e, 6)
    v = math.sqrt(chi2 / (n * (min(len(langs), len(sources)) - 1)))
    assert len(rows) == len(langs) * len(sources)
    for r in rows:
        assert abs(r.chi2 - chi2) < 1e-6
        assert abs(r.cramers_v - v) < 1e-9
        assert r.n_obs == cells.get((r.lang, r.source), 0)
    # V is a bounded effect size
    assert 0.0 <= rows[0].cramers_v <= 1.0


def test_ztest_python_replay(spark, sf_small):
    row = (
        SPECS["quality_two_proportion_ztest"]
        .fn(spark, sf_small)
        .collect()[0]
    )
    con = duckdb.connect()
    evs = con.execute(
        f"SELECT user_id, event_type FROM '{sf_small}/events.parquet'"
    ).fetchall()
    cells = [[0, 0], [0, 0]]  # [variant][n, conv]
    for uid, et in evs:
        v = uid % 2
        cells[v][0] += 1
        cells[v][1] += 1 if et == "purchase" else 0
    (n_a, conv_a), (n_b, conv_b) = cells
    assert (row.n_a, row.conv_a, row.n_b, row.conv_b) == (
        n_a,
        conv_a,
        n_b,
        conv_b,
    )
    p_a, p_b = conv_a / n_a, conv_b / n_b
    pool = (conv_a + conv_b) / (n_a + n_b)
    z = (p_a - p_b) / math.sqrt(
        pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b)
    )
    assert row.z_stat == z  # pure IEEE arithmetic — bit-identical
    assert row.significant_005 == (abs(z) > Z_CRIT_005)


# ---------------------------------------------------------------------------
# Time-series family (round-7 seventh wave)
# ---------------------------------------------------------------------------


def _daily(sf, by_type):
    """Per-day (optionally per-event-type) revenue from the parquet,
    summed exactly via Fraction over the 6-decimal quantized values."""
    from fractions import Fraction

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,"
        f" value FROM '{sf}/events.parquet'"
    ).fetchall()
    acc: dict = {}
    for et, day, v in rows:
        key = (et, day) if by_type else day
        q = Fraction(round(v * 10**6)) / 10**6
        acc[key] = acc.get(key, Fraction(0)) + q
    return acc


def test_seasonal_naive_python_replay(spark, sf_small):
    from kafka_stream_processing_spark.operators.windowed import (
        SEASONAL_LAG_DAYS,
    )

    rows = (
        SPECS["window_seasonal_naive_backtest"].fn(spark, sf_small).collect()
    )
    acc = _daily(sf_small, by_type=True)
    series: dict[str, list] = {}
    for (et, day), x in sorted(acc.items()):
        series.setdefault(et, []).append(x)
    for r in rows:
        xs = series[r.event_type]
        assert r.n_days == len(xs)
        scored = [
            (xs[i], xs[i - SEASONAL_LAG_DAYS])
            for i in range(SEASONAL_LAG_DAYS, len(xs))
        ]
        assert r.n_scored == len(scored)
        mae = sum(abs(x - f) for x, f in scored) / len(scored)
        smape = sum(
            round(2.0 * abs(float(x - f)) / (float(x) + float(f)), 6)
            for x, f in scored
        ) / len(scored)
        assert abs(r.mae - float(mae)) < 1e-9
        assert abs(r.smape - smape) < 1e-9


def test_theil_sen_python_replay(spark, sf_small):
    rows = SPECS["window_theil_sen_trend"].fn(spark, sf_small).collect()
    acc = _daily(sf_small, by_type=True)
    series: dict[str, list] = {}
    for (et, day), x in sorted(acc.items()):
        d = (day - __import__("datetime").date(1970, 1, 1)).days
        series.setdefault(et, []).append((d, x))
    for r in rows:
        pts = series[r.event_type]
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                (di, xi), (dj, xj) = pts[i], pts[j]
                slopes.append((float(xj - xi) / (dj - di), di, dj))
        slopes.sort()
        assert r.n_pairs == len(slopes)
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        assert r.ts_slope == med  # identical IEEE division both paths
        b = sorted(
            (float(x) - med * d, d) for d, x in pts
        )
        assert r.ts_intercept == b[(len(pts) + 1) // 2 - 1][0]
        # robustness sanity: the fit is finite and n_days matches
        assert r.n_days == len(pts)


def test_acf_python_replay(spark, sf_small):
    from kafka_stream_processing_spark.operators.windowed import (
        ACF_MAX_LAG,
    )

    rows = SPECS["window_acf_daily_revenue"].fn(spark, sf_small).collect()
    acc = _daily(sf_small, by_type=False)
    pts = sorted(
        ((day - __import__("datetime").date(1970, 1, 1)).days, x)
        for day, x in acc.items()
    )
    n = len(pts)
    mu = float(sum(x for _, x in pts)) / n
    dev = {d: float(x) - mu for d, x in pts}
    s0 = sum(round(e * e, 6) for e in dev.values())
    got = {r.lag_k: r for r in rows}
    assert set(got) == set(range(1, ACF_MAX_LAG + 1))
    for k in range(1, ACF_MAX_LAG + 1):
        prs = [
            (dev[d], dev[d + k]) for d, _ in pts if (d + k) in dev
        ]
        sk = sum(round(a * b, 6) for a, b in prs)
        assert got[k].n_pairs == len(prs)
        assert abs(got[k].acf - sk / s0) < 1e-9
    # ACF is bounded and lag-0 would be 1 by construction
    for r in rows:
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# BFS + streaming PSI (round-7 eighth wave)
# ---------------------------------------------------------------------------


def _sig_adj_python(sf):
    """2×mean-significance-sparsified undirected trade adjacency,
    rebuilt independently (the linkpred/BFS sparsifier, NOT k-core's
    median one)."""
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    edges = con.execute("""
        SELECT n1.n_name, n2.n_name, count(*) FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        WHERE n1.n_name <> n2.n_name GROUP BY 1, 2
    """).fetchall()
    ne = len(edges)
    tw = sum(w for _, _, w in edges)
    nbrs: dict[str, set] = {}
    for s, d, w in edges:
        if w * ne >= 2 * tw:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    return nbrs


def test_bfs_python_replay(spark, sf_small):
    """Engine BFS hops == textbook deque BFS from the min node over an
    independently rebuilt sparsified adjacency — exact dict equality,
    unreached nodes absent from both."""
    from collections import deque

    rows = SPECS["graph_bfs_hops_from_source"].fn(spark, sf_small).collect()
    nbrs = _sig_adj_python(sf_small)
    src = min(nbrs)
    dist = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        for v in sorted(nbrs[u]):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    assert {r.node: r.hops for r in rows} == dist


def test_bfs_shares_sparsifier_with_linkpred(spark, sf_small):
    """Kernel-reuse guard: both graph ops call the shared _sig_adj_df
    builder (so the sparsifier can never silently fork), and the BFS
    node set ⊆ linkpred's sparsified node universe."""
    import inspect

    from kafka_stream_processing_spark.operators import graph

    for fn in (
        graph.graph_bfs_hops_from_source,
        graph.graph_link_prediction_common_neighbors,
    ):
        assert "_sig_adj_df(" in inspect.getsource(
            fn.__wrapped__ if hasattr(fn, "__wrapped__") else fn
        )
    rows = SPECS["graph_bfs_hops_from_source"].fn(spark, sf_small).collect()
    assert {r.node for r in rows} <= set(_sig_adj_python(sf_small))


def test_stream_psi_monitor_python_replay(spark, sf_small):
    """Per-chunk PSI trajectory == python replay over the same three
    doc_id-ordered train slices vs the src0 reference histogram."""
    import math

    from kafka_stream_processing_spark.operators.quality_edf import (
        PSI_BUCKET_CHARS,
        PSI_DRIFT_THRESHOLD,
        PSI_SMOOTH,
    )

    rows = SPECS["stream_psi_monitor"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, n_chars FROM "
        f"'{sf_small}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    ref: dict[int, int] = {}
    train = []
    for doc_id, source, n_chars in docs:
        b = n_chars // PSI_BUCKET_CHARS
        if source == "src0":
            ref[b] = ref.get(b, 0) + 1
        else:
            train.append((doc_id, b))
    na = sum(ref.values())
    sz = (len(train) + 2) // 3
    chunks = [train[i : i + sz] for i in range(0, len(train), sz)]
    assert len(rows) == len(chunks)
    got = {r.chunk_min_doc_id: r for r in rows}
    for ch in chunks:
        hist: dict[int, int] = {}
        for _, b in ch:
            hist[b] = hist.get(b, 0) + 1
        buckets = set(ref) | set(hist)
        k = len(buckets)
        nb = len(ch)
        psi = 0.0
        for b in buckets:
            p = (ref.get(b, 0) + PSI_SMOOTH) / (na + PSI_SMOOTH * k)
            q = (hist.get(b, 0) + PSI_SMOOTH) / (nb + PSI_SMOOTH * k)
            psi += round((p - q) * math.log(p / q), 6)
        r = got[ch[0][0]]
        assert r.n_batch == nb
        assert r.n_buckets == k
        assert abs(r.psi - psi) < 1e-9
        assert r.drift == (psi > PSI_DRIFT_THRESHOLD)


# ---------------------------------------------------------------------------
# MI / Spearman / Pearson (round-7 ninth wave)
# ---------------------------------------------------------------------------


def test_mutual_information_python_replay(spark, sf_small):
    import math

    row = (
        SPECS["quality_mutual_information"].fn(spark, sf_small).collect()[0]
    )
    docs = _docs(sf_small)
    cells: dict[tuple[str, str], int] = {}
    rl: dict[str, int] = {}
    cs: dict[str, int] = {}
    for lang, source, _ in docs:
        cells[(lang, source)] = cells.get((lang, source), 0) + 1
        rl[lang] = rl.get(lang, 0) + 1
        cs[source] = cs.get(source, 0) + 1
    n = len(docs)
    mi = sum(
        round((c / n) * math.log(c * n / (rl[lg] * cs[s])), 6)
        for (lg, s), c in cells.items()
    )
    hl = -sum(round((c / n) * math.log(c / n), 6) for c in rl.values())
    hs = -sum(round((c / n) * math.log(c / n), 6) for c in cs.values())
    assert row.n == n
    assert abs(row.mi - mi) < 1e-9
    assert abs(row.h_lang - hl) < 1e-9
    assert abs(row.h_source - hs) < 1e-9
    assert abs(row.nmi - mi / math.sqrt(hl * hs)) < 1e-9
    # information-theoretic bounds: 0 <= I <= min(H); NMI in [0,1]
    assert -1e-6 <= row.mi <= min(hl, hs) + 1e-6
    assert -1e-6 <= row.nmi <= 1 + 1e-6


def test_spearman_python_replay_vs_textbook_ranks(spark, sf_small):
    """Engine rho == textbook Spearman (Pearson over FRACTIONAL
    midranks computed by sorting) — an independent arithmetic path
    from the engine's doubled-integer count-of-counts ranks."""
    import math

    con = duckdb.connect()
    pts = con.execute(
        f"SELECT n_chars, len(string_split(text, ' ')) "
        f"FROM '{sf_small}/documents.parquet'"
    ).fetchall()

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while (
                j + 1 < len(order)
                and vals[order[j + 1]] == vals[order[i]]
            ):
                j += 1
            mr = (i + j) / 2 + 1
            for k in range(i, j + 1):
                r[order[k]] = mr
            i = j + 1
        return r

    ra = midranks([p[0] for p in pts])
    rb = midranks([p[1] for p in pts])
    n = len(pts)
    sa, sb = sum(ra), sum(rb)
    saa = sum(v * v for v in ra)
    sbb = sum(v * v for v in rb)
    sab = sum(a * b for a, b in zip(ra, rb))
    rho = (n * sab - sa * sb) / (
        math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
    )
    row = SPECS["quality_spearman_corr"].fn(spark, sf_small).collect()[0]
    assert row.n == n
    assert abs(row.rho - rho) < 1e-9
    # chars and token count must be strongly monotone-associated
    assert row.rho > 0.5


def test_pearson_python_replay(spark, sf_small):
    import math
    from fractions import Fraction

    rows = (
        SPECS["quality_pearson_corr_lineitem"].fn(spark, sf_small).collect()
    )
    from kafka_stream_processing_spark.operators.quality_assoc import (
        PEARSON_COLS,
    )

    con = duckdb.connect()
    data = con.execute(
        f"SELECT {', '.join(PEARSON_COLS)} FROM "
        f"'{sf_small}/lineitem.parquet'"
    ).fetchall()
    q = {
        c: [Fraction(round(r[i] * 10**6), 10**6) for r in data]
        for i, c in enumerate(PEARSON_COLS)
    }
    n = len(data)
    got = {(r.col_x, r.col_y): r for r in rows}
    assert len(rows) == 6
    for i, a in enumerate(PEARSON_COLS):
        for b in PEARSON_COLS[i + 1:]:
            sx, sy = float(sum(q[a])), float(sum(q[b]))
            sxx = float(sum(v * v for v in q[a]))
            syy = float(sum(v * v for v in q[b]))
            sxy = float(sum(x * y for x, y in zip(q[a], q[b])))
            corr = (n * sxy - sx * sy) / (
                math.sqrt(n * sxx - sx * sx)
                * math.sqrt(n * syy - sy * sy)
            )
            r = got[(a, b)]
            assert r.n == n
            assert abs(r.corr - corr) < 1e-12
    # Cauchy-Schwarz bound (the synthetic generator draws the four
    # measures independently, so near-zero values are the truth here)
    for r in rows:
        assert -1.0 - 1e-12 <= r.corr <= 1.0 + 1e-12


# ---------------------------------------------------------------------------
# Isotonic calibration + streaming z-test monitor (round-7 tenth wave)
# ---------------------------------------------------------------------------


def test_isotonic_matches_sequential_pava(spark, sf_small):
    """The engine's minimax fit == the textbook sequential
    pool-adjacent-violators algorithm (independent arithmetic path,
    Fraction-exact), and the fit is monotone non-decreasing."""
    from fractions import Fraction

    from kafka_stream_processing_spark.operators.quality_calibration import (
        ISO_BIN_CHARS,
        ISO_TOKEN_THRESHOLD,
    )

    rows = sorted(
        SPECS["quality_isotonic_calibration"].fn(spark, sf_small).collect(),
        key=lambda r: r.bin,
    )
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT n_chars, len(string_split(text, ' ')) "
        f"FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    agg: dict[int, list[int]] = {}
    for n_chars, n_tok in docs:
        b = n_chars // ISO_BIN_CHARS
        agg.setdefault(b, [0, 0])
        agg[b][0] += 1
        agg[b][1] += 1 if n_tok > ISO_TOKEN_THRESHOLD else 0
    order = sorted(agg)
    # sequential PAVA on (weight, mean) blocks, exact rationals
    blocks: list[list] = []  # [w, sum_y, first_bin_count]
    for b in order:
        w, y = agg[b]
        blocks.append([w, y, 1])
        while len(blocks) > 1 and Fraction(
            blocks[-2][1], blocks[-2][0]
        ) >= Fraction(blocks[-1][1], blocks[-1][0]):
            w2, y2, c2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += y2
            blocks[-1][2] += c2
    fitted = []
    for w, y, c in blocks:
        fitted.extend([Fraction(y, w)] * c)
    assert [r.bin for r in rows] == order
    for r, f in zip(rows, fitted):
        assert r.rate_isotonic == float(f)  # single int division each
        assert r.n == agg[r.bin][0] and r.n_pos == agg[r.bin][1]
    for a, b in zip(rows, rows[1:]):
        assert a.rate_isotonic <= b.rate_isotonic + 1e-15
    # weighted means are preserved (PAVA is a projection)
    tot_raw = sum(r.n * r.rate_raw for r in rows)
    tot_fit = sum(r.n * r.rate_isotonic for r in rows)
    assert abs(tot_raw - tot_fit) < 1e-6


def test_stream_ab_ztest_monitor_python_replay(spark, sf_small):
    """Per-chunk z trajectory == python replay over the same
    (ts, event_id)-ordered third slices; cells sum to the batch
    gate's global cells."""
    import math

    from kafka_stream_processing_spark.operators.quality_kernel import (
        Z_CRIT_005,
    )

    rows = SPECS["stream_ab_ztest_monitor"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    evs = con.execute(
        f"SELECT event_id, user_id, event_type FROM "
        f"'{sf_small}/events.parquet' ORDER BY ts, event_id"
    ).fetchall()
    sz = (len(evs) + 2) // 3
    chunks = [evs[i : i + sz] for i in range(0, len(evs), sz)]
    assert len(rows) == len(chunks)
    got = {r.chunk_min_event_id: r for r in rows}
    for ch in chunks:
        key = min(e[0] for e in ch)
        n_a = sum(1 for e in ch if e[1] % 2 == 0)
        conv_a = sum(
            1 for e in ch if e[1] % 2 == 0 and e[2] == "purchase"
        )
        n_b = len(ch) - n_a
        conv_b = sum(
            1 for e in ch if e[1] % 2 == 1 and e[2] == "purchase"
        )
        r = got[key]
        assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (
            n_a,
            conv_a,
            n_b,
            conv_b,
        )
        p_a, p_b = conv_a / n_a, conv_b / n_b
        pool = (conv_a + conv_b) / (n_a + n_b)
        z = (p_a - p_b) / math.sqrt(
            pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b)
        )
        assert r.z_stat == z
        assert r.significant_005 == (abs(z) > Z_CRIT_005)
    # chunk cells partition the global gate's cells
    g = SPECS["quality_two_proportion_ztest"].fn(spark, sf_small).collect()[0]
    assert sum(r.n_a for r in rows) == g.n_a
    assert sum(r.conv_a for r in rows) == g.conv_a
    assert sum(r.n_b for r in rows) == g.n_b
    assert sum(r.conv_b for r in rows) == g.conv_b


# ---------------------------------------------------------------------------
# Kappa / burstiness / rolling-z / Kaplan-Meier (round-7 eleventh wave)
# ---------------------------------------------------------------------------


def test_cohens_kappa_python_replay(spark, sf_small):
    """Kappa replayed from the engine's OWN langid predictions (kernel
    reuse is the point — the confusion counts are shared), plus the
    chance-correction identity kappa <= po."""
    row = (
        SPECS["quality_cohens_kappa_langid"].fn(spark, sf_small).collect()[0]
    )
    preds = SPECS["text_language_id"].fn(spark, sf_small).collect()
    n = len(preds)
    agree = sum(1 for p in preds if p.labeled_lang == p.predicted_lang)
    rl: dict[str, int] = {}
    cl: dict[str, int] = {}
    for p in preds:
        rl[p.labeled_lang] = rl.get(p.labeled_lang, 0) + 1
        cl[p.predicted_lang] = cl.get(p.predicted_lang, 0) + 1
    cross = sum(rl[c] * cl[c] for c in set(rl) & set(cl))
    po = agree / n
    pe = cross / (n * n)
    assert row.n == n
    assert row.po == po
    assert row.pe == pe
    assert row.kappa == (po - pe) / (1.0 - pe)
    assert row.kappa <= row.po + 1e-12


def test_burstiness_python_replay(spark, sf_small):
    from kafka_stream_processing_spark.operators.text import (
        BURST_MIN_DF,
        BURST_TOPK,
    )

    rows = SPECS["text_word_burstiness"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    nd = len(docs)
    per: dict[str, dict[int, int]] = {}
    for i, (text,) in enumerate(docs):
        for w in text.split(" "):
            per.setdefault(w, {}).setdefault(i, 0)
            per[w][i] += 1
    scored = []
    for w, km in per.items():
        if len(km) < BURST_MIN_DF:
            continue
        tf = sum(km.values())
        sk2 = sum(k * k for k in km.values())
        scored.append((-(sk2 / tf - tf / nd), w, len(km), tf))
    scored.sort()
    top = scored[:BURST_TOPK]
    assert len(rows) == min(BURST_TOPK, len(top))
    for r, (negb, w, df, tf) in zip(rows, top):
        assert r.word == w
        assert (r.df, r.tf) == (df, tf)
        assert abs(r.burstiness - (-negb)) < 1e-9
        # dispersion of counts is bounded below by the Poisson floor
        # minus the finite-N mean correction (= max count ≥ 1 effect):
        assert r.burstiness > 0.0


def test_rolling_zscore_python_replay(spark, sf_small):
    import math

    from kafka_stream_processing_spark.operators.windowed import (
        ROLLZ_THRESHOLD,
        ROLLZ_WIN,
    )

    rows = sorted(
        SPECS["window_rolling_zscore_anomalies"].fn(spark, sf_small).collect(),
        key=lambda r: r.day,
    )
    acc = _daily(sf_small, by_type=False)
    days = sorted(acc)
    xs = [acc[d] for d in days]
    expect = []
    for i in range(ROLLZ_WIN, len(days)):
        win = xs[i - ROLLZ_WIN : i]
        sx = sum(win)
        sxx = sum(v * v for v in win)
        m = float(sx) / ROLLZ_WIN
        s = math.sqrt(
            (float(sxx) - float(sx) * float(sx) / ROLLZ_WIN)
            / (ROLLZ_WIN - 1)
        )
        z = (float(xs[i]) - m) / s
        expect.append((str(days[i]), float(xs[i]), m, s, z))
    assert len(rows) == len(expect)
    for r, (day, x, m, s, z) in zip(rows, expect):
        assert r.day == day
        assert abs(r.revenue - x) < 1e-9
        assert abs(r.roll_mean - m) < 1e-9
        assert abs(r.roll_std - s) < 1e-9
        assert abs(r.z - z) < 1e-9
        assert r.anomaly == (abs(r.z) > ROLLZ_THRESHOLD)


def test_kaplan_meier_python_replay(spark, sf_small):
    import math

    rows = sorted(
        SPECS["window_kaplan_meier_retention"].fn(spark, sf_small).collect(),
        key=lambda r: r.t_days,
    )
    con = duckdb.connect()
    lives = con.execute(f"""
        SELECT CAST(max(d) - min(d) AS INT),
               CAST(max(d) AS DATE) = (
                   SELECT max(CAST(date_trunc('day', ts) AS DATE))
                   FROM '{sf_small}/events.parquet')
        FROM (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
              FROM '{sf_small}/events.parquet')
        GROUP BY user_id
    """).fetchall()
    n = len(lives)
    steps: dict[int, list[int]] = {}
    for t, cens in lives:
        steps.setdefault(t, [0, 0])
        steps[t][1 if cens else 0] += 1
    at_risk = n
    expect = []
    logs = 0.0
    for t in sorted(steps):
        d, c = steps[t]
        if d > 0 and d < at_risk:
            f = (at_risk - d) / at_risk
            logs += round(math.log(f), 6)
            expect.append((t, at_risk, d, c, f, logs))
        at_risk -= d + c
    assert len(rows) == len(expect)
    prev_log = 0.0
    for r, (t, nr, d, c, f, lg) in zip(rows, expect):
        assert (r.t_days, r.n_at_risk, r.d_events, r.c_censored) == (
            t,
            nr,
            d,
            c,
        )
        assert r.factor == f
        assert abs(r.log_survival - lg) < 1e-9
        # survival is non-increasing
        assert r.log_survival <= prev_log + 1e-12
        prev_log = r.log_survival


# ---------------------------------------------------------------------------
# Runs test + Lorenz curve (round-7 twelfth wave)
# ---------------------------------------------------------------------------


def test_runs_test_python_replay(spark, sf_small):
    import math

    from kafka_stream_processing_spark.operators.quality_kernel import (
        Z_CRIT_005,
    )

    row = SPECS["quality_runs_test_daily"].fn(spark, sf_small).collect()[0]
    acc = _daily(sf_small, by_type=False)
    xs = [acc[d] for d in sorted(acc)]
    signs = []
    for a, b in zip(xs, xs[1:]):
        if b > a:
            signs.append(1)
        elif b < a:
            signs.append(-1)
    n1 = signs.count(1)
    n2 = signs.count(-1)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n = n1 + n2
    er = 1.0 + 2.0 * n1 * n2 / n
    vr = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)) / (
        (float(n) * n) * (n - 1)
    )
    z = (runs - er) / math.sqrt(vr)
    assert (row.n_up, row.n_down, row.n_runs) == (n1, n2, runs)
    assert row.expected_runs == er
    assert row.z_stat == z
    assert row.random_005 == (abs(z) <= Z_CRIT_005)


def test_lorenz_python_replay(spark, sf_small):
    from fractions import Fraction

    from kafka_stream_processing_spark.operators.windowed import (
        LORENZ_BUCKETS,
    )

    rows = sorted(
        SPECS["window_lorenz_curve_customers"].fn(spark, sf_small).collect(),
        key=lambda r: r.decile,
    )
    con = duckdb.connect()
    rev = con.execute(f"""
        SELECT c.c_custkey, COALESCE(SUM(o.o_totalprice), 0)
        FROM '{sf_small}/customer.parquet' c
        LEFT JOIN '{sf_small}/orders.parquet' o
          ON o.o_custkey = c.c_custkey
        GROUP BY 1
    """).fetchall()
    vals = sorted(
        (Fraction(round(r * 10**6), 10**6), ck) for ck, r in rev
    )
    n = len(vals)
    base, rem = divmod(n, LORENZ_BUCKETS)
    out = []
    i = 0
    for d in range(1, LORENZ_BUCKETS + 1):
        sz = base + (1 if d <= rem else 0)
        out.append((d, sz, sum(v for v, _ in vals[i : i + sz])))
        i += sz
    total = sum(s for _, _, s in out)
    cum = Fraction(0)
    assert len(rows) == LORENZ_BUCKETS
    for r, (d, sz, s) in zip(rows, out):
        cum += s
        assert r.decile == d
        assert r.n_customers == sz
        assert abs(r.revenue - float(s)) < 1e-6
        assert abs(r.share - float(s / total)) < 1e-12
        assert abs(r.cum_share - float(cum / total)) < 1e-12
    # Lorenz curve properties: shares sorted ascending (deciles are
    # ordered by revenue), cum_share ends at exactly 1
    assert abs(rows[-1].cum_share - 1.0) < 1e-12
    for a, b in zip(rows, rows[1:]):
        assert a.share <= b.share + 1e-12


# ---------------------------------------------------------------------------
# Debounce / skyline / assortativity (round-7 thirteenth wave)
# ---------------------------------------------------------------------------


def test_debounce_python_replay(spark, sf_small):
    from kafka_stream_processing_spark.operators.windowed import (
        DEBOUNCE_SECONDS,
    )

    rows = SPECS["window_debounce_events"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    evs = con.execute(
        f"SELECT user_id, event_type, epoch_us(ts), event_id "
        f"FROM '{sf_small}/events.parquet' ORDER BY ts, event_id"
    ).fetchall()
    streams: dict[tuple, list[int]] = {}
    for uid, et, us, _ in evs:
        streams.setdefault((uid, et), []).append(us)
    kept: dict[str, int] = {}
    dropped: dict[str, int] = {}
    total: dict[str, int] = {}
    for (uid, et), ts_list in streams.items():
        prev = None
        for us in ts_list:
            total[et] = total.get(et, 0) + 1
            if prev is None or us - prev > DEBOUNCE_SECONDS * 10**6:
                kept[et] = kept.get(et, 0) + 1
            else:
                dropped[et] = dropped.get(et, 0) + 1
            prev = us
    got = {r.event_type: r for r in rows}
    assert set(got) == set(total)
    for et in total:
        assert got[et].n_total == total[et]
        assert got[et].n_kept == kept.get(et, 0)
        assert got[et].n_dropped == dropped.get(et, 0)
        assert got[et].n_kept + got[et].n_dropped == got[et].n_total


def test_skyline_python_replay_quadratic(spark, sf_small):
    """The engine's window-frontier skyline == the brute-force O(n²)
    dominance scan (an independent third algorithm beside the engine's
    frontier and the oracle's NOT EXISTS)."""
    rows = SPECS["join_skyline_parts"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    pts = con.execute(
        f"SELECT p_partkey, p_size, p_retailprice "
        f"FROM '{sf_small}/part.parquet'"
    ).fetchall()
    sky = set()
    for pk, sz, pr in pts:
        dominated = any(
            qsz >= sz
            and qpr <= pr
            and (qsz > sz or qpr < pr)
            for _, qsz, qpr in pts
        )
        if not dominated:
            sky.add(pk)
    assert {r.p_partkey for r in rows} == sky
    # frontier shape: along the skyline a strictly larger size must
    # cost strictly more (else it would dominate the smaller point)
    srt = sorted(rows, key=lambda r: (r.p_size, r.p_retailprice))
    for a, b in zip(srt, srt[1:]):
        if b.p_size > a.p_size:
            assert b.p_retailprice > a.p_retailprice


def test_assortativity_python_replay(spark, sf_small):
    import math

    row = (
        SPECS["graph_degree_assortativity"].fn(spark, sf_small).collect()[0]
    )
    nbrs = _sig_adj_python(sf_small)
    deg = {u: len(vs) for u, vs in nbrs.items()}
    xy = [
        (deg[u], deg[v]) for u in nbrs for v in nbrs[u]
    ]  # both orientations
    m = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxx = sum(x * x for x, _ in xy)
    syy = sum(y * y for _, y in xy)
    sxy = sum(x * y for x, y in xy)
    r = (m * sxy - sx * sy) / (
        math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    )
    assert row.n_edges == m // 2
    assert row.n_nodes == len(nbrs)
    assert row.assortativity == r
    assert -1.0 - 1e-12 <= r <= 1.0 + 1e-12


# ---------------------------------------------------------------------------
# PMI collocations + Jarque-Bera (round-7 fourteenth wave)
# ---------------------------------------------------------------------------


def test_pmi_python_replay(spark, sf_small):
    import math

    from kafka_stream_processing_spark.operators.text import (
        PMI_MIN_COUNT,
        PMI_TOPK,
    )

    rows = (
        SPECS["text_bigram_pmi_collocations"].fn(spark, sf_small).collect()
    )
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for (text,) in docs:
        ws = text.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    nu = sum(uni.values())
    nb = sum(bi.values())
    scored = []
    for (a, b), c12 in bi.items():
        if c12 < PMI_MIN_COUNT:
            continue
        pmi = math.log((c12 * nu * nu) / ((nb * uni[a]) * uni[b]))
        scored.append((-pmi, a, b, c12))
    scored.sort()
    top = scored[:PMI_TOPK]
    assert len(rows) == min(PMI_TOPK, len(scored))
    for r, (negp, a, b, c12) in zip(rows, top):
        assert (r.w1, r.w2) == (a, b)
        assert (r.c12, r.c1, r.c2) == (c12, uni[a], uni[b])
        assert abs(r.pmi - (-negp)) < 1e-12


def test_jarque_bera_python_replay(spark, sf_small):
    import math

    from kafka_stream_processing_spark.operators.quality_kernel import (
        CHI2_CRIT_005,
    )

    row = (
        SPECS["quality_jarque_bera_nchars"].fn(spark, sf_small).collect()[0]
    )
    xs = [nc for _, _, nc in _docs(sf_small)]
    n = len(xs)
    sx = sum(xs)
    sxx = sum(x * x for x in xs)
    sxxx = sum(x**3 for x in xs)
    sxxxx = sum(x**4 for x in xs)
    mu = sx / n
    m2 = sxx / n - mu * mu
    m3 = sxxx / n - 3.0 * mu * (sxx / n) + 2.0 * mu * mu * mu
    m4 = (
        sxxxx / n
        - 4.0 * mu * (sxxx / n)
        + 6.0 * mu * mu * (sxx / n)
        - 3.0 * mu * mu * mu * mu
    )
    skew = m3 / (m2 * math.sqrt(m2))
    kurt = m4 / (m2 * m2)
    jb = n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
    assert row.n == n
    assert row.mean == mu
    assert row.skewness == skew
    assert row.kurtosis == kurt
    assert row.jb == jb
    assert row.non_normal == (jb > CHI2_CRIT_005[2])
    # n_chars is length-banded uniform-ish, NOT normal — the gate
    # must fire on this corpus (that's its tripwire value)
    assert row.non_normal


def test_mann_kendall_python_replay(spark, sf_small):
    import math

    from kafka_stream_processing_spark.operators.quality_kernel import (
        Z_CRIT_005,
    )

    rows = SPECS["window_mann_kendall_trend"].fn(spark, sf_small).collect()
    acc = _daily(sf_small, by_type=True)
    series: dict[str, list] = {}
    for (et, day), x in sorted(acc.items()):
        series.setdefault(et, []).append(x)
    assert len(rows) == len(series)
    for r in rows:
        xs = series[r.event_type]
        n = len(xs)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                s += (xs[j] > xs[i]) - (xs[j] < xs[i])
        tie: dict = {}
        for x in xs:
            tie[x] = tie.get(x, 0) + 1
        ts = sum(
            t * (t - 1) * (2 * t + 5) for t in tie.values() if t > 1
        )
        var_s = (n * (n - 1) * (2 * n + 5) - ts) / 18.0
        if s > 0:
            z = (s - 1) / math.sqrt(var_s)
        elif s < 0:
            z = (s + 1) / math.sqrt(var_s)
        else:
            z = 0.0
        assert r.n_days == n
        assert r.s_stat == s
        assert r.var_s == var_s
        assert r.z_stat == z
        assert r.trend_005 == (abs(z) > Z_CRIT_005)
        # S is bounded by the pair count
        assert abs(s) <= n * (n - 1) // 2


# ---------------------------------------------------------------------------
# Block orthogonal iteration PCA (round-7 fifteenth wave)
# ---------------------------------------------------------------------------


def _cov_from_parquet(sf):
    import numpy as np

    con = duckdb.connect()
    t = con.execute(
        f"SELECT embedding FROM '{sf}/embeddings.parquet'"
    ).fetchnumpy()
    X = np.array([np.array(e, dtype=np.float64) for e in t["embedding"]])
    mu = X.mean(0)
    D = X - mu
    return mu, D.T @ D / len(X)


def test_pca_block_iteration_numpy_reference(spark, sf_small):
    import numpy as np

    rows = (
        SPECS["embedding_pca_block_iteration_top3"].fn(spark, sf_small)
        .collect()
    )
    assert len(rows) == 3 * 64
    V = np.zeros((3, 64))
    lam = [0.0] * 3
    for r in rows:
        V[r.component][r.dim] = r.pc
        lam[r.component] = r.eigenvalue
    mu, C = _cov_from_parquet(sf_small)
    evals = np.linalg.eigvalsh(C)[::-1]
    G = V @ V.T
    assert np.abs(G - np.eye(3)).max() < 1e-4
    assert lam[0] >= lam[1] >= lam[2] > 0
    for j in range(3):
        assert lam[j] <= evals[0] * 1.001
        assert lam[j] >= 0.9 * evals[j]
    rayleigh = sum(float(V[j] @ C @ V[j]) for j in range(3))
    assert rayleigh >= 0.95 * evals[:3].sum()
    mus = {r.dim: r.mu for r in rows}
    # r14: mu is the exact-decimal(18,6) mean (oracle-replayable),
    # within the 5e-7 quantization bound of the float mean
    assert max(abs(mus[i] - mu[i]) for i in range(64)) < 1e-6


def test_pca_block_agrees_with_deflation_subspace(spark, sf_small):
    """The one-pass block variant and the sequential deflation variant
    must land in (numerically) the same dominant subspace: the block
    basis captures ≥99% of the variance the deflation basis captures,
    and vice versa (symmetric check — neither algorithm is the
    reference, the SUBSPACE is)."""
    import numpy as np

    _, C = _cov_from_parquet(sf_small)

    def basis(name):
        rows = SPECS[name].fn(spark, sf_small).collect()
        V = np.zeros((3, 64))
        for r in rows:
            V[r.component][r.dim] = r.pc
        return V

    Vb = basis("embedding_pca_block_iteration_top3")
    Vd = basis("embedding_pca_deflation_top3")
    cap_b = sum(float(Vb[j] @ C @ Vb[j]) for j in range(3))
    cap_d = sum(float(Vd[j] @ C @ Vd[j]) for j in range(3))
    assert cap_b >= 0.99 * cap_d
    assert cap_d >= 0.99 * cap_b


def test_pca_block_rerun_bit_identical(spark, sf_small):
    a = (
        SPECS["embedding_pca_block_iteration_top3"].fn(spark, sf_small)
        .collect()
    )
    b = (
        SPECS["embedding_pca_block_iteration_top3"].fn(spark, sf_small)
        .collect()
    )
    ka = sorted((r.component, r.dim, r.pc, r.eigenvalue) for r in a)
    kb = sorted((r.component, r.dim, r.pc, r.eigenvalue) for r in b)
    assert ka == kb


def test_stream_isotonic_recalibration_python_replay(spark, sf_small):
    """Per-chunk curves == sequential PAVA replayed per chunk (the
    batch test's algorithm, partitioned), and the shared-kernel guard:
    both the batch gate and the monitor call isotonic_minimax_fit."""
    import inspect
    from fractions import Fraction

    from kafka_stream_processing_spark.operators import quality_calibration as quality
    from kafka_stream_processing_spark.operators.quality_calibration import (
        ISO_BIN_CHARS,
        ISO_TOKEN_THRESHOLD,
    )
    from kafka_stream_processing_spark.streaming import joins

    for fn in (
        quality.quality_isotonic_calibration,
        joins.stream_isotonic_recalibration,
    ):
        assert "isotonic_minimax_fit(" in inspect.getsource(
            fn.__wrapped__ if hasattr(fn, "__wrapped__") else fn
        )
    rows = (
        SPECS["stream_isotonic_recalibration"].fn(spark, sf_small).collect()
    )
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, n_chars, len(string_split(text, ' ')) "
        f"FROM '{sf_small}/documents.parquet' "
        f"WHERE source <> 'src0' ORDER BY doc_id"
    ).fetchall()
    sz = (len(docs) + 2) // 3
    chunks = [docs[i : i + sz] for i in range(0, len(docs), sz)]
    got: dict[tuple[int, int], tuple] = {
        (r.chunk_min_doc_id, r.bin): r for r in rows
    }
    n_rows_expected = 0
    for ch in chunks:
        key = ch[0][0]
        agg: dict[int, list[int]] = {}
        for _, n_chars, n_tok in ch:
            b = n_chars // ISO_BIN_CHARS
            agg.setdefault(b, [0, 0])
            agg[b][0] += 1
            agg[b][1] += 1 if n_tok > ISO_TOKEN_THRESHOLD else 0
        order = sorted(agg)
        n_rows_expected += len(order)
        blocks: list[list] = []
        for b in order:
            w, y = agg[b]
            blocks.append([w, y, 1])
            while len(blocks) > 1 and Fraction(
                blocks[-2][1], blocks[-2][0]
            ) >= Fraction(blocks[-1][1], blocks[-1][0]):
                w2, y2, c2 = blocks.pop()
                blocks[-1][0] += w2
                blocks[-1][1] += y2
                blocks[-1][2] += c2
        fitted = []
        for w, y, c in blocks:
            fitted.extend([Fraction(y, w)] * c)
        for b, f in zip(order, fitted):
            r = got[(key, b)]
            assert r.rate_isotonic == float(f)
            assert (r.n, r.n_pos) == tuple(agg[b])
    assert len(rows) == n_rows_expected


# ---------------------------------------------------------------------------
# DSIR ESS + Kendall tau-b (round-7 sixteenth wave)
# ---------------------------------------------------------------------------


def test_dsir_ess_python_replay(spark, sf_small):
    """ESS replayed from the engine's OWN log-weights (the kernel is
    shared — the guard asserts both ops call dsir_scored_weights),
    plus Kish's bounds 1 <= ESS <= n."""
    import inspect
    import math

    from kafka_stream_processing_spark.operators import pipeline

    for fn in (
        pipeline.sample_dsir_importance,
        pipeline.sample_dsir_ess_diagnostic,
    ):
        assert "dsir_scored_weights(" in inspect.getsource(
            fn.__wrapped__ if hasattr(fn, "__wrapped__") else fn
        )
    row = (
        SPECS["sample_dsir_ess_diagnostic"].fn(spark, sf_small).collect()[0]
    )
    lws = [
        r.log_weight
        for r in SPECS["sample_dsir_importance"].fn(spark, sf_small).collect()
    ]
    m = max(lws)
    ws = [round(math.exp(lw - m), 6) for lw in lws]
    sw = sum(ws)
    sww = sum(w * w for w in ws)
    ess = sw * sw / sww
    assert row.n_docs == len(lws)
    assert abs(row.max_log_weight - m) < 1e-12
    assert row.n_negligible == sum(1 for w in ws if w == 0.0)
    assert abs(row.ess - ess) < 1e-6
    assert abs(row.ess_fraction - ess / len(lws)) < 1e-9
    assert 1.0 - 1e-9 <= row.ess <= row.n_docs + 1e-9


def test_kendall_tau_python_replay(spark, sf_small):
    """tau-b replayed by the brute-force O(n²) observation-pair scan —
    an independent algorithm from the engine's cell-dominance join."""
    import math

    row = SPECS["quality_kendall_tau_corr"].fn(spark, sf_small).collect()[0]
    con = duckdb.connect()
    pts = con.execute(
        f"SELECT n_chars, len(string_split(text, ' ')) "
        f"FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    n = len(pts)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pts[j][0] - pts[i][0]
            dy = pts[j][1] - pts[i][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    from collections import Counter

    n1 = sum(
        t * (t - 1) // 2 for t in Counter(p[0] for p in pts).values()
    )
    n2 = sum(
        t * (t - 1) // 2 for t in Counter(p[1] for p in pts).values()
    )
    n0 = n * (n - 1) // 2
    tau = (c - d) / math.sqrt(float(n0 - n1) * (n0 - n2))
    assert (row.n, row.n0_pairs) == (n, n0)
    assert (row.concordant, row.discordant) == (c, d)
    assert (row.ties_x, row.ties_y) == (n1, n2)
    assert row.tau_b == tau
    # chars and tokens are strongly monotone-associated
    assert row.tau_b > 0.4


# ---------------------------------------------------------------------------
# Cohort KM + keyness (round-7 seventeenth wave)
# ---------------------------------------------------------------------------


def test_km_by_cohort_python_replay(spark, sf_small):
    """Per-cohort curves == python KM per cohort slice; kernel guard:
    both survival ops call the shared km_curve."""
    import datetime as dt
    import inspect
    import math

    from kafka_stream_processing_spark.operators import windowed

    for fn in (
        windowed.window_kaplan_meier_retention,
        windowed.window_km_retention_by_cohort,
    ):
        assert "km_curve(" in inspect.getsource(
            fn.__wrapped__ if hasattr(fn, "__wrapped__") else fn
        )
    rows = (
        SPECS["window_km_retention_by_cohort"].fn(spark, sf_small).collect()
    )
    con = duckdb.connect()
    lives = con.execute(f"""
        SELECT min(d) AS d0, max(d) AS d1 FROM
        (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
         FROM '{sf_small}/events.parquet')
        GROUP BY user_id
    """).fetchall()
    h = max(d1 for _, d1 in lives)
    cohorts: dict[str, list] = {}
    for d0, d1 in lives:
        monday = d0 - dt.timedelta(days=d0.weekday())
        cohorts.setdefault(str(monday), []).append(
            ((d1 - d0).days, d1 == h)
        )
    expect = {}
    for ck, ls in cohorts.items():
        steps: dict[int, list[int]] = {}
        for t, cens in ls:
            steps.setdefault(t, [0, 0])
            steps[t][1 if cens else 0] += 1
        at_risk = len(ls)
        logs = 0.0
        for t in sorted(steps):
            d, c = steps[t]
            if d > 0 and d < at_risk:
                f = (at_risk - d) / at_risk
                logs += round(math.log(f), 6)
                expect[(ck, t)] = (at_risk, d, c, f, logs)
            at_risk -= d + c
    assert len(rows) == len(expect)
    for r in rows:
        nr, d, c, f, lg = expect[(r.cohort, r.t_days)]
        assert (r.n_at_risk, r.d_events, r.c_censored) == (nr, d, c)
        assert r.factor == f
        assert abs(r.log_survival - lg) < 1e-9


def test_keyness_python_replay(spark, sf_small):
    import math

    from kafka_stream_processing_spark.operators.text import (
        KEYNESS_MIN_COUNT,
        KEYNESS_TOPK,
    )

    rows = (
        SPECS["text_keyness_loglikelihood"].fn(spark, sf_small).collect()
    )
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    a: dict[str, int] = {}
    b: dict[str, int] = {}
    for source, text in docs:
        tgt = a if source == "src0" else b
        for w in text.split(" "):
            tgt[w] = tgt.get(w, 0) + 1
    ta, tb = sum(a.values()), sum(b.values())
    scored = []
    for w in set(a) | set(b):
        ca, cb = a.get(w, 0), b.get(w, 0)
        if ca + cb < KEYNESS_MIN_COUNT:
            continue
        g2 = 0.0
        if ca > 0:
            g2 += ca * math.log(ca / ((ca + cb) * ta / (ta + tb)))
        if cb > 0:
            g2 += cb * math.log(cb / ((ca + cb) * tb / (ta + tb)))
        g2 = round(2.0 * g2, 6)
        direction = "target" if ca * tb > cb * ta else "rest"
        scored.append((-g2, w, ca, cb, direction))
    scored.sort()
    top = scored[:KEYNESS_TOPK]
    assert len(rows) == min(KEYNESS_TOPK, len(scored))
    for r, (negg, w, ca, cb, direction) in zip(rows, top):
        assert r.word == w
        assert (r.n_target, r.n_rest) == (ca, cb)
        assert abs(r.g2 - (-negg)) < 1e-9
        assert r.key_direction == direction
        # G² is a deviance — non-negative by construction
        assert r.g2 >= -1e-9


def test_multimodal_payload_dedup_python_replay(spark, sf_small):
    import hashlib

    rows = SPECS["multimodal_payload_dedup"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    sizes: dict[str, int] = {}
    for doc_id, text in docs:
        b = text.encode("utf-8")
        dg = hashlib.md5(b).hexdigest()
        groups.setdefault(dg, []).append(doc_id)
        sizes[dg] = len(b)
    got = {r.digest: r for r in rows}
    assert set(got) == set(groups)
    for dg, ids in groups.items():
        r = got[dg]
        assert r.n_copies == len(ids)
        assert r.keeper_doc_id == min(ids)
        assert r.payload_bytes == sizes[dg]
        assert r.is_duplicated == (len(ids) > 1)
    # keepers partition the corpus: every doc is in exactly one group
    assert sum(r.n_copies for r in rows) == len(docs)


def test_multimodal_resize_python_replay(spark, sf_small):
    from kafka_stream_processing_spark.operators.multimodal import (
        RESIZE_TARGET,
        resize_media_stub,
    )

    rows = SPECS["multimodal_resize"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    got = {r.doc_id: r for r in rows}
    assert len(rows) == len(docs)  # 1→1 row contract
    for doc_id, text in docs:
        exp = resize_media_stub(text.encode("utf-8"))
        r = got[doc_id]
        assert (r.in_width, r.in_height) == (
            exp["in_width"],
            exp["in_height"],
        )
        assert (r.out_width, r.out_height) == (
            exp["out_width"],
            exp["out_height"],
        )
        assert r.resized_bytes == exp["resized_bytes"]
        # aspect-fit invariants: never exceeds the target square, and
        # any non-degenerate input's LONGER side lands exactly on it
        # (the shorter side rounds down)
        assert max(r.out_width, r.out_height) <= RESIZE_TARGET
        if max(r.in_width, r.in_height) > 0:
            assert max(r.out_width, r.out_height) == RESIZE_TARGET


def test_holt_linear_python_replay(spark, sf_small):
    """Textbook Holt recursion replayed with the engine's half-away
    round-6; forecast identity f_t = l_{t-1} + b_{t-1} pinned from the
    engine's own output."""
    import math

    def r6(v):
        return math.copysign(math.floor(abs(v) * 1e6 + 0.5) / 1e6, v)

    rows = sorted(
        SPECS["window_holt_linear_smoothing"].fn(spark, sf_small).collect(),
        key=lambda r: (r.event_type, r.idx),
    )
    acc = _daily(sf_small, by_type=True)
    series: dict[str, list[float]] = {}
    for (et, day), x in sorted(acc.items()):
        series.setdefault(et, []).append(float(x))
    got: dict[tuple[str, int], tuple] = {
        (r.event_type, r.idx): r for r in rows
    }
    n_expected = 0
    for et, xs in series.items():
        if len(xs) < 2:
            continue
        l, b = xs[0], xs[1] - xs[0]
        n_expected += len(xs)
        r = got[(et, 1)]
        assert (r.level, r.trend) == (l, b)
        assert r.forecast is None and r.residual is None
        for t in range(2, len(xs) + 1):
            x = xs[t - 1]
            f = l + b
            l_new = r6(0.5 * x + 0.5 * (l + b))
            b_new = r6(0.5 * (l_new - l) + 0.5 * b)
            r = got[(et, t)]
            assert r.revenue == x
            assert r.level == l_new
            assert r.trend == b_new
            assert r.forecast == f
            assert r.residual == x - f
            l, b = l_new, b_new
    assert len(rows) == n_expected


def test_classical_decomposition_python_replay(spark, sf_small):
    """Components and both strengths replayed; additivity identity
    x = trend + seasonal + remainder pinned from the engine output."""
    from kafka_stream_processing_spark.operators.windowed import (
        DECOMP_PERIOD,
    )

    rows = sorted(
        SPECS["window_classical_decomposition"].fn(spark, sf_small).collect(),
        key=lambda r: r.day,
    )
    acc = _daily(sf_small, by_type=False)
    days = sorted(acc)
    xs = [float(acc[d]) for d in days]
    half = DECOMP_PERIOD // 2
    trend = {}
    for i in range(half, len(days) - half):
        win = xs[i - half : i + half + 1]
        trend[days[i]] = (
            float(sum(acc[days[j]] for j in range(i - half, i + half + 1)))
            / DECOMP_PERIOD
        )
    det = {d: xs[days.index(d)] - t for d, t in trend.items()}
    by_dow: dict[int, list[float]] = {}
    for d, v in det.items():
        by_dow.setdefault(d.weekday(), []).append(v)
    seas = {
        k: sum(round(v, 6) for v in vs) / len(vs)
        for k, vs in by_dow.items()
    }
    rem = {d: det[d] - seas[d.weekday()] for d in det}
    n = len(rem)
    vr = sum(round(v * v, 6) for v in rem.values()) / n
    vsr = (
        sum(
            round((seas[d.weekday()] + rem[d]) ** 2, 6) for d in rem
        )
        / n
    )
    vtr = sum(round((trend[d] + rem[d]) ** 2, 6) for d in rem) / n
    fs = max(0.0, 1.0 - vr / vsr)
    ft = max(0.0, 1.0 - vr / vtr)
    assert len(rows) == n
    for r in rows:
        import datetime as dt

        d = dt.date.fromisoformat(r.day)
        assert abs(r.trend - trend[d]) < 1e-9
        assert abs(r.seasonal - seas[d.weekday()]) < 1e-9
        assert abs(r.remainder - rem[d]) < 1e-9
        assert abs(r.seasonal_strength - fs) < 1e-9
        assert abs(r.trend_strength - ft) < 1e-9
        # additivity of the engine's own columns
        assert abs(
            r.revenue - (r.trend + r.seasonal + r.remainder)
        ) < 1e-9
        assert 0.0 <= r.seasonal_strength <= 1.0
        assert 0.0 <= r.trend_strength <= 1.0
