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

from kafka_stream_processing_spark.operators.quality import (
    PSI_BUCKET_CHARS,
    PSI_DRIFT_THRESHOLD,
    PSI_SMOOTH,
    Z_CRIT_005,
)
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

    from kafka_stream_processing_spark.operators.quality import (
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
    from kafka_stream_processing_spark.operators.quality import (
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
