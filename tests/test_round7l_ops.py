"""Round-7 twelfth wave: BH FDR over the per-source Mann-Whitney drift
tests, plus the pinned-literal reproduction check for the BH z table.
"""

from __future__ import annotations

import math

from kafka_stream_processing_spark.operators.quality_kernel import Z_CRIT_005
from kafka_stream_processing_spark.operators.quality_rank import BH_Z_CRIT_M19
from kafka_stream_processing_spark.registry import all_specs
from kafka_stream_processing_spark.tools.gen_bh_z_table import (
    bh_z_table,
)

SPECS = all_specs()


def test_bh_z_table_reproduces_and_roundtrips():
    """The pinned literals must be bit-identical to the generator's
    output, every entry must erfc-round-trip to its alpha_i within
    2e-16, the table must be monotone decreasing, and entry m must be
    the plain two-sided Z_CRIT literal (alpha_m = alpha)."""
    regen = bh_z_table()
    assert regen == BH_Z_CRIT_M19
    m = 19
    for i, z in BH_Z_CRIT_M19.items():
        alpha_i = 0.05 * i / m
        assert abs(math.erfc(z / math.sqrt(2)) - alpha_i) < 2e-16
    vals = [BH_Z_CRIT_M19[i] for i in range(1, m + 1)]
    assert vals == sorted(vals, reverse=True)
    # entry m IS the plain two-sided critical point (alpha_m = alpha);
    # the legacy Z_CRIT_005 literal is the commonly quoted value one
    # ulp away from the erfc-exact root, so compare to 1 ulp
    assert abs(BH_Z_CRIT_M19[m] - Z_CRIT_005) < 5e-16


def test_mw_fdr_step_up_replay(spark, sf_small):
    """Replay the BH step-up in python over the registered MW op's
    z-scores (the declared shared kernel), and check the containment
    law: FDR rejections are a subset of raw rejections ONLY when the
    step-up cut falls below the raw threshold rank — in general BH at
    the same alpha rejects a superset of Bonferroni and a subset-or-
    equal of raw per-test verdicts is NOT guaranteed, so assert the
    exact step-up definition instead."""
    mw = {
        r.source: r.z
        for r in SPECS["quality_mannwhitney_drift"].fn(
            spark, sf_small
        ).collect()
    }
    ordered = sorted(mw.items(), key=lambda kv: (-abs(kv[1]), kv[0]))
    m = len(ordered)
    assert m == 19
    flags = [
        abs(z) >= BH_Z_CRIT_M19[i + 1]
        for i, (_, z) in enumerate(ordered)
    ]
    i_star = max(
        (i + 1 for i, f in enumerate(flags) if f), default=None
    )
    expected = {
        s: (i_star is not None and i + 1 <= i_star)
        for i, (s, _) in enumerate(ordered)
    }
    rows = SPECS["quality_mw_drift_fdr"].fn(spark, sf_small).collect()
    got = {r.source: r for r in rows}
    assert set(got) == set(mw)
    for i, (s, z) in enumerate(ordered):
        r = got[s]
        assert abs(r.z - z) < 1e-12
        assert r.rank == i + 1
        assert abs(r.z_crit - BH_Z_CRIT_M19[i + 1]) < 1e-15
        assert r.raw_reject == (abs(z) > Z_CRIT_005)
        assert r.fdr_reject == expected[s]
    # step-up sanity: rejections form a prefix of the rank order
    rejected_ranks = sorted(
        r.rank for r in rows if r.fdr_reject
    )
    assert rejected_ranks == list(range(1, len(rejected_ranks) + 1))


def test_shewhart_imr_python_replay(spark, sf_small):
    import duckdb
    from collections import defaultdict

    rows = duckdb.connect().execute(
        f"""SELECT event_type,
        CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR),
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        FROM '{sf_small}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series = defaultdict(list)
    for t, d, x in rows:
        series[t].append((d, x))
    got = {
        (r.event_type, r.day): r
        for r in SPECS["window_shewhart_imr_chart"]
        .fn(spark, sf_small)
        .collect()
    }
    k = 3.0 / 1.128
    n_ooc = 0
    for t, pts in series.items():
        xs = [x for _, x in pts]
        mrs = [abs(b - a) for a, b in zip(xs, xs[1:])]
        center = sum(xs) / len(xs)
        mrbar = sum(mrs) / len(mrs)
        ucl, lcl = center + k * mrbar, center - k * mrbar
        for i, (d, x) in enumerate(pts):
            r = got[(t, d)]
            assert abs(r.x - x) < 1e-9
            if i == 0:
                assert r.moving_range is None
            else:
                assert abs(r.moving_range - mrs[i - 1]) < 1e-9
            assert abs(r.center - center) < 1e-4
            assert abs(r.ucl - ucl) < 1e-4
            assert abs(r.lcl - lcl) < 1e-4
            assert r.out_of_control == (x > r.ucl or x < r.lcl)
            n_ooc += r.out_of_control
    # the chart must be calibrated enough that alarms are the
    # exception, not the rule (~99.7% coverage under normality)
    assert n_ooc < 0.1 * len(got)


def test_closeness_python_bfs_replay(spark, sf_small):
    """All-sources BFS replayed with a python deque walk over the
    sparsified adjacency (reuses the test-local rebuild from
    test_round7i_ops), plus the component consistency law: nodes in
    one component share n_reached."""
    from collections import deque

    from tests.test_round7i_ops import _sparsified_adj

    adj = _sparsified_adj(sf_small)
    nbrs = {}
    for a, b in adj:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    rows = SPECS["graph_closeness_centrality"].fn(
        spark, sf_small
    ).collect()
    got = {r.node: r for r in rows}
    assert set(got) == set(nbrs)
    for s in nbrs:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for v in nbrs[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        r = got[s]
        assert r.n_reached == len(dist) - 1
        assert r.total_hops == sum(dist.values())
        if r.total_hops:
            assert abs(
                r.closeness - r.n_reached / r.total_hops
            ) < 1e-12


def test_eccentricity_diameter_replay_and_kernel_reuse(spark, sf_small):
    """Eccentricity/diameter/radius from the python BFS walk, plus the
    reuse guard: the op must call the shared _all_pairs_hops kernel
    (same function object closeness uses)."""
    import inspect
    from collections import deque

    from kafka_stream_processing_spark.operators import graph as g
    from tests.test_round7i_ops import _sparsified_adj

    assert "_all_pairs_hops" in inspect.getsource(
        g.graph_eccentricity_diameter.__wrapped__
    )
    assert "_all_pairs_hops" in inspect.getsource(
        g.graph_closeness_centrality.__wrapped__
    )
    adj = _sparsified_adj(sf_small)
    nbrs = {}
    for a, b in adj:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    eccs = {}
    for s in nbrs:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for v in nbrs[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        eccs[s] = max(dist.values())
    diameter, radius = max(eccs.values()), min(eccs.values())
    rows = SPECS["graph_eccentricity_diameter"].fn(
        spark, sf_small
    ).collect()
    got = {r.node: r for r in rows}
    assert set(got) == set(eccs)
    for s, e in eccs.items():
        r = got[s]
        assert r.eccentricity == e
        assert r.diameter == diameter
        assert r.radius == radius
        assert r.is_center == (e == radius)
    # radius <= diameter <= 2*radius holds within ONE connected
    # component (a small satellite component can hold the global
    # radius while the main component holds the diameter, so the law
    # is only asserted when the graph is connected)
    comp = set()
    start = next(iter(nbrs))
    q = deque([start])
    comp.add(start)
    while q:
        u = q.popleft()
        for v in nbrs[u]:
            if v not in comp:
                comp.add(v)
                q.append(v)
    if comp == set(nbrs):
        assert radius <= diameter <= 2 * radius


def test_tukey_fences_numpy_replay(spark, sf_small):
    import duckdb
    import numpy as np
    from collections import defaultdict

    rows = duckdb.connect().execute(
        f"SELECT event_type, value FROM '{sf_small}/events.parquet'"
    ).fetchall()
    by_type = defaultdict(list)
    for t, v in rows:
        by_type[t].append(v)
    got = {
        r.event_type: r
        for r in SPECS["quality_tukey_fences_outliers"]
        .fn(spark, sf_small)
        .collect()
    }
    assert set(got) == set(by_type)
    for t, vs in by_type.items():
        q1 = round(float(np.percentile(vs, 25, method="linear")), 6)
        q3 = round(float(np.percentile(vs, 75, method="linear")), 6)
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        n_out = sum(1 for v in vs if v < lo or v > hi)
        r = got[t]
        assert r.n == len(vs)
        assert abs(r.q1 - q1) < 1e-9 and abs(r.q3 - q3) < 1e-9
        assert abs(r.lo - lo) < 1e-9 and abs(r.hi - hi) < 1e-9
        assert r.n_outliers == n_out
        assert abs(r.outlier_rate - n_out / len(vs)) < 1e-12


def test_wasserstein_scipy_free_replay(spark, sf_small):
    """W1 from the sorted-sample definition (mean |quantile gap| via
    the dual transport formulation on raw values) — a genuinely
    different algorithm from the engine's ECDF-gap integral, plus the
    lower bound |mean_a - mean_b| <= W1."""
    from collections import defaultdict
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT source, n_chars FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    by_src = defaultdict(list)
    for s, v in rows:
        by_src[s].append(v)
    ref = sorted(by_src["src0"])

    def w1(a, b):
        # integral of |F_a - F_b| via the merged-breakpoint sweep on
        # raw sorted samples
        import itertools

        pts = sorted(set(a) | set(b))
        tot = 0.0
        ia = ib = 0
        for v, v_next in itertools.pairwise(pts):
            while ia < len(a) and a[ia] <= v:
                ia += 1
            while ib < len(b) and b[ib] <= v:
                ib += 1
            tot += abs(ia / len(a) - ib / len(b)) * (v_next - v)
        return tot

    got = {
        r.source: r
        for r in SPECS["quality_wasserstein_drift"]
        .fn(spark, sf_small)
        .collect()
    }
    for s, vs in by_src.items():
        if s == "src0":
            continue
        expected = w1(ref, sorted(vs))
        r = got[s]
        assert (r.n_ref, r.n_src) == (len(ref), len(vs))
        assert abs(r.wasserstein_1 - expected) < 1e-3
        mean_gap = abs(
            sum(ref) / len(ref) - sum(vs) / len(vs)
        )
        assert r.wasserstein_1 >= mean_gap - 1e-9


def test_stream_wasserstein_chunk_replay(spark, sf_small):
    """Per-chunk W1 vs the src0 reference, replayed with the
    sorted-sample breakpoint sweep over raw values."""
    import itertools
    from collections import defaultdict
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        f"""SELECT doc_id, source, n_chars
        FROM '{sf_small}/documents.parquet' ORDER BY doc_id"""
    ).fetchall()
    ref = sorted(v for _, s, v in docs if s == "src0")
    train = [(d, v) for d, s, v in docs if s != "src0"]
    step = (len(train) + 2) // 3

    def w1(a, b):
        pts = sorted(set(a) | set(b))
        tot = 0.0
        ia = ib = 0
        for v, v_next in itertools.pairwise(pts):
            while ia < len(a) and a[ia] <= v:
                ia += 1
            while ib < len(b) and b[ib] <= v:
                ib += 1
            tot += abs(ia / len(a) - ib / len(b)) * (v_next - v)
        return tot

    rows = sorted(
        SPECS["stream_wasserstein_monitor"].fn(
            spark, sf_small
        ).collect(),
        key=lambda r: r.chunk_min_doc_id,
    )
    assert len(rows) == 3
    for ci, r in enumerate(rows):
        chunk = train[ci * step : (ci + 1) * step]
        vals = sorted(v for _, v in chunk)
        assert r.chunk_min_doc_id == chunk[0][0]
        assert r.n_batch == len(vals)
        assert abs(r.wasserstein_1 - w1(ref, vals)) < 1e-3


def test_energy_distance_bruteforce_replay(spark, sf_small):
    """E-distance components from the O(n^2) raw pair definition vs
    the engine's O(distinct-values) straddle-count closed form, plus
    the metric laws: E >= 0 and E >= 2*W1... no — the correct cheap
    law is E = 0 iff identical; assert non-negativity and the
    Cramér-energy identity E = 2*integral (F_a-F_b)^2 ... (that
    needs dv weighting) — keep non-negativity + component replay."""
    from collections import defaultdict
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT source, n_chars FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    by_src = defaultdict(list)
    for s, v in rows:
        by_src[s].append(v)
    ref = by_src["src0"]

    def mean_abs(a, b):
        return sum(abs(x - y) for x in a for y in b) / (
            len(a) * len(b)
        )

    got = {
        r.source: r
        for r in SPECS["quality_energy_distance_drift"]
        .fn(spark, sf_small)
        .collect()
    }
    exx = mean_abs(ref, ref)
    for s, vs in by_src.items():
        if s == "src0":
            continue
        r = got[s]
        assert (r.n_ref, r.n_src) == (len(ref), len(vs))
        assert abs(r.e_cross - mean_abs(ref, vs)) < 1e-3
        assert abs(r.e_within_ref - exx) < 1e-3
        assert abs(r.e_within_src - mean_abs(vs, vs)) < 1e-3
        assert abs(
            r.energy_distance
            - (2 * r.e_cross - r.e_within_ref - r.e_within_src)
        ) < 1e-9
        assert r.energy_distance >= -1e-6  # metric non-negativity
