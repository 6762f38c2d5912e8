"""Round-7 ninth wave: Anderson-Darling (tail-weighted EDF), bounded
distribution metrics (Hellinger/TV), the blocked Friedman rank test,
and character-based readability indices.

Each test replays the statistic in plain Python with the TEXTBOOK
per-row definition (sorting raw values / regex over raw text), i.e. a
deliberately different algorithm from the engine's histogram / codegen
kernels; the DuckDB differential is covered by the oracle-parity sweep
separately.
"""

from __future__ import annotations

import math
import re
from collections import Counter

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


def _ad2_position_sum(a: list[int], b: list[int]) -> float:
    """Two-sample AD via Pettitt's POSITION sum over the pooled sorted
    sample, with all tied positions evaluated at the right end of
    their tie run (the right-continuous ECDF convention the engine's
    distinct-value form states) — a per-row walk, no histograms."""
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    n_a, n = len(a), len(a) + len(b)
    total = 0.0
    i = 0
    ma = 0  # A's among pooled[:i]
    while i < n:
        j = i
        while j + 1 < n and pooled[j + 1][0] == pooled[i][0]:
            j += 1
        run = pooled[i : j + 1]
        ma += sum(1 for _, tag in run if tag == 0)
        cc = j + 1
        if cc < n:
            total += (
                (j - i + 1)  # l_j = tie-run length
                * (ma * n - cc * n_a) ** 2
                / (cc * (n - cc))
            )
        i = j + 1
    return total / (n_a * len(b))


def test_anderson_darling_positionwise_replay(spark, sf_small):
    by_src = _lengths_by_source(sf_small)
    ref = by_src["src0"]
    rows = SPECS["quality_anderson_darling_drift"].fn(
        spark, sf_small
    ).collect()
    got = {r.source: r for r in rows}
    assert set(got) == set(by_src) - {"src0"}
    for s, vs in by_src.items():
        if s == "src0":
            continue
        a2 = _ad2_position_sum(ref, vs)
        r = got[s]
        assert (r.n_ref, r.n_src) == (len(ref), len(vs))
        assert abs(r.a2 - a2) < 1e-4
        assert r.drift == (r.a2 > 2.492)


def test_ad_dominates_cvm_weighting(spark, sf_small):
    """AD's 1/(H(1-H)) weight >= 4 pointwise, and the CvM integrand is
    the same squared gap — so on the identical data A2 must exceed
    4x the per-pair CvM-style uniform-weight sum.  A cheap cross-op
    sanity invariant tying the two EDF gates together."""
    by_src = _lengths_by_source(sf_small)
    ref = by_src["src0"]
    rows = SPECS["quality_anderson_darling_drift"].fn(
        spark, sf_small
    ).collect()
    for r in rows:
        vs = by_src[r.source]
        n_a, n_b = len(ref), len(vs)
        n = n_a + n_b
        pooled = sorted([(v, 0) for v in ref] + [(v, 1) for v in vs])
        uniform = 0.0
        ma = 0
        i = 0
        while i < n:
            j = i
            while j + 1 < n and pooled[j + 1][0] == pooled[i][0]:
                j += 1
            ma += sum(1 for _, t in pooled[i : j + 1] if t == 0)
            cc = j + 1
            if cc < n:
                uniform += (
                    (j - i + 1) * (ma * n - cc * n_a) ** 2 / (n * n)
                )
            i = j + 1
        uniform /= n_a * n_b
        assert r.a2 >= 4.0 * uniform - 1e-9


def test_hellinger_tv_python_replay(spark, sf_small):
    by_src = _lengths_by_source(sf_small)
    ref_hist = Counter(by_src["src0"])
    n_ref = len(by_src["src0"])
    rows = SPECS["quality_hellinger_tv_drift"].fn(
        spark, sf_small
    ).collect()
    got = {r.source: r for r in rows}
    for s, vs in by_src.items():
        if s == "src0":
            continue
        hist = Counter(vs)
        support = set(ref_hist) | set(hist)
        bc = sum(
            math.sqrt(
                (ref_hist.get(v, 0) / n_ref) * (hist.get(v, 0) / len(vs))
            )
            for v in support
        )
        tv = 0.5 * sum(
            abs(ref_hist.get(v, 0) / n_ref - hist.get(v, 0) / len(vs))
            for v in support
        )
        r = got[s]
        assert abs(r.bhattacharyya - bc) < 1e-4
        assert abs(r.hellinger - math.sqrt(max(0.0, 1 - bc))) < 1e-4
        assert abs(r.tv_distance - tv) < 1e-4
        # metric sandwich: H^2 <= TV <= H*sqrt(2) (standard inequality)
        assert r.hellinger**2 <= r.tv_distance + 1e-9
        assert r.tv_distance <= r.hellinger * math.sqrt(2) + 1e-9


def test_friedman_textbook_replay(spark, sf_small):
    """Q from float midranks over the zero-filled day x type grid,
    textbook tie-corrected form Q = (k-1) * sum(Rj - b(k+1)/2)^2 /
    (sum r^2 - b k (k+1)^2 / 4)."""
    rows = duckdb.connect().execute(
        f"""SELECT CAST(ts AS DATE) AS d, event_type, count(*)
        FROM '{sf_small}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    days = sorted({r[0] for r in rows})
    types = sorted({r[1] for r in rows})
    c = {(r[0], r[1]): r[2] for r in rows}
    b, k = len(days), len(types)
    rank_sums = {t: 0.0 for t in types}
    sq = 0.0
    for d in days:
        vals = [(c.get((d, t), 0), t) for t in types]
        ordered = sorted(vals)
        ranks = {}
        i = 0
        while i < k:
            j = i
            while j + 1 < k and ordered[j + 1][0] == ordered[i][0]:
                j += 1
            mid = (i + 1 + j + 1) / 2.0
            for m in range(i, j + 1):
                ranks[ordered[m][1]] = mid
            i = j + 1
        for t in types:
            rank_sums[t] += ranks[t]
            sq += ranks[t] ** 2
    num = sum((rank_sums[t] - b * (k + 1) / 2.0) ** 2 for t in types)
    den = sq - b * k * (k + 1) ** 2 / 4.0
    q_ref = (k - 1) * num / den
    row = SPECS["quality_friedman_daily_mix"].fn(
        spark, sf_small
    ).collect()[0]
    assert (row.n_blocks, row.k, row.dof) == (b, k, k - 1)
    assert abs(row.q_stat - q_ref) < 1e-6
    assert row.drift == (row.q_stat > row.critical_005)


def test_readability_python_regex_replay(spark, sf_small):
    docs = duckdb.connect().execute(
        f"SELECT source, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    agg: dict[str, list[int]] = {}
    for s, text in docs:
        a = agg.setdefault(s, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += len(re.findall(r"[A-Za-z0-9]+", text))
        a[2] += len(re.findall(r"[.!?]+", text))
        a[3] += len(re.findall(r"[A-Za-z0-9]", text))
        a[4] += len(re.findall(r"[A-Za-z]", text))
    rows = SPECS["text_readability_ari_cli"].fn(
        spark, sf_small
    ).collect()
    assert {r.source for r in rows} == set(agg)
    for r in rows:
        n_docs, words, sents, alnum, letters = agg[r.source]
        assert (r.n_docs, r.n_words, r.n_sentences) == (
            n_docs,
            words,
            sents,
        )
        assert (r.n_alnum, r.n_letters) == (alnum, letters)
        if words and sents:
            ari = 4.71 * (alnum / words) + 0.5 * (words / sents) - 21.43
            assert abs(r.ari - ari) < 1e-9
        if words:
            cli = (
                0.0588 * (100.0 * letters / words)
                - 0.296 * (100.0 * sents / words)
                - 15.8
            )
            assert abs(r.cli - cli) < 1e-9


# ---------------------------------------------------------------------------
# Embedding-geometry + graph wave: TwoNN, hubness, local clustering
# ---------------------------------------------------------------------------


def _embeddings(sf_dir: str):
    import numpy as np

    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def test_twonn_numpy_replay(spark, sf_small):
    import numpy as np

    ids, mat = _embeddings(sf_small)
    n = len(ids)
    d2 = ((mat[:, None, :] - mat[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    s = 0.0
    excluded = 0
    for i in range(n):
        order = np.argsort(d2[i], kind="stable")
        d1sq, d2sq = d2[i][order[0]], d2[i][order[1]]
        if d1sq == 0:
            excluded += 1
        else:
            s += 0.5 * math.log(d2sq / d1sq)
    dim = (n - excluded) / s
    row = SPECS["embedding_intrinsic_dimension_twonn"].fn(
        spark, sf_small
    ).collect()[0]
    assert row.n_points == n
    assert row.n_excluded == excluded
    assert abs(row.sum_log_mu - s) < 1e-4
    assert abs(row.twonn_dim - dim) < 1e-3
    # sanity: the estimate sits inside the ambient dimension
    assert 0 < row.twonn_dim < 64


def test_hubness_numpy_replay_and_mass_invariant(spark, sf_small):
    import numpy as np
    from collections import Counter

    ids, mat = _embeddings(sf_small)
    n = len(ids)
    d2 = ((mat[:, None, :] - mat[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    occ: Counter = Counter()
    k = 5
    for i in range(n):
        # tiebreak (d2, vec_id) like the engine: argsort on (d2, id)
        order = sorted(range(n), key=lambda j: (d2[i][j], ids[j]))
        for j in order[:k]:
            occ[ids[j]] += 1
    hist = Counter(occ.get(v, 0) for v in ids)
    rows = SPECS["embedding_hubness_audit"].fn(spark, sf_small).collect()
    got = {r.k_occurrence: r.n_points for r in rows}
    assert got == dict(hist)
    # mass invariant: every anchor contributes exactly k list slots
    assert sum(kk * c for kk, c in got.items()) == k * n


def _sparsified_adj(sf_dir: str) -> set[tuple[str, str]]:
    """Significance-sparsified undirected trade adjacency, rebuilt from
    the raw tables in duckdb + python (the engine's cut replayed on a
    different engine)."""
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'"
        )
    edges = con.execute(
        """SELECT n1.n_name, n2.n_name, count(*) FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        WHERE n1.n_name <> n2.n_name GROUP BY 1, 2"""
    ).fetchall()
    ne = len(edges)
    tw = sum(w for _, _, w in edges)
    return {
        (min(s, d), max(s, d))
        for s, d, w in edges
        if w * ne >= 2 * tw
    }


def test_local_clustering_python_replay(spark, sf_small):
    adj = _sparsified_adj(sf_small)
    nbrs: dict[str, set[str]] = {}
    for a, b in adj:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    rows = SPECS["graph_local_clustering_coefficient"].fn(
        spark, sf_small
    ).collect()
    got = {r.node: r for r in rows}
    assert set(got) == set(nbrs)
    for v, ns in nbrs.items():
        tri = sum(
            1
            for x in ns
            for y in ns
            if x < y and (min(x, y), max(x, y)) in adj
        )
        r = got[v]
        assert r.degree == len(ns)
        assert r.n_triangles == tri
        if len(ns) >= 2:
            assert abs(
                r.local_cc - 2 * tri / (len(ns) * (len(ns) - 1))
            ) < 1e-12
        else:
            assert r.local_cc is None


def test_local_cc_triangle_mass_matches_global_count(spark, sf_small):
    """Cross-op invariant: sum_v T(v) counts each triangle three times.
    The global count runs on the RAW graph, so compare against a raw
    recount restricted to the sparsified adjacency via python."""
    adj = _sparsified_adj(sf_small)
    nodes = sorted({x for e in adj for x in e})
    tri_total = sum(
        1
        for i, a in enumerate(nodes)
        for b in nodes[i + 1 :]
        for c in nodes
        if b < c
        and (a, b) in adj
        and (min(a, c), max(a, c)) in adj
        and (min(b, c), max(b, c)) in adj
    )
    rows = SPECS["graph_local_clustering_coefficient"].fn(
        spark, sf_small
    ).collect()
    assert sum(r.n_triangles for r in rows) == 3 * tri_total


def test_twonn_ivf_shortlist_close_to_exact(spark, sf_small):
    """The shortlisted estimator must (a) report its evidence base
    honestly (n_short + n_excluded + used = n_points), and (b) land
    near the exact all-pairs estimate — with nprobe=2 of 8 cells the
    true NN is in a probed cell for almost every point, so the
    estimate should agree within a loose 15% band (it is an
    approximation, not a reimplementation)."""
    exact = SPECS["embedding_intrinsic_dimension_twonn"].fn(
        spark, sf_small
    ).collect()[0]
    short = SPECS["embedding_twonn_ivf_shortlist"].fn(
        spark, sf_small
    ).collect()[0]
    assert short.n_points == exact.n_points
    used = short.n_points - short.n_short - short.n_excluded
    assert used > 0.9 * short.n_points
    assert abs(short.twonn_dim - exact.twonn_dim) < 0.15 * exact.twonn_dim
    # shortlisted distances can only be >= true NN distances, so the
    # per-point ratios shrink or grow but the estimator stays positive
    assert short.twonn_dim > 0


def test_welch_anova_textbook_replay(spark, sf_small):
    """W from textbook float arithmetic (statistics.variance per
    group) vs the engine's integer-moment/round-12 form."""
    import statistics

    by_src = _lengths_by_source(sf_small)
    groups = {s: v for s, v in by_src.items() if len(v) >= 2}
    k = len(groups)
    w = {s: len(v) / statistics.variance(v) for s, v in groups.items()}
    xbar = {s: sum(v) / len(v) for s, v in groups.items()}
    wtot = sum(w.values())
    xt = sum(w[s] * xbar[s] for s in groups) / wtot
    num = sum(w[s] * (xbar[s] - xt) ** 2 for s in groups) / (k - 1)
    lam = sum(
        (1 - w[s] / wtot) ** 2 / (len(groups[s]) - 1) for s in groups
    )
    w_ref = num / (1 + (2 * (k - 2) / (k * k - 1)) * lam)
    row = SPECS["quality_welch_anova_drift"].fn(
        spark, sf_small
    ).collect()[0]
    assert row.k == k
    assert row.n_total == sum(len(v) for v in groups.values())
    assert abs(row.w_stat - w_ref) / w_ref < 1e-6
    assert abs(row.chi2_approx - (k - 1) * w_ref) / w_ref < 1e-5
    assert row.drift == (row.chi2_approx > row.critical_005)
