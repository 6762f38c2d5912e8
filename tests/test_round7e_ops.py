"""Round-7 fifth wave: k-core decomposition, streaming Good-Turing
novelty, PCA deflation."""

from __future__ import annotations

import duckdb

from kafka_stream_processing_spark.registry import all_specs

SPECS = all_specs()


def _sparsified_nbrs(sf_small):
    """Median-weight sparsified trade graph, rebuilt independently."""
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'"
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
    ws = sorted((w for _, _, w in edges), reverse=True)
    thresh = ws[(len(ws) + 1) // 2 - 1]
    adj = {
        (min(s, d), max(s, d)) for s, d, w in edges if w >= thresh
    }
    nbrs: dict[str, set] = {}
    for a, b in adj:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    return nbrs


def test_kcore_matches_sequential_peel(spark, sf_small):
    """The h-index fixed point must equal TRUE coreness (sequential
    min-degree peel, the textbook definition) — i.e. KCORE_ROUNDS
    rounds reached the fixed point at test scale."""
    rows = SPECS["graph_kcore_decomposition"].fn(spark, sf_small).collect()
    nbrs = _sparsified_nbrs(sf_small)
    # sequential peel: repeatedly remove a minimum-degree node
    rem = set(nbrs)
    k = 0
    true_core: dict[str, int] = {}
    while rem:
        u = min(rem, key=lambda x: (sum(1 for v in nbrs[x] if v in rem), x))
        d = sum(1 for v in nbrs[u] if v in rem)
        k = max(k, d)
        true_core[u] = k
        rem.discard(u)
    got = {r.node: (r.degree, r.coreness) for r in rows}
    assert set(got) == set(nbrs)
    for u in nbrs:
        assert got[u][0] == len(nbrs[u])
        assert got[u][1] == true_core[u]
    # coreness invariants: 1 <= coreness <= degree
    for u, (d, c) in got.items():
        assert 1 <= c <= d


def test_stream_good_turing_novelty_python_replay(spark, sf_small):
    """Replay the 3-chunk cumulative shingle trajectory in pure Python
    (chunking mirrors the staging's ceil(n/3) doc_id-ordered slices)."""
    from collections import Counter

    rows = sorted(
        SPECS["stream_good_turing_novelty"].fn(spark, sf_small).collect(),
        key=lambda r: r.chunk_min_doc_id,
    )
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    n = len(docs)
    step = (n + 2) // 3
    cum: Counter = Counter()
    seen: set = set()
    expect = []
    for b in range(3):
        chunk = docs[b * step : (b + 1) * step]
        if not chunk:
            continue
        grams = []
        for _, text in chunk:
            t = text.split(" ")
            grams.extend(
                " ".join(t[i : i + 3]) for i in range(len(t) - 2)
            )
        new = {g for g in grams} - seen
        seen |= {g for g in grams}
        cum.update(grams)
        n1 = sum(1 for c in cum.values() if c == 1)
        n2 = sum(1 for c in cum.values() if c == 2)
        nt, ntok = len(cum), sum(cum.values())
        chao1 = nt + (float(n1) * n1) / (2.0 * n2) if n2 else float(nt)
        expect.append(
            (chunk[0][0], len(new), nt, ntok, n1, n2, n1 / ntok, chao1)
        )
    assert len(rows) == len(expect)
    for r, e in zip(rows, expect):
        assert (
            r.chunk_min_doc_id,
            r.n_new_types,
            r.n_types,
            r.n_tokens,
            r.n_singletons,
            r.n_doubletons,
        ) == e[:6]
        assert abs(r.missing_mass - e[6]) < 1e-15
        assert abs(r.chao1_richness - e[7]) < 1e-9
    # novelty invariants: batch 0 is all-new; cumulative counts grow;
    # missing mass strictly falls as the corpus accumulates
    assert rows[0].n_new_types == rows[0].n_types
    assert rows[0].missing_mass > rows[-1].missing_mass
    for a, b in zip(rows, rows[1:]):
        assert b.n_types >= a.n_types and b.n_tokens > a.n_tokens
        assert b.chao1_richness >= b.n_types


def test_pca_deflation_top3_numpy_reference(spark, sf_small):
    """Rotation-invariant pins vs numpy's exact eigendecomposition —
    the near-degenerate synthetic spectrum (adjacent eigenvalue ratios
    1.01-1.07) makes individual eigenvectors unpinnable, so assert the
    facts deflation must deliver regardless: orthonormal output,
    decreasing in-bracket eigenvalue estimates, self-consistent
    Rayleigh quotients, and ≥95% of the true top-3 variance."""
    import numpy as np

    rows = SPECS["embedding_pca_deflation_top3"].fn(spark, sf_small).collect()
    assert len(rows) == 3 * 64
    V = np.zeros((3, 64))
    lam = [0.0] * 3
    for r in rows:
        V[r.component][r.dim] = r.pc
        lam[r.component] = r.eigenvalue
    con = duckdb.connect()
    t = con.execute(
        f"SELECT embedding FROM '{sf_small}/embeddings.parquet'"
    ).fetchnumpy()
    X = np.array([np.array(e, dtype=np.float64) for e in t["embedding"]])
    mu = X.mean(0)
    D = X - mu
    C = D.T @ D / len(X)
    evals = np.linalg.eigvalsh(C)[::-1]
    # orthonormality (6-decimal rounding bounds the residual)
    G = V @ V.T
    assert np.abs(G - np.eye(3)).max() < 1e-4
    # eigenvalue estimates: strictly decreasing, each within its bracket
    assert lam[0] > lam[1] > lam[2] > 0
    for j in range(3):
        assert lam[j] <= evals[0] * 1.001
        assert lam[j] >= 0.93 * evals[j]
    # engine's lambda agrees with the Rayleigh quotient of its own vector
    for j in range(3):
        assert abs(float(V[j] @ C @ V[j]) - lam[j]) < 5e-4
    # the 3 directions capture >= 95% of the true top-3 variance
    rayleigh = sum(float(V[j] @ C @ V[j]) for j in range(3))
    assert rayleigh >= 0.95 * evals[:3].sum()
    # mu column matches the exact-decimal mean convention (r14:
    # _pca_load_centered sums DECIMAL(18,6)-quantized values so mu is
    # order-independent and oracle-replayable; replay it here with
    # Decimal HALF_UP quantization — the true float mean agrees only
    # to the 5e-7/n quantization bound, so pin the EXACT convention)
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("0.000001")
    mu_exact = [
        float(
            sum(
                Decimal(float(x)).quantize(q, rounding=ROUND_HALF_UP)
                for x in X[:, i]
            )
        )
        / len(X)
        for i in range(64)
    ]
    mus = {r.dim: r.mu for r in rows}
    assert max(abs(mus[i] - mu_exact[i]) for i in range(64)) == 0.0
    # and stays within the quantization bound of the true float mean
    assert max(abs(mus[i] - mu[i]) for i in range(64)) < 1e-6


def test_pca_deflation_rerun_bit_identical(spark, sf_small):
    a = SPECS["embedding_pca_deflation_top3"].fn(spark, sf_small).collect()
    b = SPECS["embedding_pca_deflation_top3"].fn(spark, sf_small).collect()
    ka = sorted((r.component, r.dim, r.pc, r.eigenvalue) for r in a)
    kb = sorted((r.component, r.dim, r.pc, r.eigenvalue) for r in b)
    assert ka == kb


def test_kcore_hindex_one_more_round_is_fixed_point(spark, sf_small):
    """Replaying one EXTRA h-operator round on the engine's output
    changes nothing — the registered fixed schedule has converged."""

    def hindex(vals):
        vals = sorted(vals, reverse=True)
        return max((min(i + 1, v) for i, v in enumerate(vals)), default=0)

    rows = SPECS["graph_kcore_decomposition"].fn(spark, sf_small).collect()
    nbrs = _sparsified_nbrs(sf_small)
    c = {r.node: r.coreness for r in rows}
    for u in nbrs:
        assert hindex([c[v] for v in nbrs[u]]) == c[u]
