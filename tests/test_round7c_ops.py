"""Round-7 third wave: CUSUM changepoint, power-iteration PCA."""

from __future__ import annotations

import duckdb

from kafka_stream_processing_spark.registry import all_specs

SPECS = all_specs()

def test_cusum_recursion_replay(spark, sf_small):
    """The closed form (cumsum minus running min) equals Page's
    recursion S_t = max(0, S_{t-1} + x_t - mu0 - k), replayed in exact
    Fraction arithmetic."""
    from fractions import Fraction

    from kafka_stream_processing_spark.operators.windowed import (
        CUSUM_K_DEN,
    )

    rows = sorted(
        SPECS["window_cusum_changepoint"].fn(spark, sf_small).collect(),
        key=lambda r: r.day,
    )
    xs = [r.n_events for r in rows]
    n = len(xs)
    mu = Fraction(sum(xs), n)
    k = mu / CUSUM_K_DEN
    su = sd = Fraction(0)
    for r, x in zip(rows, xs):
        su = max(Fraction(0), su + x - mu - k)
        sd = max(Fraction(0), sd + mu - x - k)
        assert abs(r.cusum_up - float(su)) < 1e-9, r.day
        assert abs(r.cusum_down - float(sd)) < 1e-9, r.day
        assert r.alarm_up == (su > mu) and r.alarm_down == (sd > mu)


def test_power_iteration_pca_vs_numpy(spark, sf_small):
    """Rayleigh-quotient convergence vs numpy's exact eigh, plus
    bit-exact rerun determinism (decimal-sum aggregates)."""
    import numpy as np

    rows = sorted(
        SPECS["embedding_top_pc_power_iteration"]
        .fn(spark, sf_small)
        .collect(),
        key=lambda r: r.dim,
    )
    assert len(rows) == 64
    v = np.array([r.pc for r in rows])
    mu = np.array([r.mu for r in rows])
    lam = rows[0].eigenvalue
    con = duckdb.connect()
    X = np.stack(
        [
            np.array(e)
            for (e,) in con.execute(
                f"SELECT embedding FROM "
                f"'{sf_small}/embeddings.parquet' ORDER BY vec_id"
            ).fetchall()
        ]
    )
    D = X - X.mean(0)
    C = D.T @ D / len(X)
    wvals, wvecs = np.linalg.eigh(C)
    # r14: mu is the exact-decimal(18,6) mean (oracle-replayable),
    # within the 5e-7 quantization bound of the float mean
    assert np.allclose(mu, X.mean(0), atol=1e-6)
    # eigenvalue estimate within the power-iteration guarantee
    assert lam >= 0.97 * wvals[-1]
    assert lam <= wvals[-1] * 1.001
    # direction: a real (if gap-limited) alignment with the top space
    cos = abs(float(v @ wvecs[:, -1])) / float(np.linalg.norm(v))
    assert cos >= 0.85
    # unit norm and sign convention
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    nz = v[v != 0.0]
    assert nz[0] > 0
    # determinism: rerun is bit-identical
    again = sorted(
        SPECS["embedding_top_pc_power_iteration"]
        .fn(spark, sf_small)
        .collect(),
        key=lambda r: r.dim,
    )
    assert [(r.pc, r.eigenvalue) for r in again] == [
        (r.pc, r.eigenvalue) for r in rows
    ]

