"""Round-7 fourth wave: Good-Turing mass, Neyman allocation."""

from __future__ import annotations

import duckdb

from kafka_stream_processing_spark.registry import all_specs

SPECS = all_specs()

def test_good_turing_python_reference(spark, sf_small):
    from collections import Counter

    (row,) = SPECS["corpus_good_turing_mass"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    words = Counter()
    for (t,) in con.execute(
        f"SELECT text FROM '{sf_small}/documents.parquet'"
    ).fetchall():
        words.update(t.split(" "))
    n_tokens = sum(words.values())
    n1 = sum(1 for c in words.values() if c == 1)
    n2 = sum(1 for c in words.values() if c == 2)
    assert row.n_types == len(words)
    assert row.n_tokens == n_tokens
    assert row.n_singletons == n1 and row.n_doubletons == n2
    assert abs(row.missing_mass - n1 / n_tokens) < 1e-12
    want_chao1 = (
        len(words) + n1 * n1 / (2 * n2) if n2 else float(len(words))
    )
    assert abs(row.chao1_richness - want_chao1) < 1e-9
    assert 0 <= row.missing_mass <= 1
    assert row.chao1_richness >= row.n_types


def test_neyman_allocation_budget_and_replay(spark, sf_small):
    """Largest-remainder replay + the Neyman invariants: allocations
    sum exactly to the budget and follow N_h*S_h order."""
    import math

    from kafka_stream_processing_spark.operators.pipeline import (
        NEYMAN_BUDGET,
    )

    rows = SPECS["sample_neyman_allocation"].fn(spark, sf_small).collect()
    assert sum(r.n_alloc for r in rows) == NEYMAN_BUDGET
    for r in rows:
        assert r.n_sampled == r.n_alloc
    con = duckdb.connect()
    data = con.execute(
        f"SELECT lang, n_chars FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    strata: dict[str, list] = {}
    for lang, c in data:
        strata.setdefault(lang, []).append(c)
    w = {}
    for lang, vals in strata.items():
        n = len(vals)
        s1, s2 = sum(vals), sum(v * v for v in vals)
        sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
        w[lang] = n * sd
    tw = sum(w.values())
    fa = {l: math.floor(NEYMAN_BUDGET * w[l] / tw) for l in w}
    rem = {l: NEYMAN_BUDGET * w[l] / tw - fa[l] for l in w}
    left = NEYMAN_BUDGET - sum(fa.values())
    order = sorted(w, key=lambda l: (-rem[l], l))
    want = {
        l: fa[l] + (1 if i < left else 0) for i, l in enumerate(order)
    }
    got = {r.lang: r.n_alloc for r in rows}
    assert got == want


def test_oov_rate_python_replay(spark, sf_small):
    rows = SPECS["quality_oov_rate_by_source"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    data = con.execute(
        f"SELECT source, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    vocab = set()
    for s, t in data:
        if s == "src0":
            vocab.update(t.split(" "))
    per: dict[str, list] = {}
    for s, t in data:
        if s != "src0":
            per.setdefault(s, []).extend(t.split(" "))
    assert {r.source for r in rows} == set(per)
    for r in rows:
        toks = per[r.source]
        oov = [w for w in toks if w not in vocab]
        assert r.n_tokens == len(toks)
        assert r.n_oov_tokens == len(oov)
        assert abs(r.oov_rate - len(oov) / len(toks)) < 1e-12
        assert r.n_types == len(set(toks))
        assert r.n_oov_types == len(set(oov))
        assert 0 <= r.oov_rate <= 1


def test_ewma_recursion_replay(spark, sf_small):
    """The weighted-sum form equals the textbook recursion
    s_t = alpha*x_t + (1-alpha)*s_{t-1} with bias correction, within
    the round-6 per-term tolerance, and residuals are one-step-ahead."""
    rows = sorted(
        SPECS["window_ewma_residuals"].fn(spark, sf_small).collect(),
        key=lambda r: r.day,
    )
    xs = [r.n_events for r in rows]
    alpha = 0.5
    num = 0.0  # un-normalized EWMA numerator: sum (1-a)^(t-i) x_i
    prev_ewma = None
    for t, (r, x) in enumerate(zip(rows, xs)):
        num = num * (1 - alpha) + x
        ewma = alpha * num / (1 - (1 - alpha) ** (t + 1))
        # per-term round-6 decimals bound the drift by 5e-7 * n_terms
        assert abs(r.ewma - ewma) < 1e-4, r.day
        if prev_ewma is None:
            assert r.forecast_residual is None
        else:
            assert abs(r.forecast_residual - (x - prev_ewma)) < 1e-4
        prev_ewma = r.ewma
