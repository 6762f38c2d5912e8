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
