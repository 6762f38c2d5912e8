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
