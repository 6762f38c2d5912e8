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


def test_brown_forsythe_python_replay(spark, sf_small):
    (row,) = (
        SPECS["quality_brown_forsythe_drift"].fn(spark, sf_small).collect()
    )
    con = duckdb.connect()
    data = con.execute(
        f"SELECT source, doc_id, n_chars FROM "
        f"'{sf_small}/documents.parquet'"
    ).fetchall()
    groups: dict[str, list] = {}
    for s, d, c in data:
        groups.setdefault(s, []).append((c, d))
    zs: dict[str, list] = {}
    for s, vals in groups.items():
        ordered = sorted(vals)
        med = ordered[(len(ordered) + 1) // 2 - 1][0]
        zs[s] = [abs(c - med) for c, _ in vals]
    k = len(zs)
    n = sum(len(v) for v in zs.values())
    s_all = sum(sum(v) for v in zs.values())
    sq = sum(sum(v) ** 2 / len(v) for v in zs.values())
    sz2 = sum(x * x for v in zs.values() for x in v)
    msb = (sq - s_all * s_all / n) / (k - 1)
    msw = (sz2 - sq) / (n - k)
    assert row.k_groups == k and row.n_total == n
    assert abs(row.bf_f - msb / msw) < 1e-9
    assert row.drift == (row.bf_f > row.critical_005)
    # homogeneous synthetic sources: the gate must stay quiet
    assert not row.drift


def test_link_prediction_python_replay(spark, sf_small):
    """Adjacency, candidate set, and all three scorers replayed in
    pure Python over the same sparsified graph."""
    import math
    from decimal import Decimal

    rows = SPECS["graph_link_prediction_common_neighbors"].fn(
        spark, sf_small
    ).collect()
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf_small}/{t}.parquet'"
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
    ne, tw = len(edges), sum(w for _, _, w in edges)
    adj = set()
    for s, d, w in edges:
        if w * ne >= 2 * tw:
            adj.add((min(s, d), max(s, d)))
    nbrs: dict[str, set] = {}
    for a, b in adj:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in adj:
                continue
            common = nbrs[a] & nbrs[b]
            if not common:
                continue
            aa = float(
                sum(
                    Decimal(str(round(1.0 / math.log(len(nbrs[z])), 6)))
                    for z in common
                )
            )
            jac = len(common) / (len(nbrs[a]) + len(nbrs[b]) - len(common))
            want[(a, b)] = (len(common), jac, aa)
    got = {
        (r.node_a, r.node_b): (r.n_common, r.jaccard, r.adamic_adar)
        for r in rows
    }
    assert set(got) == set(want) and len(want) > 5
    for key in want:
        assert got[key][0] == want[key][0]
        assert abs(got[key][1] - want[key][1]) < 1e-12
        assert abs(got[key][2] - want[key][2]) < 1e-9
