"""Round-14 guards: graph scale-probe tooling and kernel factoring.

The r14 feature work is mostly verification infrastructure (VERDICT
r13 items 1/4/6); these tests pin the pieces that could silently rot:
the synthetic graph staging, the probe's argv contract, and the
equivalence of the factored iteration kernels with the registered
ops' outputs (the registered ops themselves stay oracle-checked by
test_oracle_parity.py — this guards the FACTORING seam the probe
depends on).
"""

from __future__ import annotations

import duckdb

from kafka_stream_processing_spark.registry import all_specs

SPECS = all_specs()


def test_stage_graph_is_deterministic_and_triangle_rich(tmp_path):
    """Two stagings of the same n produce byte-identical edge sets
    (hash-deterministic — no RNG); edges satisfy a < b with no dups;
    the community construction yields triangles (k-truss needs them)
    and cross-community bridges (the zero-support negative class)."""
    from kafka_stream_processing_spark.tools.stage_graph import stage

    d1, d2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    stage(600, d1)
    stage(600, d2)
    con = duckdb.connect()
    e1 = con.execute(
        f"SELECT a, b, w FROM '{d1}/graph_edges.parquet' ORDER BY a, b"
    ).fetchall()
    e2 = con.execute(
        f"SELECT a, b, w FROM '{d2}/graph_edges.parquet' ORDER BY a, b"
    ).fetchall()
    assert e1 == e2 and len(e1) > 0
    assert all(a < b for a, b, _ in e1)
    assert len(set((a, b) for a, b, _ in e1)) == len(e1)
    n_tri = con.execute(
        f"""WITH e AS (SELECT a, b FROM '{d1}/graph_edges.parquet')
            SELECT count(*) FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b"""
    ).fetchone()[0]
    assert n_tri > 0
    bridges = con.execute(
        f"""SELECT count(*) FROM '{d1}/graph_edges.parquet'
            WHERE CAST(substr(a, 2) AS INT) // 100
                  <> CAST(substr(b, 2) AS INT) // 100"""
    ).fetchone()[0]
    assert bridges > 0


def test_probe_graph_parse_argv():
    from kafka_stream_processing_spark.tools.probe_graph import parse_argv

    assert parse_argv([]) == ("/tmp/kssp_graph", "/root/testdata/sf0.1")
    assert parse_argv(["--graph-dir", "/x", "--sf-dir", "/y"]) == (
        "/x",
        "/y",
    )


def test_ktruss_kernel_matches_registered_op(spark, sf_small):
    """graph_ktruss_peeling == _ktruss_decompose(_sig_adj_df(...)) —
    the r14 factoring seam the graph probe drives; if the registered
    op ever diverges from the kernel, the probe measures the wrong
    thing."""
    from kafka_stream_processing_spark.operators.graph import (
        _ktruss_decompose,
        _sig_adj_df,
    )

    via_op = sorted(
        map(tuple, SPECS["graph_ktruss_peeling"].fn(spark, sf_small).collect())
    )
    via_kernel = sorted(
        map(
            tuple,
            _ktruss_decompose(
                _sig_adj_df(spark, sf_small).localCheckpoint(eager=True)
            ).collect(),
        )
    )
    assert via_op == via_kernel and len(via_op) > 0


def test_ppr_kernel_matches_registered_op(spark, sf_small):
    """graph_ppr_single_source == select over _ppr_power_iterate(...)
    — same factoring-seam guard as the truss twin (values compared
    exactly: both paths run the identical fixed schedule)."""
    from pyspark.sql import functions as F

    from kafka_stream_processing_spark.operators.graph import (
        _ppr_power_iterate,
        _trade_frac_df,
    )
    from kafka_stream_processing_spark.sources.tables import table

    via_op = sorted(
        map(
            tuple,
            SPECS["graph_ppr_single_source"].fn(spark, sf_small).collect(),
        )
    )
    nodes = table(spark, sf_small, "nation").select(
        F.col("n_name").alias("node")
    )
    ranks = _ppr_power_iterate(nodes, _trade_frac_df(spark, sf_small))
    via_kernel = sorted(
        map(
            tuple,
            ranks.select(
                F.col("node").alias("nation"),
                F.round("r", 9).alias("ppr"),
                (F.col("node") == F.col("hub")).alias("is_source"),
            ).collect(),
        )
    )
    assert via_op == via_kernel and len(via_op) == 25


def test_footrule_ann_eval_pure_python_replay(spark, sf_small):
    """Independent replay (the r13 Cliff's-delta lesson: oracle parity
    can agree on the same wrong formula): recompute Fagin's F^(k+1)
    footrule in plain python dicts from the two registered top-k
    results and compare every output cell."""
    exact = SPECS["similarity_bruteforce_topk"].fn(spark, sf_small).collect()
    approx = SPECS["similarity_ivf_probed_topk"].fn(spark, sf_small).collect()
    got = {
        r.query_id: r
        for r in SPECS["similarity_rank_distance_ann_eval"]
        .fn(spark, sf_small)
        .collect()
    }

    def ranks(rows):
        out: dict[int, dict[int, int]] = {}
        for q in {r.query_id for r in rows}:
            lst = sorted(
                (r for r in rows if r.query_id == q),
                key=lambda r: (-r.cosine, r.neighbor_id),
            )
            out[q] = {r.neighbor_id: i + 1 for i, r in enumerate(lst)}
        return out

    re_, ra_ = ranks(exact), ranks(approx)
    assert set(got) == set(re_) == set(ra_)
    for q in re_:
        ids = set(re_[q]) | set(ra_[q])
        foot = sum(
            abs(re_[q].get(i, 11) - ra_[q].get(i, 11)) for i in ids
        )
        overlap = len(set(re_[q]) & set(ra_[q]))
        assert got[q].footrule == foot
        assert got[q].n_overlap == overlap
        assert abs(got[q].nfd - foot / 110.0) < 1e-15
        assert 0 <= got[q].nfd <= 1.0
        # footrule 0 iff the two rankings are identical
        assert (got[q].footrule == 0) == (re_[q] == ra_[q])


def test_kendall_w_pure_python_replay(spark, sf_small):
    """Brute-force Kendall's W replay: average ranks by sorting in
    python (no histograms), the textbook tie-corrected formula in
    floats — must agree with the engine's exact-integer form to float
    tolerance, and sit in [0, 1]."""
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT length(text),
                   len(string_split(text, ' ')),
                   len(list_distinct(string_split(text, ' ')))
            FROM '{sf_small}/documents.parquet' ORDER BY doc_id"""
    ).fetchall()
    n = len(rows)
    m = 3

    def avg_ranks(vals):
        order = sorted(range(n), key=lambda i: vals[i])
        ranks = [0.0] * n
        i = 0
        while i < n:
            j = i
            while j + 1 < n and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            avg = (i + j + 2) / 2.0
            for t in range(i, j + 1):
                ranks[order[t]] = avg
            i = j + 1
        return ranks

    cols = list(zip(*rows))
    rks = [avg_ranks(list(c)) for c in cols]
    R = [sum(rks[k][i] for k in range(m)) for i in range(n)]
    S = sum(r * r for r in R)
    T = 0
    for c in cols:
        cnt: dict[int, int] = {}
        for v in c:
            cnt[v] = cnt.get(v, 0) + 1
        T += sum(t**3 - t for t in cnt.values())
    w_ref = (12 * S - 3 * m * m * n * (n + 1) ** 2) / (
        m * m * (n**3 - n) - m * T
    )
    row = (
        SPECS["quality_kendall_w_concordance"]
        .fn(spark, sf_small)
        .collect()[0]
    )
    assert row.n_docs == n
    assert row.tie_t == T
    assert abs(row.w - w_ref) < 1e-9
    assert 0.0 <= row.w <= 1.0
    assert abs(row.chi2 - m * (n - 1) * row.w) < 1e-9


def test_stream_extremal_monitor_first_chunk_replay(spark, sf_small):
    """Pure-python replay of chunk 0 (first ceil(n/3) train docs by
    doc_id): threshold at the exact ceil(4n/5) rank, doc_id gaps
    between exceedances, both Ferro-Segers variants — must match the
    streamed row exactly (ints) / to float tolerance (theta)."""
    con = duckdb.connect()
    docs = con.execute(
        f"""SELECT doc_id, n_chars
            FROM '{sf_small}/documents.parquet'
            WHERE source <> 'src0' ORDER BY doc_id"""
    ).fetchall()
    n = len(docs)
    chunk = docs[: (n + 2) // 3]
    nb = len(chunk)
    vals = sorted(v for _, v in chunk)
    k = (nb * 4 + 5 - 1) // 5
    u = vals[k - 1]
    exc = [d for d, v in chunk if v > u]
    gaps = [b - a for a, b in zip(exc, exc[1:])]
    assert len(gaps) >= 2, "fixture must produce >= 2 gaps"
    ng = len(gaps)
    sg, sg2 = sum(gaps), sum(g * g for g in gaps)
    sg1 = sum(g - 1 for g in gaps)
    sg12 = sum((g - 1) * (g - 2) for g in gaps)
    if max(gaps) <= 2:
        theta = min(1.0, 2.0 * sg * sg / (ng * sg2))
    else:
        theta = min(1.0, 2.0 * sg1 * sg1 / (ng * sg12))
    rows = sorted(
        SPECS["stream_extremal_index_monitor"]
        .fn(spark, sf_small)
        .collect(),
        key=lambda r: r.chunk_min_doc_id,
    )
    r0 = rows[0]
    assert r0.chunk_min_doc_id == chunk[0][0]
    assert r0.n_batch == nb
    assert r0.threshold == u
    assert r0.n_exceed == len(exc)
    assert r0.max_gap == max(gaps)
    assert abs(r0.theta - theta) < 1e-12
    assert 0.0 < r0.theta <= 1.0
