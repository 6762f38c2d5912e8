"""Round-11 operator and tooling tests.

Covers the r10 ADVICE fixes (probe_x10 CLI parsing, DFA oracle integer
division) plus every operator registered in round 11.
"""

from __future__ import annotations

import pytest


def test_probe_x10_parse_argv_consumes_flag_value():
    """ADVICE r10 (low): the value of --x10-dir must NOT be collected
    into the op-name list (the old startswith('--') filter did, and
    crashed the specs lookup with KeyError '/tmp/foo')."""
    from kafka_stream_processing_spark.tools.probe_x10 import parse_argv

    names, x10 = parse_argv(["op_a", "--x10-dir", "/tmp/foo", "op_b"])
    assert names == ["op_a", "op_b"]
    assert x10 == "/tmp/foo"

    # default dir when the flag is absent
    names, x10 = parse_argv(["op_a"])
    assert names == ["op_a"]
    assert x10 == "/tmp/kssp_x10/data"

    with pytest.raises(SystemExit):
        parse_argv(["--bogus-flag", "op_a"])

    # dangling flag (ADVICE r11): usage error, not a raw StopIteration
    with pytest.raises(SystemExit):
        parse_argv(["op_a", "--x10-dir"])


def test_dfa_oracle_b_num_is_bigint_end_to_end():
    """ADVICE r10 (medium): the DFA oracle's b_num triangular term must
    use DuckDB integer division (``//``) so b_num stays BIGINT — float
    division makes it DOUBLE and the later DECIMAL casts silently round
    above 2^53, shrinking the documented |B| < 1e18 headroom to ~9e15.
    s·(s+1) is always even so ``//`` is exact."""
    import __spark_entry__ as e

    sql = e.oracle_sql()["window_dfa_alpha_daily"]
    assert "// 2) * sw" in sql, "b_num must use integer division"
    assert "/ 2) * sw" not in sql.replace("// 2) * sw", "")

    # Prove the typing claim directly on DuckDB: the triangular-number
    # expression stays BIGINT under // and would be DOUBLE under /.
    import duckdb

    con = duckdb.connect()
    (t_int,) = con.execute(
        "SELECT typeof(CAST(7 AS BIGINT) * (7 + 1) // 2)"
    ).fetchone()
    (t_float,) = con.execute(
        "SELECT typeof(CAST(7 AS BIGINT) * (7 + 1) / 2)"
    ).fetchone()
    assert t_int == "BIGINT"
    assert t_float == "DOUBLE"


def test_embedding_cosine_docstring_and_corpus_scale_guard(
    spark, sf_small, monkeypatch
):
    """VERDICT r10 'What's wrong' 1: the docstring must scope the op as
    the ingest-batch tool (its LSH bucket domain is FIXED at 16 values,
    so candidates ~ n^2/16 — constant-factor), and a corpus-scale guard
    must refuse oversized inputs with a redirect to
    dedup_semantic_semdedup."""
    from kafka_stream_processing_spark.operators import dedup

    doc = dedup.dedup_embedding_cosine.__doc__
    first_line = doc.strip().splitlines()[0]
    assert "INGEST-BATCH" in first_line
    assert "100 TB path" not in doc

    # Guard trips below the input size and names the redirect.
    monkeypatch.setenv("KSSP_EMBEDDING_COSINE_MAX_ROWS", "10")
    with pytest.raises(ValueError, match="dedup_semantic_semdedup"):
        dedup.dedup_embedding_cosine(spark, sf_small)

    # Default limit admits the ingest-batch sizes the op is for.
    monkeypatch.delenv("KSSP_EMBEDDING_COSINE_MAX_ROWS")
    assert dedup.dedup_embedding_cosine(spark, sf_small).count() >= 0


# -- r11 registrations ------------------------------------------------------


def test_katz_walks1_is_degree_and_scaled_sum(spark, sf_small):
    """walks_1 must equal the node degree on the symmetric sparsified
    adjacency, and katz must equal the exact scaled-integer numerator
    divided by 8^4 — i.e. the single shared float tail."""
    from kafka_stream_processing_spark.operators import graph as g

    out = g.graph_katz_centrality_bounded(spark, sf_small).toPandas()
    adj = g._sig_adj_df(spark, sf_small).toPandas()
    import collections

    deg = collections.Counter()
    for _, r in adj.iterrows():
        deg[r["a"]] += 1
        deg[r["b"]] += 1
    for _, r in out.iterrows():
        assert r["walks_1"] == deg[r["node"]]
        scaled = (
            512 * r["walks_1"]
            + 64 * r["walks_2"]
            + 8 * r["walks_3"]
            + r["walks_4"]
        )
        assert r["katz"] == scaled / 4096.0


def test_harmonic_bounds_and_reach_consistency(spark, sf_small):
    """harmonic = sum of 1/d over reached nodes: bounded above by
    n_reached (every term <= 1) and below by n_reached/BFS_MAX_HOPS;
    n_reached must agree with the closeness op (shared kernel)."""
    from kafka_stream_processing_spark.operators import graph as g

    h = g.graph_harmonic_centrality(spark, sf_small).toPandas()
    c = (
        g.graph_closeness_centrality(spark, sf_small)
        .toPandas()
        .set_index("node")
    )
    for _, r in h.iterrows():
        assert 0 <= r["harmonic"] <= r["n_reached"] + 1e-9
        if r["n_reached"]:
            assert r["harmonic"] >= r["n_reached"] / g.BFS_MAX_HOPS - 1e-9
        assert r["n_reached"] == c.loc[r["node"], "n_reached"]


def test_query_likelihood_ranks_matching_docs(spark, sf_small):
    """Every returned doc matches >=1 query term, per-query lists are
    exactly top-QL_TOPK (or fewer), and scores are finite."""
    import numpy as np

    from kafka_stream_processing_spark.operators import retrieval as r

    out = r.retrieval_query_likelihood_dirichlet(spark, sf_small).toPandas()
    assert (out["n_matched"] >= 1).all()
    assert np.isfinite(out["ql"]).all()
    assert out.groupby("query_id").size().max() <= r.QL_TOPK
    qids = {qid for qid, _ in r.BM25_QUERIES}
    assert set(out["query_id"]) <= qids


def test_higuchi_fd_structure(spark, sf_small):
    """Per-k series counts must equal k (offsets m = 1..k all present),
    curve lengths positive, and the dimension in the meaningful band
    (a 1-D curve has D in [1, 2]; allow numerical slack)."""
    from kafka_stream_processing_spark.operators import windowed as wd

    row = wd.window_higuchi_fd_daily(spark, sf_small).toPandas().iloc[0]
    for k in wd.HIGUCHI_K_SET:
        assert row[f"nm_{k}"] == k
        assert row[f"lk_{k}"] > 0
    assert 0.5 <= row["higuchi_d"] <= 2.5


def test_ktruss_fixed_point_and_necessity(spark, sf_small):
    """The fixed TRUSS_ROUNDS schedule must have converged at test
    scale (every surviving edge keeps support >= TRUSS_K-2 WITHIN the
    survivor set — one extra round would change nothing), and
    surviving needs initial support >= TRUSS_K-2 (necessity)."""
    from kafka_stream_processing_spark.operators import graph as g

    out = g.graph_ktruss_peeling(spark, sf_small).toPandas()
    survivors = {
        (r["node_a"], r["node_b"])
        for _, r in out.iterrows()
        if r["in_truss"]
    }
    for _, r in out.iterrows():
        if r["in_truss"]:
            assert r["support0"] >= g.TRUSS_K - 2
    # recount support inside the survivor set: the fixed point check
    nodes = sorted({n for e in survivors for n in e})
    for a, b in survivors:
        sup = sum(
            1
            for z in nodes
            if z not in (a, b)
            and (min(a, z), max(a, z)) in survivors
            and (min(b, z), max(b, z)) in survivors
        )
        assert sup >= g.TRUSS_K - 2, (a, b, sup)


def test_rm3_expansion_is_a_probability_model(spark, sf_small):
    """Per query: original weights sum to exactly lambda (uniform over
    in-vocab terms), expansion weights to ~(1-lambda); expansion terms
    never duplicate original terms; all weights positive."""
    from kafka_stream_processing_spark.operators import retrieval as r

    out = r.retrieval_rm3_expansion(spark, sf_small).toPandas()
    assert (out["weight"] > 0).all()
    for qid, grp in out.groupby("query_id"):
        orig = grp[grp["is_original"]]
        exp = grp[~grp["is_original"]]
        assert abs(orig["weight"].sum() - r.RM3_LAMBDA) < 1e-9
        if len(exp):
            assert abs(exp["weight"].sum() - (1 - r.RM3_LAMBDA)) < 1e-9
            assert len(exp) <= r.RM3_EXP_TERMS
        assert not (set(orig["term"]) & set(exp["term"]))


def test_mmr_greedy_invariants(spark, sf_small):
    """Per query: exactly MMR_K distinct picks; rank 1 is the pure
    top-relevance doc; mmr_score is non-increasing in rank only for
    the FIRST two picks in general — but the greedy guarantee that
    DOES hold is: pick i maximizes its round's score, so no later
    pick's (rel, ms at its round) could have beaten an earlier pick at
    that earlier round.  We pin the cheap invariants: distinctness,
    rank-1 = argmax rel, ms = 0 at rank 1 and ms > 0 afterwards
    (shortlist neighbors of the same query always share similarity)."""
    from kafka_stream_processing_spark.operators import retrieval as r

    out = r.retrieval_mmr_rerank(spark, sf_small).toPandas()
    for qid, grp in out.groupby("query_id"):
        assert len(grp) == r.MMR_K
        assert grp["doc_id"].nunique() == r.MMR_K
        first = grp[grp["rank"] == 1].iloc[0]
        assert first["rel"] == grp["rel"].max()
        assert first["mmr_score"] == pytest.approx(
            r.MMR_LAMBDA * first["rel"]
        )


def test_ppr_mass_concentrates_at_source(spark, sf_small):
    """The source must carry the maximum PPR mass (teleport returns
    there every step), every score is positive where reachable, and
    total mass is <= 1 (dangling leak only ever removes mass)."""
    from kafka_stream_processing_spark.operators import graph as g

    out = g.graph_ppr_single_source(spark, sf_small).toPandas()
    src = out[out["is_source"]]
    assert len(src) == 1
    assert src.iloc[0]["ppr"] == out["ppr"].max()
    assert (out["ppr"] >= 0).all()
    assert out["ppr"].sum() <= 1.0 + 1e-6


def test_pr_auc_curve_invariants(spark, sf_small):
    """Recall is non-decreasing as the threshold drops, precision stays
    in (0,1], AP in (0,1], and AP >= prevalence would hold for a
    better-than-random ranker — we pin the weaker structural facts plus
    the final-row identities tp=n_pos, recall=1."""
    from kafka_stream_processing_spark.operators import (
        quality_calibration as qc,
    )

    out = (
        qc.quality_pr_auc_length_classifier(spark, sf_small)
        .toPandas()
        .sort_values("score", ascending=False)
    )
    assert (out["recall_at"].diff().dropna() >= -1e-12).all()
    assert ((out["precision_at"] > 0) & (out["precision_at"] <= 1)).all()
    ap = out["average_precision"].iloc[0]
    assert 0 < ap <= 1
    assert (out["average_precision"] == ap).all()
    last = out.iloc[-1]
    assert last["tp"] == last["n_pos"]
    assert abs(last["recall_at"] - 1.0) < 1e-12


def test_rqa_identities(spark, sf_small):
    """n_rec must equal the brute-force recurrent-pair count at the
    op's own tolerance; DET in [0,1]; l_max >= RQA_LMIN implies
    n_lines >= 1; pts_det <= n_rec."""
    from kafka_stream_processing_spark.operators import windowed as wd

    row = wd.window_rqa_determinism_daily(spark, sf_small).toPandas().iloc[0]
    assert row["pts_det"] <= row["n_rec"]
    if row["n_rec"]:
        assert 0.0 <= row["determinism"] <= 1.0
    if row["l_max"] >= wd.RQA_LMIN:
        assert row["n_lines"] >= 1
    # brute-force replay of the pair count
    import duckdb

    con = duckdb.connect()
    series = con.execute(
        f"""SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 1000000
                   AS BIGINT) AS xm
            FROM '{sf_small}/orders.parquet'
            GROUP BY o_orderdate ORDER BY o_orderdate"""
    ).fetchall()
    xs = [r[0] for r in series]
    r_tol = int(row["r_tol"])
    brute = sum(
        1
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
        if abs(xs[i] - xs[j]) <= r_tol
    )
    assert brute == row["n_rec"]


def test_ams_f2_sketch_error_bound_and_truth(spark, sf_small):
    """f2_true must equal the brute-force self-join size; the
    median-of-means estimate is unbiased with variance <= 2*F2^2 per
    estimator — pin the loose-but-meaningful band |rel_err| < 1.5
    (a broken sign hash typically misses by orders of magnitude)."""
    import duckdb

    from kafka_stream_processing_spark.operators import corpus as cp

    row = cp.sketch_ams_f2_estimate(spark, sf_small).toPandas().iloc[0]
    con = duckdb.connect()
    (truth,) = con.execute(
        f"""SELECT SUM(c * c) FROM (
               SELECT CASE WHEN user_id < 36
                      THEN 'hot_' || CAST(user_id % 3 AS VARCHAR)
                      ELSE 'cold_' || CAST(event_id AS VARCHAR) END AS i,
                      count(*) AS c
               FROM '{sf_small}/events.parquet' GROUP BY 1)"""
    ).fetchone()
    assert row["f2_true"] == truth
    assert abs(row["rel_err"]) < 1.5


def test_hits_normalization_and_roles(spark, sf_small):
    """Max-normalization fixes max(hub)=max(authority)=1; all scores in
    [0,1]; a node with no out-edges must have hub 0 and no in-edges
    authority 0 (checked against the distinct edge list)."""
    from kafka_stream_processing_spark.operators import graph as g

    out = g.graph_hits_hubs_authorities(spark, sf_small).toPandas()
    assert abs(out["hub"].max() - 1.0) < 1e-9
    assert abs(out["authority"].max() - 1.0) < 1e-9
    assert ((out["hub"] >= 0) & (out["hub"] <= 1.0 + 1e-12)).all()
    assert (
        (out["authority"] >= 0) & (out["authority"] <= 1.0 + 1e-12)
    ).all()
    edges = g._trade_frac_df(spark, sf_small).select("src", "dst").toPandas()
    srcs, dsts = set(edges["src"]), set(edges["dst"])
    for _, r in out.iterrows():
        if r["nation"] not in srcs:
            assert r["hub"] == 0.0
        if r["nation"] not in dsts:
            assert r["authority"] == 0.0


def test_stream_ams_equals_batch_sketch(spark, sf_small):
    """Linearity pin: the stream-built merged Z sketch must produce the
    IDENTICAL report row as the batch-built sketch (not merely a close
    estimate) — integer-for-integer merge equality."""
    from kafka_stream_processing_spark.operators import corpus as cp
    from kafka_stream_processing_spark.streaming import joins as sj

    batch = cp.sketch_ams_f2_estimate(spark, sf_small).toPandas()
    stream = sj.stream_ams_f2_incremental(spark, sf_small).toPandas()
    assert batch.to_dict("records") == stream.to_dict("records")


def test_theta_forecast_structure(spark, sf_small):
    """Per series: exactly THETA_HORIZON rows; line_forecast advances
    by exactly slope per step; theta_forecast is the exact midpoint of
    line and SES level; OLS slope replayed in pure python to 1e-9."""
    from kafka_stream_processing_spark.operators import windowed as wd

    out = wd.window_theta_forecast_daily(spark, sf_small).toPandas()
    for et, grp in out.groupby("event_type"):
        grp = grp.sort_values("h")
        assert list(grp["h"]) == list(range(1, wd.THETA_HORIZON + 1))
        diffs = grp["line_forecast"].diff().dropna()
        slope = grp["slope"].iloc[0]
        assert (abs(diffs - slope) < 1e-6).all()
        mid = 0.5 * grp["line_forecast"] + 0.5 * grp["ses_level"]
        assert (abs(grp["theta_forecast"] - mid) < 1e-12).all()
    # python OLS replay for one series
    import duckdb

    et = out["event_type"].iloc[0]
    xs = [
        r[0]
        for r in duckdb.connect()
        .execute(
            f"""SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                FROM '{sf_small}/events.parquet'
                WHERE event_type = '{et}'
                GROUP BY CAST(date_trunc('day', ts) AS DATE)
                ORDER BY CAST(date_trunc('day', ts) AS DATE)"""
        )
        .fetchall()
    ]
    n = len(xs)
    si = n * (n + 1) // 2
    sii = sum(i * i for i in range(1, n + 1))
    siy = sum(round(i * x, 6) for i, x in enumerate(xs, 1))
    sy = sum(round(x, 6) for x in xs)
    b = (n * siy - si * sy) / (n * sii - si * si)
    got = out[out["event_type"] == et]["slope"].iloc[0]
    assert abs(b - got) < 1e-9


def test_lyapunov_nn_replay_and_structure(spark, sf_small):
    """Horizon-0 mean log divergence replayed in pure python (embed,
    Chebyshev nearest neighbor beyond the Theiler window, mean ln d
    over d>0) to 1e-9; per-horizon counts bounded by n_points."""
    import math

    import duckdb

    from kafka_stream_processing_spark.operators import windowed as wd

    row = (
        wd.window_lyapunov_rosenstein_daily(spark, sf_small)
        .toPandas()
        .iloc[0]
    )
    xs = [
        r[0]
        for r in duckdb.connect()
        .execute(
            f"""SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                       * 1000000 AS BIGINT)
                FROM '{sf_small}/orders.parquet'
                GROUP BY o_orderdate ORDER BY o_orderdate"""
        )
        .fetchall()
    ]
    pts = [(xs[i], xs[i + 1]) for i in range(len(xs) - 1)]
    n = len(pts)
    terms = []
    for i in range(n):
        best = None
        for j in range(n):
            if abs(i - j) <= wd.LYAP_THEILER:
                continue
            d = max(
                abs(pts[i][0] - pts[j][0]), abs(pts[i][1] - pts[j][1])
            )
            if best is None or (d, j) < best:
                best = (d, j)
        if best and best[0] > 0:
            terms.append(round(math.log(best[0]), 12))
    y0 = sum(terms) / len(terms)
    assert row["n_0"] == len(terms)
    assert abs(row["y_0"] - y0) < 1e-9
    for k in wd.LYAP_HORIZONS:
        assert row[f"n_{k}"] <= n


def test_mcc_youden_confusion_identities(spark, sf_small):
    """tp+fn = n_pos and fp+tn = n_neg on every row; Youden at the
    attached best threshold is the column max; MCC in [-1, 1]; the
    MCC numerator sign agrees with Youden's sign (both measure the
    same association direction)."""
    from kafka_stream_processing_spark.operators import (
        quality_calibration as qc,
    )

    out = qc.quality_mcc_youden_threshold_sweep(spark, sf_small).toPandas()
    n_pos = out["tp"] + out["fn"]
    n_neg = out["fp"] + out["tn"]
    assert n_pos.nunique() == 1 and n_neg.nunique() == 1
    best_score = out["best_youden_score"].iloc[0]
    best_j = out[out["score"] == best_score]["youden_j"].iloc[0]
    assert abs(best_j - out["youden_j"].max()) < 1e-12
    mcc = out["mcc"].dropna()
    assert ((mcc >= -1 - 1e-12) & (mcc <= 1 + 1e-12)).all()
    both = out.dropna(subset=["mcc"])
    num_sign = (
        both["tp"] * both["tn"] - both["fp"] * both["fn"]
    ).apply(lambda v: (v > 0) - (v < 0))
    j_sign = both["youden_j"].apply(
        lambda v: (v > 1e-15) - (v < -1e-15)
    )
    assert ((num_sign == j_sign) | (j_sign == 0) | (num_sign == 0)).all()


def test_pps_systematic_telescopes_to_k(spark, sf_small):
    """Hit counts must sum to EXACTLY PPS_K (every selection point
    lands in exactly one interval — the telescoping identity); each
    doc's hits stay within the PPS multiplicity bound; and the
    distributed prefix sum must agree with a python cumsum replay."""
    import duckdb

    from kafka_stream_processing_spark.operators import pipeline as pl

    out = pl.sample_pps_systematic(spark, sf_small).toPandas()
    assert out["n_hits"].sum() == pl.PPS_K
    rows = duckdb.connect().execute(
        f"""SELECT doc_id, len(string_split(text, ' ')) AS size
            FROM '{sf_small}/documents.parquet' ORDER BY doc_id"""
    ).fetchall()
    t = sum(r[1] for r in rows)
    # python replay of the closed form over the true cumsum
    c = 0
    hits = {}
    for doc_id, size in rows:
        lo = (2 * pl.PPS_K * c + t - 1) // (2 * t)
        hi = (2 * pl.PPS_K * (c + size) + t - 1) // (2 * t)
        if hi - lo >= 1:
            hits[doc_id] = hi - lo
        c += size
    got = dict(zip(out["doc_id"], out["n_hits"]))
    assert got == hits
    # expected_hits is the HT inclusion weight K*size/T
    for _, r in out.iterrows():
        assert abs(r["expected_hits"] - pl.PPS_K * r["size"] / t) < 1e-12


def test_sttr_chunk_accounting(spark, sf_small):
    """Chunk count must equal floor(total_tokens / STTR_CHUNK); chunk
    ids are exactly 0..n_chunks-1 (no gaps — the prefix sum is exact);
    ttr in (0, 1]; sttr equals the mean of the per-chunk ttrs."""
    import duckdb

    from kafka_stream_processing_spark.operators import text as tx

    out = tx.text_sttr_chunked(spark, sf_small).toPandas()
    (t,) = duckdb.connect().execute(
        f"""SELECT SUM(len(string_split(text, ' ')))
            FROM '{sf_small}/documents.parquet'"""
    ).fetchone()
    n_chunks = t // tx.STTR_CHUNK
    assert len(out) == n_chunks
    assert sorted(out["chunk"]) == list(range(n_chunks))
    assert ((out["ttr"] > 0) & (out["ttr"] <= 1)).all()
    assert abs(out["sttr"].iloc[0] - out["ttr"].mean()) < 1e-9


def test_known_item_eval_metric_consistency(spark, sf_small):
    """rr must be 1/first_hit_rank when a partner was found and 0
    otherwise; recall_at_10 in [0,1]; every query is a truth doc."""
    from kafka_stream_processing_spark.operators import retrieval as r
    from kafka_stream_processing_spark.operators.dedup import (
        dedup_ngram_jaccard,
    )

    out = r.retrieval_known_item_recall_eval(spark, sf_small).toPandas()
    truth = dedup_ngram_jaccard(spark, sf_small).toPandas()
    truth_docs = set(truth["doc_a"]) | set(truth["doc_b"])
    # The op enforces KNOWN_ITEM_MAX_QUERIES (smallest doc_ids first) —
    # assert against the bounded sample, not the full truth set, so the
    # test stays valid at scales where truth_docs exceeds the bound
    # (ADVICE r11).
    expected = set(sorted(truth_docs)[: r.KNOWN_ITEM_MAX_QUERIES])
    assert set(out["query_id"]) == expected
    for _, row in out.iterrows():
        assert 0.0 <= row["recall_at_10"] <= 1.0
        if row["first_hit_rank"] == row["first_hit_rank"]:  # not NaN
            assert row["rr"] == 1.0 / row["first_hit_rank"]
            assert row["recall_at_10"] > 0
        else:
            assert row["rr"] == 0.0
