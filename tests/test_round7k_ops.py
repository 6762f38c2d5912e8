"""Round-7 eleventh wave: Markov removal-effect attribution and the
streaming ECE monitor.

The attribution replay rebuilds journeys row-by-row in pure python and
solves the absorbing chain with hand-rolled Gaussian elimination — no
numpy, no DataFrames — so the engine's distributed transition counting
and numpy solve are checked by a genuinely different implementation.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from kafka_stream_processing_spark.registry import all_specs

SPECS = all_specs()

START, CONV, NULL = "__START__", "__CONV__", "__NULL__"


def _journeys(sf_dir: str):
    """(touch_sequence, converted) per (user, day), the docstring's
    convention, built by a per-row python walk."""
    rows = duckdb.connect().execute(
        f"""SELECT user_id, CAST(ts AS DATE), ts, event_id, event_type
        FROM '{sf_dir}/events.parquet'
        ORDER BY user_id, CAST(ts AS DATE), ts, event_id"""
    ).fetchall()
    by_day = defaultdict(list)
    for u, d, ts, eid, et in rows:
        by_day[(u, d)].append((ts, eid, et))
    out = []
    for evs in by_day.values():
        fp = next(
            ((ts, eid) for ts, eid, et in evs if et == "purchase"),
            None,
        )
        touches = [
            et
            for ts, eid, et in evs
            if et != "purchase" and (fp is None or (ts, eid) < fp)
        ]
        out.append((touches, fp is not None))
    return out


def _transition_counts(journeys):
    counts: Counter = Counter()
    for touches, converted in journeys:
        if not touches:
            if converted:
                counts[(START, CONV)] += 1
            continue
        prev = START
        for t in touches:
            counts[(prev, t)] += 1
            prev = t
        counts[(prev, CONV if converted else NULL)] += 1
    return counts


def _solve(a, b):
    """Gaussian elimination with partial pivoting (pure python)."""
    n = len(b)
    m = [row[:] + [b[i]] for i, row in enumerate(a)]
    for col in range(n):
        piv = max(range(col, n), key=lambda r: abs(m[r][col]))
        m[col], m[piv] = m[piv], m[col]
        for r in range(n):
            if r != col and m[r][col] != 0:
                f = m[r][col] / m[col][col]
                for c in range(col, n + 1):
                    m[r][c] -= f * m[col][c]
    return [m[i][n] / m[i][i] for i in range(n)]


def _conv_prob(counts, transient, removed=None):
    idx = {s: i for i, s in enumerate(transient)}
    k = len(transient)
    q = [[0.0] * k for _ in range(k)]
    r = [0.0] * k
    out_tot = Counter()
    for (s, _), n in counts.items():
        out_tot[s] += n
    for (s, t), n in counts.items():
        if s == removed:
            continue
        p = n / out_tot[s]
        tt = NULL if t == removed else t
        if tt == CONV:
            r[idx[s]] += p
        elif tt in idx:
            q[idx[s]][idx[tt]] += p
    a = [
        [(1.0 if i == j else 0.0) - q[i][j] for j in range(k)]
        for i in range(k)
    ]
    return _solve(a, r)[idx[START]]


def test_markov_attribution_pure_python_replay(spark, sf_small):
    journeys = _journeys(sf_small)
    counts = _transition_counts(journeys)
    channels = sorted(
        ({s for s, _ in counts} | {t for _, t in counts})
        - {START, CONV, NULL}
    )
    transient = [START] + channels
    p_full = _conv_prob(counts, transient)
    n_conv = sum(1 for _, c in journeys if c)
    res = {
        c: 1.0 - _conv_prob(counts, transient, removed=c) / p_full
        for c in channels
    }
    tot = sum(res.values())
    rows = SPECS["join_attribution_markov_removal"].fn(
        spark, sf_small
    ).collect()
    got = {r.channel: r for r in rows}
    assert set(got) == set(channels)
    for c in channels:
        r = got[c]
        assert abs(r.removal_effect - res[c]) < 1e-9
        assert abs(r.attribution_share - res[c] / tot) < 1e-9
        assert abs(
            r.attributed_conversions - n_conv * res[c] / tot
        ) < 1e-6
        assert abs(r.p_conversion - p_full) < 1e-9
        assert r.n_conversions == n_conv
    # shares partition the credit; attributed mass = total conversions
    assert abs(sum(r.attribution_share for r in rows) - 1.0) < 1e-9
    assert (
        abs(sum(r.attributed_conversions for r in rows) - n_conv)
        < 1e-6
    )


def test_markov_oracle_channel_literal_matches_data():
    """ADVICE r13: the generated markov oracle hard-codes
    MARKOV_ORACLE_CHANNELS while the engine derives channels from the
    data.  If testdata ever adds/removes a non-purchase event type the
    differential would fail with an opaque row-count or 0/0-NULL
    mismatch — this assertion fails FIRST with a clear message.  Checks
    both driver SFs (the differential runs at both)."""
    from kafka_stream_processing_spark.operators.relational import (
        MARKOV_ORACLE_CHANNELS,
    )

    con = duckdb.connect()
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        derived = tuple(
            r[0]
            for r in con.execute(
                f"""SELECT DISTINCT event_type
                    FROM '{sf_dir}/events.parquet'
                    WHERE event_type <> 'purchase' ORDER BY 1"""
            ).fetchall()
        )
        assert derived == MARKOV_ORACLE_CHANNELS, (
            f"{sf_dir}: testdata channel set {derived} no longer matches "
            f"the oracle literal MARKOV_ORACLE_CHANNELS="
            f"{MARKOV_ORACLE_CHANNELS} — regenerate the literal in "
            "operators/relational.py before trusting the markov "
            "differential (its failure mode is an opaque hash/NULL "
            "mismatch, not this clear message)."
        )


def test_markov_attribution_removal_effects_positive(spark, sf_small):
    """Every channel that appears on some converting path must have a
    strictly positive removal effect (cutting it can only lose
    conversions), and p_conversion must equal the empirical journey
    conversion rate reachable from START under the MLE chain when all
    journeys start at START (sanity bracket: 0 < p < 1)."""
    rows = SPECS["join_attribution_markov_removal"].fn(
        spark, sf_small
    ).collect()
    for r in rows:
        assert 0.0 < r.removal_effect < 1.0
        assert 0.0 < r.p_conversion < 1.0


def test_stream_ece_monitor_first_chunk_replay(spark, sf_small):
    """Replay chunk 0's ECE in python: train rates from non-src0,
    chunk = first ceil(n/3) src0 docs by doc_id."""
    con = duckdb.connect()
    docs = con.execute(
        f"""SELECT doc_id, source, n_chars, text
        FROM '{sf_small}/documents.parquet' ORDER BY doc_id"""
    ).fetchall()
    train_bins = defaultdict(lambda: [0, 0])
    test_docs = []
    for doc_id, src, n_chars, text in docs:
        b = n_chars // 25
        y = 1 if len(text.split(" ")) > 40 else 0
        if src == "src0":
            test_docs.append((doc_id, b, y))
        else:
            train_bins[b][0] += 1
            train_bins[b][1] += y
    step = (len(test_docs) + 2) // 3
    chunk0 = test_docs[:step]
    cells = defaultdict(lambda: [0, 0])
    for _, b, y in chunk0:
        cells[b][0] += 1
        cells[b][1] += y
    num, den, mce = 0.0, 0, 0.0
    n_bins = 0
    for b, (n, y) in cells.items():
        if b not in train_bins:
            continue
        n_bins += 1
        f_pred = train_bins[b][1] / train_bins[b][0]
        gap = abs(f_pred - y / n)
        num += n * gap
        den += n
        mce = max(mce, gap)
    rows = SPECS["stream_ece_monitor"].fn(spark, sf_small).collect()
    assert len(rows) == 3
    first = min(rows, key=lambda r: r.chunk_min_doc_id)
    assert first.chunk_min_doc_id == chunk0[0][0]
    assert first.n_scored == den
    assert first.n_bins == n_bins
    assert abs(first.ece - num / den) < 1e-9
    assert abs(first.mce - mce) < 1e-12


# ---------------------------------------------------------------------------
# Batch E: Cochran-Armitage, McNemar, threshold sweep
# ---------------------------------------------------------------------------


def test_cochran_armitage_float_replay(spark, sf_small):
    """z from the textbook float form (p-bar, per-bin deviations)
    instead of the engine's integer-moment form."""
    rows = duckdb.connect().execute(
        f"""SELECT n_chars // 100, count(*),
        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        FROM '{sf_small}/documents.parquet' GROUP BY 1"""
    ).fetchall()
    n_tot = sum(n for _, n, _ in rows)
    r_tot = sum(r for _, _, r in rows)
    pbar = r_tot / n_tot
    t = sum(w * (r - n * pbar) for w, n, r in rows)
    sw = sum(w * n for w, n, _ in rows)
    sw2 = sum(w * w * n for w, n, _ in rows)
    var = pbar * (1 - pbar) * (sw2 - sw * sw / n_tot)
    z_ref = t / math.sqrt(var)
    row = SPECS["quality_cochran_armitage_trend"].fn(
        spark, sf_small
    ).collect()[0]
    assert row.n == n_tot
    assert row.n_positive == r_tot
    assert row.n_bins == len(rows)
    assert abs(row.z - z_ref) < 1e-9
    assert row.trend_005 == (abs(row.z) > 1.959963984540054)


def test_mcnemar_cells_replay(spark, sf_small):
    """Contingency cells from the registered langid predictions (the
    op's declared input), statistic from the textbook formula."""
    preds = SPECS["text_language_id"].fn(spark, sf_small).collect()
    b = sum(
        1
        for p in preds
        if p.predicted_lang == p.labeled_lang and p.labeled_lang != "en"
    )
    c = sum(
        1
        for p in preds
        if p.predicted_lang != p.labeled_lang and p.labeled_lang == "en"
    )
    row = SPECS["text_mcnemar_langid_vs_majority"].fn(
        spark, sf_small
    ).collect()[0]
    assert (row.only_a, row.only_b) == (b, c)
    assert (
        row.both_right + row.only_a + row.only_b + row.both_wrong
        == len(preds)
    )
    if b + c:
        chi2 = (abs(b - c) - 1) ** 2 / (b + c)
        assert abs(row.mcnemar_chi2 - chi2) < 1e-12
        assert row.differs_005 == (chi2 > 3.841)


def test_threshold_sweep_monotone_and_consistent(spark, sf_small):
    """Counts must be non-increasing in the threshold, and the 0.4 row
    must agree with dedup_embedding_cosine_allpairs (threshold 0.4)."""
    rows = sorted(
        SPECS["dedup_threshold_sweep_cosine"].fn(
            spark, sf_small
        ).collect(),
        key=lambda r: r.threshold,
    )
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_with_dup >= b.n_docs_with_dup
    allpairs = SPECS["dedup_embedding_cosine_allpairs"].fn(
        spark, sf_small
    ).collect()
    at04 = next(r for r in rows if abs(r.threshold - 0.4) < 1e-12)
    assert at04.n_pairs == len(allpairs)
    docs = {v for r in allpairs for v in (r.vec_a, r.vec_b)}
    assert at04.n_docs_with_dup == len(docs)


# ---------------------------------------------------------------------------
# Batch F: ANOVA F, streaming quantile monitor
# ---------------------------------------------------------------------------


def test_anova_f_statistics_replay(spark, sf_small):
    """F from the textbook mean-deviation form (per-group means,
    squared deviations row by row) vs the engine's power-sum form."""
    rows = duckdb.connect().execute(
        f"SELECT source, n_chars FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    by_src = defaultdict(list)
    for s, v in rows:
        by_src[s].append(v)
    all_v = [v for vs in by_src.values() for v in vs]
    mu = sum(all_v) / len(all_v)
    ssb = sum(
        len(vs) * (sum(vs) / len(vs) - mu) ** 2
        for vs in by_src.values()
    )
    ssw = sum(
        (v - sum(vs) / len(vs)) ** 2
        for vs in by_src.values()
        for v in vs
    )
    k, n = len(by_src), len(all_v)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    row = SPECS["quality_anova_f_drift"].fn(spark, sf_small).collect()[0]
    assert (row.n, row.k) == (n, k)
    assert (row.dof_between, row.dof_within) == (k - 1, n - k)
    assert abs(row.ssb - ssb) / ssb < 1e-9
    assert abs(row.ssw - ssw) / ssw < 1e-9
    assert abs(row.f_stat - f_ref) / f_ref < 1e-9
    assert abs(row.chi2_approx - (k - 1) * f_ref) / f_ref < 1e-8
    assert row.drift == (row.chi2_approx > row.critical_005)
    # eta^2 decomposition identity: SSB + SSW == total SS
    sst = sum((v - mu) ** 2 for v in all_v)
    assert abs((row.ssb + row.ssw) - sst) / sst < 1e-9


def test_stream_quantile_monitor_sort_replay(spark, sf_small):
    """p50/p90/p99 per chunk from a plain python sort of the raw
    chunk values (order-statistic definition), vs the engine's
    histogram/cumulative form."""
    docs = duckdb.connect().execute(
        f"""SELECT doc_id, n_chars FROM '{sf_small}/documents.parquet'
        WHERE source <> 'src0' ORDER BY doc_id"""
    ).fetchall()
    step = (len(docs) + 2) // 3
    rows = SPECS["stream_quantile_monitor"].fn(spark, sf_small).collect()
    assert len(rows) == 3
    got = {r.chunk_min_doc_id: r for r in rows}
    for ci in range(3):
        chunk = docs[ci * step : (ci + 1) * step]
        if not chunk:
            continue
        vals = sorted(v for _, v in chunk)
        r = got[chunk[0][0]]
        assert r.n_batch == len(vals)
        for q, col in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            assert col == vals[math.ceil(q * len(vals)) - 1]


# ---------------------------------------------------------------------------
# Batch G: l-diversity, temperature sweep
# ---------------------------------------------------------------------------


def test_l_diversity_python_replay(spark, sf_small):
    rows = duckdb.connect().execute(
        f"""SELECT lang, n_chars // 100, source, count(*)
        FROM '{sf_small}/documents.parquet' GROUP BY 1, 2, 3"""
    ).fetchall()
    groups = defaultdict(lambda: defaultdict(int))
    for lang, lb, src, c in rows:
        groups[(lang, lb)][src] += c
    bands = defaultdict(lambda: [0, 0, 10**9, 0])
    for srcs in groups.values():
        k = sum(srcs.values())
        l = len(srcs)
        h = math.log(k) - sum(c * math.log(c) for c in srcs.values()) / k
        band = "l=1 leak" if l == 1 else ("l=2" if l == 2 else "l>=3")
        b = bands[band]
        b[0] += 1
        b[1] += k
        b[2] = min(b[2], l)
        if h < math.log(2):
            b[3] += 1
    got = {
        r.band: r
        for r in SPECS["quality_l_diversity_audit"]
        .fn(spark, sf_small)
        .collect()
    }
    assert set(got) == set(bands)
    for band, (ng, nr, ml, ne) in bands.items():
        r = got[band]
        assert (r.n_groups, r.n_rows, r.min_l) == (ng, nr, ml)
        assert r.n_entropy_below_l2 == ne
    # entropy-l can never exceed distinct-l: every l=1 group must fail
    if "l=1 leak" in got:
        assert (
            got["l=1 leak"].n_entropy_below_l2
            == got["l=1 leak"].n_groups
        )


def test_temperature_sweep_flattening_monotone(spark, sf_small):
    """Lower tau must flatten the mixture: max_share non-increasing,
    effective cells non-decreasing as tau drops; tau=1 row must equal
    the raw proportional mixture computed in python."""
    rows = duckdb.connect().execute(
        f"""SELECT source, lang, count(*)
        FROM '{sf_small}/documents.parquet' GROUP BY 1, 2"""
    ).fetchall()
    n_tot = sum(c for _, _, c in rows)
    shares = [c / n_tot for _, _, c in rows]
    out = sorted(
        SPECS["sample_temperature_sweep"].fn(spark, sf_small).collect(),
        key=lambda r: -r.tau,
    )
    assert [r.tau for r in out] == [1.0, 0.5, 0.25]
    assert all(r.n_cells == len(rows) for r in out)
    assert abs(out[0].max_share - max(shares)) < 1e-9
    assert abs(
        out[0].eff_cells_inv_simpson - 1 / sum(s * s for s in shares)
    ) < 1e-6
    for hi, lo in zip(out, out[1:]):
        assert lo.max_share <= hi.max_share + 1e-12
        assert lo.eff_cells_inv_simpson >= hi.eff_cells_inv_simpson - 1e-9
        assert lo.eff_cells_inv_simpson <= lo.n_cells + 1e-9


# ---------------------------------------------------------------------------
# Batch I: filter interaction matrix + streaming yield monitor
# ---------------------------------------------------------------------------


def _gopher_flags(text: str) -> tuple[bool, bool, bool, bool]:
    toks = text.split(" ")
    n_words = len(toks)
    total_chars = sum(len(w) for w in toks)
    n_top = max(toks.count(w) for w in set(toks)) if toks else 0
    n_stop = sum(
        1 for t in toks if t in ("the", "a", "of", "and", "to", "in")
    )
    return (
        n_words >= 30,
        3 * n_words <= total_chars <= 8 * n_words,
        n_top * 8 <= n_words,
        n_stop >= 1,
    )


def test_filter_interaction_matrix_replay(spark, sf_small):
    docs = duckdb.connect().execute(
        f"SELECT text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    combos = Counter(_gopher_flags(t) for (t,) in docs)
    rows = SPECS["quality_filter_interaction_matrix"].fn(
        spark, sf_small
    ).collect()
    got = {
        (r.ok_minlen, r.ok_meanlen, r.ok_repetition, r.ok_stopword): r
        for r in rows
    }
    assert got.keys() == combos.keys()
    n_tot = len(docs)
    for combo, n in combos.items():
        r = got[combo]
        assert r.n_docs == n
        assert abs(r.share - n / n_tot) < 1e-12
        assert r.solely_blocked == (sum(combo) == 3)
    # consistency with the marginal audit: all-true row == sum n_keep
    marg = SPECS["quality_gopher_filters"].fn(spark, sf_small).collect()
    keep_total = sum(r.n_keep for r in marg)
    all_true = got.get((True, True, True, True))
    assert (all_true.n_docs if all_true else 0) == keep_total


def test_stream_filter_yield_chunks_sum_to_batch(spark, sf_small):
    """The three chunk keep-counts must partition the batch keep count
    computed by the interaction matrix's all-true cell over the
    training pool."""
    docs = duckdb.connect().execute(
        f"""SELECT doc_id, text FROM '{sf_small}/documents.parquet'
        WHERE source <> 'src0' ORDER BY doc_id"""
    ).fetchall()
    keeps = [all(_gopher_flags(t)) for _, t in docs]
    step = (len(docs) + 2) // 3
    rows = sorted(
        SPECS["stream_filter_yield_monitor"].fn(
            spark, sf_small
        ).collect(),
        key=lambda r: r.chunk_min_doc_id,
    )
    assert len(rows) == 3
    for ci, r in enumerate(rows):
        chunk = keeps[ci * step : (ci + 1) * step]
        assert r.chunk_min_doc_id == docs[ci * step][0]
        assert r.n_batch == len(chunk)
        assert r.n_keep == sum(chunk)
        assert abs(r.keep_rate - sum(chunk) / len(chunk)) < 1e-12


# ---------------------------------------------------------------------------
# Batch K: streaming SCD2 incremental maintenance
# ---------------------------------------------------------------------------


def test_stream_scd2_equals_batch_history(spark, sf_small):
    """The incremental maintenance contract: replaying the stream must
    reconstruct EXACTLY the batch-derived SCD2 history (same oracle,
    same rows), with exactly one open row per user and contiguous
    [valid_from, valid_to) intervals."""
    stream_rows = SPECS["stream_scd2_incremental"].fn(
        spark, sf_small
    ).collect()
    batch_rows = SPECS["scd2_user_type_history"].fn(
        spark, sf_small
    ).collect()
    key = lambda r: (  # noqa: E731
        r.user_id,
        r.valid_from_us,
        r.event_type,
        r.valid_to_us,
        r.n_events,
    )
    assert sorted(map(key, stream_rows)) == sorted(map(key, batch_rows))
    by_user = defaultdict(list)
    for r in stream_rows:
        by_user[r.user_id].append(r)
    for u, rows in by_user.items():
        opens = [r for r in rows if r.valid_to_us is None]
        assert len(opens) == 1
        ordered = sorted(rows, key=lambda r: r.valid_from_us)
        for a, b in zip(ordered, ordered[1:]):
            assert a.valid_to_us == b.valid_from_us
        assert ordered[-1].valid_to_us is None


# ---------------------------------------------------------------------------
# Batch L: widest path, source vocab overlap
# ---------------------------------------------------------------------------


def test_widest_path_dijkstra_replay(spark, sf_small):
    """Max-bottleneck distances via a python Dijkstra-style best-first
    search (a different ALGORITHM from the engine's fixed-round
    relaxation) over the same sparsified weighted adjacency."""
    import heapq

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_small}/{t}.parquet'")
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
    und: dict[tuple[str, str], int] = {}
    for s, d, w in edges:
        if w * ne >= 2 * tw:
            k = (min(s, d), max(s, d))
            und[k] = und.get(k, 0) + w
    adj: dict[str, list[tuple[str, int]]] = {}
    for (a, b), w in und.items():
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    src = min(adj)
    cap = sum(und.values()) + 1
    best = {src: cap}
    heap = [(-cap, src)]
    while heap:
        negw, u = heapq.heappop(heap)
        if -negw < best.get(u, 0):
            continue
        for v, w in adj.get(u, []):
            cand = min(-negw, w)
            if cand > best.get(v, 0):
                best[v] = cand
                heapq.heappush(heap, (-cand, v))
    rows = SPECS["graph_widest_path_from_hub"].fn(
        spark, sf_small
    ).collect()
    got = {r.node: r.bottleneck for r in rows}
    expected = {n: w for n, w in best.items() if n != src}
    assert got == expected


def test_source_vocab_overlap_replay(spark, sf_small):
    from collections import Counter, defaultdict

    docs = duckdb.connect().execute(
        f"SELECT source, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    by_src = defaultdict(Counter)
    for s, t in docs:
        by_src[s].update(t.split(" "))
    tops = {
        s: {
            w
            for w, _ in sorted(
                cnt.items(), key=lambda kv: (-kv[1], kv[0])
            )[:50]
        }
        for s, cnt in by_src.items()
    }
    rows = SPECS["text_source_vocab_overlap"].fn(
        spark, sf_small
    ).collect()
    srcs = sorted(tops)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        inter = len(tops[r.source_a] & tops[r.source_b])
        union = len(tops[r.source_a] | tops[r.source_b])
        assert r.n_common == inter
        assert abs(r.jaccard - inter / union) < 1e-12


def test_ab_mde_textbook_replay(spark, sf_small):
    """MDE from the textbook formula over cells recomputed in python;
    consistency: an observed |p_a - p_b| below the MDE must not be
    flagged significant by the z-test op at ~the same alpha (the
    power relationship, checked directionally)."""
    rows = duckdb.connect().execute(
        f"""SELECT user_id % 2,
        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END),
        count(*) FROM '{sf_small}/events.parquet' GROUP BY 1"""
    ).fetchall()
    cells = {int(v): (int(c), int(n)) for v, c, n in rows}
    (ca, na), (cb, nb) = cells[0], cells[1]
    p = (ca + cb) / (na + nb)
    mde = (1.959963984540054 + 0.8416212335729143) * math.sqrt(
        p * (1 - p) * (1 / na + 1 / nb)
    )
    r = SPECS["quality_ab_minimum_detectable_effect"].fn(
        spark, sf_small
    ).collect()[0]
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.p_pool - p) < 1e-12
    assert abs(r.mde_abs - mde) < 1e-12
    assert abs(r.mde_rel - mde / p) < 1e-12
    z = SPECS["quality_two_proportion_ztest"].fn(
        spark, sf_small
    ).collect()[0]
    # directional power check: an observed gap well under the MDE
    # cannot be a significant z-test result
    if abs(z.p_a - z.p_b) < 0.5 * r.mde_abs:
        assert not z.significant_005


def test_bottomk_sketch_replay_and_mergeability(spark, sf_small):
    """KMV replay in python (md5 order statistics) + the merge law:
    bottom-k of the union of per-day bottom-k sets == global
    bottom-k — the property that makes the sketch incremental."""
    import hashlib

    rows = duckdb.connect().execute(
        f"""SELECT DISTINCT user_id, CAST(ts AS DATE)
        FROM '{sf_small}/events.parquet'"""
    ).fetchall()
    def h64(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    users = {u for u, _ in rows}
    hashes = sorted({h64(u) for u in users})
    k = 64
    r = SPECS["sketch_bottomk_distinct"].fn(spark, sf_small).collect()[0]
    assert r.n_exact == len(hashes)
    assert r.k == k
    if len(hashes) >= k:
        hk = hashes[k - 1]
        assert r.sketch_full and r.h_k == hk
        est = (k - 1.0) * (16**15) / hk
        assert abs(r.est_distinct - est) < 1e-6
    else:
        assert not r.sketch_full and r.h_k is None
        assert r.est_distinct == len(hashes)
        assert r.rel_err == 0.0
    # mergeability on per-day sketches
    from collections import defaultdict

    per_day = defaultdict(set)
    for u, d in rows:
        per_day[d].add(h64(u))
    merged = set()
    for hs in per_day.values():
        merged |= set(sorted(hs)[:k])
    assert sorted(merged)[:k] == hashes[:k]


def test_bottomk_jaccard_replay(spark, sf_small):
    import hashlib

    rows = duckdb.connect().execute(
        f"""SELECT user_id, event_type
        FROM '{sf_small}/events.parquet'
        WHERE event_type IN ('click', 'purchase')"""
    ).fetchall()
    a = {u for u, t in rows if t == "click"}
    b = {u for u, t in rows if t == "purchase"}
    def h64(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    union = a | b
    hashes = sorted((h64(u), u) for u in union)
    k = 64
    sketch = hashes[:k]
    n_both = sum(1 for _, u in sketch if u in a and u in b)
    r = SPECS["sketch_bottomk_jaccard"].fn(spark, sf_small).collect()[0]
    assert r.k == k
    assert r.k_used == min(k, len(union))
    assert r.n_both_sketch == n_both
    j_exact = len(a & b) / len(union)
    assert abs(r.jaccard_exact - j_exact) < 1e-12
    assert abs(r.jaccard_est - n_both / r.k_used) < 1e-12
    assert abs(r.abs_err - abs(r.jaccard_est - j_exact)) < 1e-12


def test_stream_bottomk_converges_to_batch_sketch(spark, sf_small):
    """The final trigger's sketch must equal the batch op's sketch
    (same h_k / estimate over the full stream), and estimates must be
    emitted for every chunk with non-decreasing prefix counts."""
    stream_rows = sorted(
        SPECS["stream_bottomk_maintenance"].fn(
            spark, sf_small
        ).collect(),
        key=lambda r: r.chunk_min_event_id,
    )
    assert len(stream_rows) == 3
    prefixes = [r.n_exact_prefix for r in stream_rows]
    assert prefixes == sorted(prefixes)
    final = stream_rows[-1]
    batch = SPECS["sketch_bottomk_distinct"].fn(
        spark, sf_small
    ).collect()[0]
    # the event stream covers ALL events, so the final prefix is the
    # whole user population — sketch state must agree with batch
    assert final.n_exact_prefix == batch.n_exact
    assert final.h_k == batch.h_k
    assert abs(final.est_distinct - batch.est_distinct) < 1e-9


def test_bartlett_textbook_replay(spark, sf_small):
    import statistics

    by_src = defaultdict(list)
    for s, v in duckdb.connect().execute(
        f"SELECT source, n_chars FROM '{sf_small}/documents.parquet'"
    ).fetchall():
        by_src[s].append(v)
    groups = {s: v for s, v in by_src.items() if len(v) >= 2}
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    sp2 = sum(
        (len(v) - 1) * statistics.variance(v) for v in groups.values()
    ) / (n - k)
    num = (n - k) * math.log(sp2) - sum(
        (len(v) - 1) * math.log(statistics.variance(v))
        for v in groups.values()
    )
    c = 1 + (
        sum(1 / (len(v) - 1) for v in groups.values()) - 1 / (n - k)
    ) / (3 * (k - 1))
    k2_ref = num / c
    row = SPECS["quality_bartlett_homoscedasticity"].fn(
        spark, sf_small
    ).collect()[0]
    assert (row.k, row.n_total, row.dof) == (k, n, k - 1)
    assert abs(row.k2 - k2_ref) / abs(k2_ref) < 1e-6
    assert row.heteroscedastic == (row.k2 > row.critical_005)


def test_apriori_equals_bruteforce_and_closure(spark, sf_small):
    """Brute-force python triple counting must equal the level-wise
    output, and downward closure must hold: every frequent triple's
    sub-pairs are themselves frequent at the same support."""
    rows = duckdb.connect().execute(
        f"""SELECT DISTINCT user_id, CAST(ts AS DATE), event_type
        FROM '{sf_small}/events.parquet'"""
    ).fetchall()
    baskets = defaultdict(set)
    for u, d, t in rows:
        baskets[(u, d)].add(t)
    n = len(baskets)
    from itertools import combinations

    tri = Counter()
    pair = Counter()
    for items in baskets.values():
        for c3 in combinations(sorted(items), 3):
            tri[c3] += 1
        for c2 in combinations(sorted(items), 2):
            pair[c2] += 1
    freq_tri = {t: c for t, c in tri.items() if c * 20 >= n}
    got = {
        (r.item_a, r.item_b, r.item_c): r
        for r in SPECS["agg_apriori_frequent_triples"]
        .fn(spark, sf_small)
        .collect()
    }
    assert got.keys() == freq_tri.keys()
    for t3, c in freq_tri.items():
        r = got[t3]
        assert r.support_count == c
        assert abs(r.support_frac - c / n) < 1e-12
        a, b, c3 = t3
        for sub in ((a, b), (a, c3), (b, c3)):
            assert pair[sub] * 20 >= n  # downward closure


def test_stream_l_diversity_chunk_replay(spark, sf_small):
    docs = duckdb.connect().execute(
        f"""SELECT doc_id, lang, source, n_chars
        FROM '{sf_small}/documents.parquet'
        WHERE source <> 'src0' ORDER BY doc_id"""
    ).fetchall()
    step = (len(docs) + 2) // 3
    rows = sorted(
        SPECS["stream_l_diversity_monitor"].fn(
            spark, sf_small
        ).collect(),
        key=lambda r: r.chunk_min_doc_id,
    )
    assert len(rows) == 3
    for ci, r in enumerate(rows):
        chunk = docs[ci * step : (ci + 1) * step]
        groups = defaultdict(set)
        sizes = Counter()
        for _, lang, src, n_chars in chunk:
            qi = (lang, n_chars // 100)
            groups[qi].add(src)
            sizes[qi] += 1
        leaks = [qi for qi, s in groups.items() if len(s) == 1]
        assert r.chunk_min_doc_id == chunk[0][0]
        assert r.n_batch == len(chunk)
        assert r.n_groups == len(groups)
        assert r.min_l == min(len(s) for s in groups.values())
        assert r.n_leak_groups == len(leaks)
        assert r.n_leak_rows == sum(sizes[qi] for qi in leaks)
        assert abs(
            r.leak_row_rate - r.n_leak_rows / r.n_batch
        ) < 1e-12
