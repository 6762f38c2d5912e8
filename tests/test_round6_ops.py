"""Round-6 operator tests: watermark late-data semantics, Matryoshka
truncation sweep, TextRank keywords, Poisson bootstrap CI, 4-gram KN.
Each operator also runs under the driver-identical oracle differential
in test_oracle_parity.py; these tests pin the SEMANTIC properties the
hash comparison alone doesn't articulate (and pure-Python references
where an independent formulation is cheap).
"""

from __future__ import annotations

import duckdb
import numpy as np

from kafka_stream_processing_spark import registry
from kafka_stream_processing_spark.operators.quality_calibration import BOOT_B
from kafka_stream_processing_spark.operators.quality_lm import (
    KN_DISCOUNT,
    LM_BOS,
)
from kafka_stream_processing_spark.operators.similarity import (
    MATRYOSHKA_DEPTHS,
    N_QUERIES,
    RECALL_TOPK,
)

SPECS = registry.all_specs()


# ------------------------------------------------ watermark late data


def test_watermark_drops_the_injected_late_slice(spark, sf_small):
    """The late-injected rows must be MISSING from the emitted counts:
    summing the streamed per-minute counts gives exactly (on-time rows
    within finalized windows), strictly fewer than a naive count that
    believed every row — i.e. lateness genuinely mattered, the stream
    didn't just reorder."""
    rows = SPECS["stream_watermark_late_data"].fn(spark, sf_small).collect()
    got_total = sum(r.n_events for r in rows)
    con = duckdb.connect()
    src = f"'{sf_small}/events.parquet'"
    (naive_total,) = con.execute(
        f"""
        WITH wm AS (SELECT max(ts) - INTERVAL 5 SECOND AS w FROM {src})
        SELECT count(*) FROM {src}, wm
        WHERE date_trunc('minute', ts) + INTERVAL 1 MINUTE <= wm.w
        """
    ).fetchone()
    (n_late,) = con.execute(
        f"""
        WITH b AS (
            SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
            FROM {src}
        )
        SELECT count(*) FROM {src}, b
        WHERE epoch_us(ts) < b.mn + (b.mx - b.mn) // 6
          AND event_id % 7 = 0
        """
    ).fetchone()
    assert n_late > 0  # the injection is real on this data shape
    # every late row's window closed long before the final watermark,
    # so each one the stream dropped is one row the naive count keeps.
    assert got_total == naive_total - n_late


# --------------------------------------------------- Matryoshka sweep


def test_matryoshka_full_depth_is_identity_and_cells_complete(
    spark, sf_small
):
    rows = SPECS["similarity_matryoshka_recall_eval"].fn(
        spark, sf_small
    ).collect()
    cells = {(r.depth, r.query_id): r for r in rows}
    assert set(cells) == {
        (d, q) for d in MATRYOSHKA_DEPTHS for q in range(N_QUERIES)
    }
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
        assert r.hits == round(r.recall * RECALL_TOPK)
        if r.depth == MATRYOSHKA_DEPTHS[-1]:
            assert r.recall == 1.0, r.query_id


def test_matryoshka_prefix_matches_numpy_bruteforce(spark, sf_small):
    """Independent numpy check at one truncation depth (16): top-10 by
    prefix cosine (float64) has the same overlap with full-width top-10
    as the operator reports.  Cosine ties are broken by neighbor_id in
    the operator; numpy argsort mirrors with a lexicographic key."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_small}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)

    def topk(depth: int, q_row: int) -> set[int]:
        pre = mat[:, :depth]
        qv = pre[q_row]
        cos = (pre @ qv) / (
            np.linalg.norm(pre, axis=1) * np.linalg.norm(qv)
        )
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[q_row]),
            key=lambda i: (-cos[i], ids[i]),
        )
        return {int(ids[i]) for i in order[:RECALL_TOPK]}

    got = {
        (r.depth, r.query_id): r.hits
        for r in SPECS["similarity_matryoshka_recall_eval"]
        .fn(spark, sf_small)
        .collect()
    }
    for q in range(N_QUERIES):
        q_row = int(np.where(ids == q)[0][0])
        want = len(topk(16, q_row) & topk(64, q_row))
        # exact decimal cosine vs float64 cosine can flip hair-thin
        # ties; allow 1 of 10 to differ, which still pins the curve.
        assert abs(got[(16, q)] - want) <= 1, q


# ------------------------------------------------------- TextRank


def test_textrank_matches_python_power_iteration(spark, sf_small):
    """Pure-Python re-implementation (co-occurrence window 2, damping
    0.85, 8 iterations, per-iteration round-to-decimal quantization)
    reproduces every returned (rank, word, score) row."""
    from kafka_stream_processing_spark.operators.graph import (
        _TR_DAMPING,
        _TR_ITERATIONS,
        _TR_TELEPORT,
        _TR_TOPK,
        _TR_WINDOW,
    )

    con = duckdb.connect()
    texts = [
        t
        for (t,) in con.execute(
            f"SELECT text FROM '{sf_small}/documents.parquet'"
        ).fetchall()
    ]
    edges: dict[tuple[str, str], int] = {}
    nodes: set[str] = set()
    for text in texts:
        t = text.split(" ")
        nodes.update(t)
        for i, a in enumerate(t):
            for k in range(1, _TR_WINDOW + 1):
                if i + k < len(t):
                    b = t[i + k]
                    if a != b:
                        edges[(a, b)] = edges.get((a, b), 0) + 1
                        edges[(b, a)] = edges.get((b, a), 0) + 1
    outw: dict[str, int] = {}
    for (s, _), w in edges.items():
        outw[s] = outw.get(s, 0) + w
    frac = {(s, d): w / outw[s] for (s, d), w in edges.items()}
    r = {n: 1.0 for n in nodes}
    for _ in range(_TR_ITERATIONS):
        acc: dict[str, float] = {}
        for (s, d), f in frac.items():
            # mirror the DECIMAL(18,12) per-term quantization
            acc[d] = acc.get(d, 0.0) + round(r[s] * f, 12)
        r = {
            n: _TR_TELEPORT + _TR_DAMPING * round(acc.get(n, 0.0), 12)
            for n in nodes
        }
    want = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:_TR_TOPK]
    got = sorted(
        SPECS["text_keyword_textrank"].fn(spark, sf_small).collect(),
        key=lambda row: row.rank,
    )
    assert len(got) == min(_TR_TOPK, len(nodes))
    for row, (word, score) in zip(got, want):
        assert row.word == word
        assert abs(row.score - round(score, 9)) < 1e-9, word


# ------------------------------------------------------ bootstrap CI


def test_bootstrap_ci_brackets_and_python_reference(spark, sf_small):
    """The interval must bracket the bootstrap mean, the replicate count
    is exactly B, and a pure-Python replay of the md5-uniform Poisson
    weights reproduces point/boot means exactly."""
    import hashlib

    row = SPECS["quality_bootstrap_mean_ci"].fn(spark, sf_small).collect()
    assert len(row) == 1
    row = row[0]
    assert row.ci_lo <= row.boot_mean <= row.ci_hi
    assert row.boot_se > 0
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, n_chars FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    assert row.n_docs == len(docs)
    assert abs(
        row.point_mean - sum(c for _, c in docs) / len(docs)
    ) < 1e-12

    from kafka_stream_processing_spark.operators.quality_calibration import (
        BOOT_POISSON_CDF,
        _BOOT_SCALE,
    )

    def weight(doc_id: int, b: int) -> int:
        h = int(
            hashlib.md5(f"{doc_id}_boot_{b}".encode()).hexdigest()[:15], 16
        )
        u = h / _BOOT_SCALE
        for k, t in enumerate(BOOT_POISSON_CDF):
            if u < t:
                return k
        return 7

    from decimal import ROUND_HALF_UP, Decimal

    means = []
    for b in range(BOOT_B):
        s = n = 0
        for doc_id, c in docs:
            w = weight(doc_id, b)
            s += w * c
            n += w
        # Spark's F.round is HALF_UP; Python's round() is half-to-even
        means.append(
            float(
                Decimal(repr(s / n)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
        )
    assert abs(row.boot_mean - sum(means) / BOOT_B) < 1e-9
    ordered = sorted(means)
    assert row.ci_lo == ordered[1]  # rank 2 of 64
    assert row.ci_hi == ordered[62]  # rank 63 of 64


# ------------------------------------------------------- 4-gram KN


def test_fourgram_kneser_ney_matches_python_reference(spark, sf_small):
    """Three-level KN recursion recomputed independently in Python (raw
    4-gram counts at the top, continuation counts below, triple BOS)
    matches the operator for every document."""
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    c4: dict[tuple[str, str, str, str], int] = {}
    for _, text in docs:
        t = [LM_BOS, LM_BOS, LM_BOS] + text.split(" ")
        for q in zip(t, t[1:], t[2:], t[3:]):
            c4[q] = c4.get(q, 0) + 1
    t4: dict[tuple, int] = {}
    n14: dict[tuple, int] = {}
    lefts3: dict[tuple, set] = {}
    for (w1, w2, w3, w4), c in c4.items():
        t4[(w1, w2, w3)] = t4.get((w1, w2, w3), 0) + c
        n14[(w1, w2, w3)] = n14.get((w1, w2, w3), 0) + 1
        lefts3.setdefault((w2, w3, w4), set()).add(w1)
    c3k = {k: len(v) for k, v in lefts3.items()}
    t3: dict[tuple, int] = {}
    n13: dict[tuple, int] = {}
    c2k: dict[tuple, int] = {}
    for (w2, w3, w4), c in c3k.items():
        t3[(w2, w3)] = t3.get((w2, w3), 0) + c
        n13[(w2, w3)] = n13.get((w2, w3), 0) + 1
        c2k[(w3, w4)] = c2k.get((w3, w4), 0) + 1
    t2: dict[str, int] = {}
    n12: dict[str, int] = {}
    c1k: dict[str, int] = {}
    for (w3, w4), c in c2k.items():
        t2[w3] = t2.get(w3, 0) + c
        n12[w3] = n12.get(w3, 0) + 1
        c1k[w4] = c1k.get(w4, 0) + 1
    tot1 = sum(c1k.values())
    D = KN_DISCOUNT

    def surp(w1, w2, w3, w4) -> float:
        p1 = c1k[w4] / tot1
        p2 = ((c2k[(w3, w4)] - D) / t2[w3]) + (
            (D * n12[w3]) / t2[w3]
        ) * p1
        p3 = ((c3k[(w2, w3, w4)] - D) / t3[(w2, w3)]) + (
            (D * n13[(w2, w3)]) / t3[(w2, w3)]
        ) * p2
        p4 = ((c4[(w1, w2, w3, w4)] - D) / t4[(w1, w2, w3)]) + (
            (D * n14[(w1, w2, w3)]) / t4[(w1, w2, w3)]
        ) * p3
        return round(float(-np.log(p4)), 6)

    got = {
        r.doc_id: (r.n_tokens, r.mean_surprisal)
        for r in SPECS["quality_fourgram_kneser_ney"]
        .fn(spark, sf_small)
        .collect()
    }
    assert len(got) == len(docs)
    for doc_id, text in docs:
        t = [LM_BOS, LM_BOS, LM_BOS] + text.split(" ")
        surps = [surp(*q) for q in zip(t, t[1:], t[2:], t[3:])]
        n_tokens, mean = got[doc_id]
        assert n_tokens == len(surps)
        assert abs(mean - sum(surps) / len(surps)) < 1e-9, doc_id


# ------------------------------------------- update-mode changelog


def test_update_mode_emits_real_intermediate_updates(spark, sf_small):
    """Update mode must be observably different from append: every
    event_type appears in all 3 micro-batches, so its changelog carries
    exactly 3 updates (an append-mode lookalike would show 1), and the
    final n_events agree with the batch ground truth key for key."""
    rows = (
        SPECS["stream_update_mode_running_counts"]
        .fn(spark, sf_small)
        .collect()
    )
    assert rows
    assert all(r.n_updates == 3 for r in rows)
    con = duckdb.connect()
    want = dict(
        con.execute(
            "SELECT event_type, count(*) "
            f"FROM '{sf_small}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    got = {r.event_type: r.n_events for r in rows}
    assert got == want


# ------------------------------------------------- Count-Min sketch


def test_countmin_never_undercounts_and_is_tight_on_hot_keys(
    spark, sf_small, sf_medium
):
    for sf in (sf_small, sf_medium):
        rows = SPECS["sketch_countmin_freq"].fn(spark, sf).collect()
        by_item = {r.item: r for r in rows}
        # the full query set is present, including absent cold keys
        assert {f"hot_{i}" for i in range(3)} <= set(by_item)
        assert len(rows) == 23
        for r in rows:
            assert r.overcount >= 0, r.item  # CM can only overcount
            assert r.est_count == r.true_count + r.overcount
        # hot keys dominate their cells; collision mass stays small
        # relative to their true counts
        for i in range(3):
            r = by_item[f"hot_{i}"]
            assert r.true_count > 0
            assert r.overcount <= r.true_count, r.item


def test_countmin_sketch_is_mergeable_by_cellwise_sum(spark, sf_small):
    """Counting is linear: the cell table built on the full stream
    equals the cell-wise SUM of the tables built on two disjoint
    halves — the property that makes incremental maintenance a
    union+groupBy instead of a rebuild (same contract as the bloom
    bitmap merge)."""
    from pyspark.sql import functions as F

    from kafka_stream_processing_spark.operators.corpus import CM_D, CM_W
    from kafka_stream_processing_spark.operators.dedup import hash64
    from kafka_stream_processing_spark.sources.tables import table

    ev = table(spark, sf_small, "events")
    item = F.when(
        F.col("user_id") < 36,
        F.concat(F.lit("hot_"), (F.col("user_id") % 3).cast("string")),
    ).otherwise(
        F.concat(F.lit("cold_"), F.col("event_id").cast("string"))
    )

    def cells(df):
        return (
            df.select(item.alias("item"))
            .select(
                "item",
                F.explode(F.sequence(F.lit(0), F.lit(CM_D - 1))).alias("r"),
            )
            .select(
                "r",
                (
                    hash64(
                        F.concat(
                            F.col("item"),
                            F.lit("#"),
                            F.col("r").cast("string"),
                        )
                    )
                    % CM_W
                ).alias("b"),
            )
            .groupBy("r", "b")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    full = {(r.r, r.b): r.c for r in cells(ev).collect()}
    lo = cells(ev.filter(F.col("event_id") % 2 == 0))
    hi = cells(ev.filter(F.col("event_id") % 2 == 1))
    merged: dict[tuple[int, int], int] = {}
    for r in lo.collect() + hi.collect():
        merged[(r.r, r.b)] = merged.get((r.r, r.b), 0) + r.c
    assert merged == full


# --------------------------------------------------- k-anonymity


def test_k_anonymity_bands_reconcile(spark, sf_small):
    rows = SPECS["quality_k_anonymity_audit"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    (n_docs,) = con.execute(
        f"SELECT count(*) FROM '{sf_small}/documents.parquet'"
    ).fetchone()
    assert sum(r.n_rows for r in rows) == n_docs
    for r in rows:
        assert r.min_k <= r.max_k
        assert r.n_groups <= r.n_rows
        if r.band == "k=1 unique":
            assert r.min_k == r.max_k == 1
            assert r.n_groups == r.n_rows


# ----------------------------------------------------- Gini skew


def test_gini_matches_python_and_uniform_bound(spark, sf_small):
    row = SPECS["quality_key_skew_gini"].fn(spark, sf_small).collect()[0]
    con = duckdb.connect()
    counts = [
        c
        for (c,) in con.execute(
            f"SELECT count(*) FROM '{sf_small}/events.parquet' GROUP BY user_id"
        ).fetchall()
    ]
    counts.sort()
    n, total = len(counts), sum(counts)
    want = (
        2.0 * sum((i + 1) * c for i, c in enumerate(counts))
    ) / (n * total) - (n + 1) / n
    assert abs(row.gini - want) < 1e-12
    assert 0.0 <= row.gini < 1.0
    assert row.n_keys == n and row.total_events == total
    assert row.max_count == counts[-1]
    top = sum(counts[n - (n + 99) // 100 :])
    assert abs(row.top1pct_share - top / total) < 1e-12


# ------------------------------------------- split leakage audit


def test_split_leakage_matrix_reconciles_with_candidate_pairs(
    spark, sf_small
):
    """The split×split matrix partitions the LSH candidate-pair set
    exactly (Σ n_pairs == |pairs|), leak flags are consistent with the
    labels, and the labels themselves replay sample_hash_split's md5
    rule."""
    import hashlib

    rows = SPECS["pipeline_split_leakage_audit"].fn(spark, sf_small).collect()
    pairs = SPECS["dedup_minhash_lsh"].fn(spark, sf_small).collect()
    assert sum(r.n_pairs for r in rows) == len(pairs)
    for r in rows:
        assert r.is_leak == (r.split_lo != r.split_hi)
        assert r.split_lo <= r.split_hi

    def split(doc_id: int) -> str:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        b = h % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    want: dict[tuple[str, str], int] = {}
    for p in pairs:
        k = tuple(sorted((split(p.doc_a), split(p.doc_b))))
        want[k] = want.get(k, 0) + 1
    got = {(r.split_lo, r.split_hi): r.n_pairs for r in rows}
    assert got == want


# ----------------------------------------- point-in-time SCD2 join


def test_point_in_time_never_leaks_future_state(spark, sf_small):
    """Every probe answer must be the type of some event at-or-before
    the probe time, with NO later change intervening — the feature-store
    no-leakage/no-staleness contract, replayed in pure Python."""
    rows = SPECS["join_point_in_time_scd2"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    events = con.execute(
        "SELECT user_id, epoch_us(ts), event_id, event_type "
        f"FROM '{sf_small}/events.parquet' ORDER BY user_id, 2, 3"
    ).fetchall()
    by_user: dict[int, list[tuple[int, int, str]]] = {}
    for uid, us, eid, et in events:
        by_user.setdefault(uid, []).append((us, eid, et))
    n_probes = con.execute(
        f"SELECT count(*) FROM '{sf_small}/events.parquet' "
        "WHERE event_id % 17 = 0"
    ).fetchone()[0]
    assert len(rows) == n_probes  # exactly one interval matched each
    for r in rows:
        hist = by_user[r.user_id]
        latest = max(
            ((us, eid, et) for us, eid, et in hist if us <= r.probe_us),
            key=lambda x: (x[0], x[1]),
        )
        assert r.as_of_type == latest[2], (r.user_id, r.probe_us)


# ------------------------------------------- contrastive mining


def test_contrastive_bands_are_disjoint_and_ordered(spark, sf_small):
    from kafka_stream_processing_spark.operators.similarity import (
        CONTRASTIVE_NEG,
        CONTRASTIVE_POS,
    )

    rows = SPECS["sample_contrastive_pairs"].fn(spark, sf_small).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(
            range(1, CONTRASTIVE_POS + CONTRASTIVE_NEG + 1)
        )
        # cosine non-increasing with rank; roles split exactly at POS
        for a, b in zip(rs, rs[1:]):
            assert a.cosine >= b.cosine - 1e-12
        for r in rs:
            want = "positive" if r.rank <= CONTRASTIVE_POS else "hard_negative"
            assert r.role == want
        # positives strictly more similar than every hard negative
        pos_min = min(r.cosine for r in rs if r.role == "positive")
        neg_max = max(r.cosine for r in rs if r.role == "hard_negative")
        assert pos_min >= neg_max - 1e-12


# ------------------------------------------ streaming Count-Min


def test_stream_countmin_equals_batch_sketch(spark, sf_small):
    """Linearity on the hard signal's own terms: the stream-folded
    sketch answers the 23-key audit identically to the batch-built one,
    row for row."""
    batch = {
        r.item: (r.true_count, r.est_count)
        for r in SPECS["sketch_countmin_freq"].fn(spark, sf_small).collect()
    }
    streamed = {
        r.item: (r.true_count, r.est_count)
        for r in SPECS["stream_countmin_incremental"]
        .fn(spark, sf_small)
        .collect()
    }
    assert streamed == batch


# --------------------------------------------- bigram entropy


def test_bigram_entropy_matches_python_and_bounds(spark, sf_small):
    """Pure-Python recomputation matches per doc, and the score is
    bounded by ln(distinct successors per context) <= ln(vocab)."""
    import math

    rows = SPECS["text_bigram_entropy"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    got = {r.doc_id: (r.n_bigrams, r.bigram_entropy) for r in rows}
    for doc_id, text in docs:
        t = text.split(" ")
        if len(t) < 2:
            assert doc_id not in got
            continue
        c12: dict[tuple[str, str], int] = {}
        for a, b in zip(t, t[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
        c1: dict[str, int] = {}
        for (a, _), c in c12.items():
            c1[a] = c1.get(a, 0) + c
        n = sum(c12.values())
        h = -sum(
            round((c / n) * math.log(c / c1[a]), 6)
            for (a, _), c in c12.items()
        )
        n_b, got_h = got[doc_id]
        assert n_b == n
        assert abs(got_h - h) < 1e-9, doc_id
        vocab = len({w for w in t})
        assert -1e-9 <= got_h <= math.log(max(vocab, 2)) + 1e-9


# ------------------------------------------ streaming IVF ingest


def test_stream_ivf_index_equals_batch_assignment(spark, sf_small):
    """Streaming ingest must land every vector in the batch build's
    cell: per-cell histograms agree, and totals cover the corpus."""
    rows = SPECS["stream_ivf_index_maintenance"].fn(spark, sf_small).collect()
    con = duckdb.connect()
    (n_vecs,) = con.execute(
        f"SELECT count(*) FROM '{sf_small}/embeddings.parquet'"
    ).fetchone()
    assert sum(r.n_vectors for r in rows) == n_vecs
    from kafka_stream_processing_spark.operators.similarity import (
        _as_double_array,
        ivf_cell,
    )
    from kafka_stream_processing_spark.sources.tables import table
    import pyspark.sql.functions as F

    batch = {
        (r.cell, r.n_vectors)
        for r in table(spark, sf_small, "embeddings")
        .select(ivf_cell(_as_double_array("embedding")).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .collect()
    }
    assert {(r.cell, r.n_vectors) for r in rows} == batch


# ----------------------------------------------- Benford gate


def test_benford_gate_fires_on_uniform_prices(spark, sf_small):
    """TPC-H-style uniform prices are NOT Benford — the tripwire must
    fire; proportions must sum to 1 and chi2 must match a pure-Python
    recomputation."""
    import math

    rows = SPECS["quality_benford_digit_drift"].fn(spark, sf_small).collect()
    assert {r.digit for r in rows} == set(range(1, 10))
    assert all(r.drift for r in rows)  # uniform prices trip the gate
    assert abs(sum(r.p_obs for r in rows) - 1.0) < 1e-12
    n = sum(r.n_obs for r in rows)
    chi2 = sum(
        round(
            (r.n_obs - r.p_benford * n) ** 2 / (r.p_benford * n), 12
        )
        for r in rows
    )
    assert abs(rows[0].chi2 - chi2) < 1e-6
    for r in rows:
        assert abs(r.p_benford - math.log10(1 + 1 / r.digit)) < 1e-12
