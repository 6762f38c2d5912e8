"""Round-5f operator pins: Kneser-Ney bigram LM vs a numpy reference,
shingle-containment dedup vs a pure-Python reference (plus the
asymmetry-vs-Jaccard construction that motivates it), and MAD
length-outlier flags vs an independent integer recomputation."""

from __future__ import annotations

import duckdb
import numpy as np

from kafka_stream_processing_spark import registry
from kafka_stream_processing_spark.operators.dedup import (
    CONTAINMENT_DEN,
    CONTAINMENT_NUM,
    MAX_SHINGLE_DF,
)
from kafka_stream_processing_spark.operators.quality_lm import (
    KN_DISCOUNT,
    LM_BOS,
)

SPECS = registry.all_specs()


# --------------------------------------------------------- Kneser-Ney


def test_kneser_ney_matches_numpy_reference(spark, sf_small):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    cb: dict[tuple[str, str], int] = {}
    for _, text in docs:
        t = [LM_BOS] + text.split(" ")
        for w1, w2 in zip(t, t[1:]):
            cb[(w1, w2)] = cb.get((w1, w2), 0) + 1
    total: dict[str, int] = {}
    n1fwd: dict[str, int] = {}
    n1bwd: dict[str, int] = {}
    for (w1, w2), c in cb.items():
        total[w1] = total.get(w1, 0) + c
        n1fwd[w1] = n1fwd.get(w1, 0) + 1
        n1bwd[w2] = n1bwd.get(w2, 0) + 1
    n1tot = len(cb)
    got = {
        r.doc_id: (r.n_tokens, r.mean_surprisal)
        for r in SPECS["quality_bigram_kneser_ney"].fn(spark, sf_small).collect()
    }
    assert len(got) == len(docs)
    for doc_id, text in docs:
        t = [LM_BOS] + text.split(" ")
        surps = [
            round(
                float(
                    -np.log(
                        ((cb[(w1, w2)] - KN_DISCOUNT) / total[w1])
                        + ((KN_DISCOUNT * n1fwd[w1]) / total[w1])
                        * (n1bwd[w2] / n1tot)
                    )
                ),
                6,
            )
            for w1, w2 in zip(t, t[1:])
        ]
        n_tokens, mean = got[doc_id]
        assert n_tokens == len(surps)
        assert abs(mean - sum(surps) / len(surps)) < 1e-9, doc_id


def test_kneser_ney_differs_from_interpolated(spark, sf_small):
    """Continuation counting must change the ordering somewhere —
    otherwise the KN machinery degenerated to plain interpolation."""
    kn = {
        r.doc_id: r.mean_surprisal
        for r in SPECS["quality_bigram_kneser_ney"].fn(spark, sf_small).collect()
    }
    jm = {
        r.doc_id: r.mean_surprisal
        for r in SPECS["quality_bigram_lm_interpolated"]
        .fn(spark, sf_small)
        .collect()
    }
    ids = sorted(kn)
    assert sorted(ids, key=lambda d: (kn[d], d)) != sorted(
        ids, key=lambda d: (jm[d], d)
    )


# -------------------------------------------------------- containment


def _shingle_sets(docs: list[tuple[int, str]]) -> dict[int, set[str]]:
    raw = {}
    for doc_id, text in docs:
        t = text.split(" ")
        raw[doc_id] = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        } if len(t) >= 3 else set()
    df: dict[str, int] = {}
    for shs in raw.values():
        for s in shs:
            df[s] = df.get(s, 0) + 1
    return {
        d: {s for s in shs if df[s] <= MAX_SHINGLE_DF}
        for d, shs in raw.items()
    }


def test_containment_matches_python_reference(spark, sf_small):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    sets = _shingle_sets(docs)
    want = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = len(sets[a] & sets[b])
            if c == 0:
                continue
            for inner, outer in ((a, b), (b, a)):
                if c * CONTAINMENT_DEN >= len(sets[inner]) * CONTAINMENT_NUM:
                    want.add((inner, outer, len(sets[inner]), c))
    got = {
        (r.inner_doc, r.outer_doc, r.n_inner, r.n_shared)
        for r in SPECS["dedup_shingle_containment"].fn(spark, sf_small).collect()
    }
    assert got == want


def test_containment_catches_what_jaccard_misses():
    """The motivating construction: a fragment fully embedded in a much
    larger document has containment 1.0 but Jaccard far below any
    symmetric threshold — evaluated through the same pure-Python shingle
    algebra the reference test uses."""
    words = [f"w{i}" for i in range(100)]
    fragment = " ".join(words[:10])
    wrapper = " ".join(words)  # fragment is its prefix
    sets = _shingle_sets([(1, fragment), (2, wrapper)])
    inter = len(sets[1] & sets[2])
    containment = inter / len(sets[1])
    jaccard = inter / len(sets[1] | sets[2])
    assert containment == 1.0
    assert jaccard < 0.3  # under dedup_ngram_jaccard's own threshold
    assert inter * CONTAINMENT_DEN >= len(sets[1]) * CONTAINMENT_NUM


# --------------------------------------------------------------- MAD


def test_mad_outliers_match_integer_reference(spark, sf_small):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, n_chars FROM '{sf_small}/documents.parquet'"
    ).fetchall()

    def lower_median(vals: list[tuple[int, int]]) -> int:
        s = sorted(vals)  # (value, doc_id) total order
        return s[(len(s) + 1) // 2 - 1][0]

    med = lower_median([(c, d) for d, c in rows])
    mad = lower_median([(abs(c - med), d) for d, c in rows])
    got = {
        r.doc_id: r
        for r in SPECS["quality_length_outlier_mad"].fn(spark, sf_small).collect()
    }
    assert len(got) == len(rows)
    for doc_id, n_chars in rows:
        r = got[doc_id]
        assert r.median_chars == med
        assert r.mad == mad
        assert r.abs_dev == abs(n_chars - med)
        assert r.is_outlier == (abs(n_chars - med) > 3 * mad)


# ----------------------------------------------- sequence pattern


def test_sequence_pattern_matches_python_re(spark, sf_small):
    """Funnel counts recomputed with Python's re module over
    independently-built per-user sequences equal the operator for every
    user."""
    import re

    from kafka_stream_processing_spark.operators.windowed import SEQ_PATTERN

    con = duckdb.connect()
    rows = con.execute(
        "SELECT user_id, ts, event_id, event_type "
        f"FROM '{sf_small}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    seqs: dict[int, list[str]] = {}
    for user_id, _, _, et in rows:
        seqs.setdefault(user_id, []).append(et[0])
    got = {
        r.user_id: (r.n_events, r.n_funnels, r.has_funnel)
        for r in SPECS["window_sequence_pattern_match"]
        .fn(spark, sf_small)
        .collect()
    }
    assert set(got) == set(seqs)
    pat = re.compile(SEQ_PATTERN)
    for user_id, chars in seqs.items():
        want = len(pat.findall("".join(chars)))
        n_events, n_funnels, has = got[user_id]
        assert n_events == len(chars)
        assert n_funnels == want, user_id
        assert has == (want > 0)


# ----------------------------------------------- ANN recall sweep


def test_recall_sweep_monotone_and_exhaustive_at_full_probe(spark, sf_small):
    """Probe cells are prefix-nested, so per-query recall and candidate
    counts are non-decreasing in nprobe; probing all 8 cells IS the
    exhaustive search, so recall@nprobe=8 is exactly 1.0."""
    from kafka_stream_processing_spark.operators.similarity import (
        RECALL_SWEEP_NPROBES,
    )

    rows = SPECS["similarity_ann_recall_eval"].fn(spark, sf_small).collect()
    by_q: dict[int, dict[int, tuple[int, float]]] = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.nprobe] = (r.n_candidates, r.recall)
    for q, curve in by_q.items():
        assert set(curve) == set(RECALL_SWEEP_NPROBES)
        ordered = [curve[n] for n in sorted(curve)]
        for (c1, r1), (c2, r2) in zip(ordered, ordered[1:]):
            assert c2 >= c1, q
            assert r2 >= r1 - 1e-12, q
        assert curve[8][1] == 1.0, q


def test_trigram_kneser_ney_matches_numpy_reference(spark, sf_small):
    """Full two-level KN recursion recomputed independently in Python
    (raw trigram counts at the top, continuation counts below, double
    BOS) matches the operator for every document."""
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    c3: dict[tuple[str, str, str], int] = {}
    for _, text in docs:
        t = [LM_BOS, LM_BOS] + text.split(" ")
        for tri in zip(t, t[1:], t[2:]):
            c3[tri] = c3.get(tri, 0) + 1
    t3: dict[tuple[str, str], int] = {}
    n13: dict[tuple[str, str], int] = {}
    lefts: dict[tuple[str, str], set[str]] = {}
    for (w1, w2, w3), c in c3.items():
        t3[(w1, w2)] = t3.get((w1, w2), 0) + c
        n13[(w1, w2)] = n13.get((w1, w2), 0) + 1
        lefts.setdefault((w2, w3), set()).add(w1)
    c2 = {bg: len(ws) for bg, ws in lefts.items()}
    t2: dict[str, int] = {}
    n12: dict[str, int] = {}
    c1: dict[str, int] = {}
    for (w2, w3), c in c2.items():
        t2[w2] = t2.get(w2, 0) + c
        n12[w2] = n12.get(w2, 0) + 1
        c1[w3] = c1.get(w3, 0) + 1
    tot1 = sum(c1.values())
    D = KN_DISCOUNT

    def surp(w1: str, w2: str, w3: str) -> float:
        p2 = ((c2[(w2, w3)] - D) / t2[w2]) + ((D * n12[w2]) / t2[w2]) * (
            c1[w3] / tot1
        )
        p3 = ((c3[(w1, w2, w3)] - D) / t3[(w1, w2)]) + (
            (D * n13[(w1, w2)]) / t3[(w1, w2)]
        ) * p2
        return round(float(-np.log(p3)), 6)

    got = {
        r.doc_id: (r.n_tokens, r.mean_surprisal)
        for r in SPECS["quality_trigram_kneser_ney"].fn(spark, sf_small).collect()
    }
    assert len(got) == len(docs)
    for doc_id, text in docs:
        t = [LM_BOS, LM_BOS] + text.split(" ")
        surps = [surp(*tri) for tri in zip(t, t[1:], t[2:])]
        n_tokens, mean = got[doc_id]
        assert n_tokens == len(surps)
        assert abs(mean - sum(surps) / len(surps)) < 1e-9, doc_id
