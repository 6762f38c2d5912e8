"""Round-5d operator pins: interpolated bigram LM vs a numpy reference,
Misra-Gries sketch guarantees (bounded counters, heavy-hitter superset),
and the streaming LM scorer's stream==batch agreement."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from kafka_stream_processing_spark import registry
from kafka_stream_processing_spark.operators.python_udfs import (
    HH_K,
    _mg_sketch_partition,
)
from kafka_stream_processing_spark.operators.quality_lm import (
    LM_BOS,
    LM_LAMBDA,
)
from kafka_stream_processing_spark.plans.explain import plan_report

SPECS = registry.all_specs()


# ---------------------------------------------------------- bigram LM


def test_bigram_lm_matches_numpy_reference(spark, sf_small):
    """Interpolated bigram surprisal recomputed independently in Python
    (BOS-prefixed bigrams, Jelinek-Mercer mix, round-6 per-bigram
    surprisal) matches the operator for every document at sf0.001."""
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    cb: dict[tuple[str, str], int] = {}
    uni: dict[str, int] = {}
    for _, text in docs:
        t = [LM_BOS] + text.split(" ")
        for w1, w2 in zip(t, t[1:]):
            cb[(w1, w2)] = cb.get((w1, w2), 0) + 1
            uni[w2] = uni.get(w2, 0) + 1
    ctx: dict[str, int] = {}
    for (w1, _), c in cb.items():
        ctx[w1] = ctx.get(w1, 0) + c
    n = sum(uni.values())
    got = {
        r.doc_id: (r.n_tokens, r.mean_surprisal)
        for r in SPECS["quality_bigram_lm_interpolated"]
        .fn(spark, sf_small)
        .collect()
    }
    assert len(got) == len(docs)
    for doc_id, text in docs:
        t = [LM_BOS] + text.split(" ")
        surps = [
            round(
                float(
                    -np.log(
                        LM_LAMBDA * (cb[(w1, w2)] / ctx[w1])
                        + (1 - LM_LAMBDA) * (uni[w2] / n)
                    )
                ),
                6,
            )
            for w1, w2 in zip(t, t[1:])
        ]
        n_tokens, mean = got[doc_id]
        assert n_tokens == len(surps)
        assert abs(mean - sum(surps) / len(surps)) < 1e-9, doc_id


def test_bigram_lm_scores_context_not_just_vocab(spark, sf_small):
    """The bigram model must rank documents differently from the
    unigram model somewhere — if the orderings were identical the
    context term would be contributing nothing."""
    bi = {
        r.doc_id: r.mean_surprisal
        for r in SPECS["quality_bigram_lm_interpolated"]
        .fn(spark, sf_small)
        .collect()
    }
    un = {
        r.doc_id: r.mean_surprisal
        for r in SPECS["quality_unigram_lm_surprisal"]
        .fn(spark, sf_small)
        .collect()
    }
    ids = sorted(bi)
    rank_bi = sorted(ids, key=lambda d: (bi[d], d))
    rank_un = sorted(ids, key=lambda d: (un[d], d))
    assert rank_bi != rank_un


def test_bigram_lm_join_is_not_forced_broadcast(spark, sf_small):
    """The scoring join keys on (w1, w2) — O(distinct bigrams), which
    outgrows broadcast at corpus scale, so the operator must not force
    a broadcast (AQE may still choose one at toy sizes)."""
    import inspect

    from kafka_stream_processing_spark.operators import quality_lm as quality

    src = inspect.getsource(quality.quality_bigram_lm_interpolated)
    assert "broadcast(lm" not in src


# -------------------------------------------------------- Misra-Gries


def test_mg_sketch_bounded_and_superset():
    """The per-partition sketch never exceeds HH_K counters and always
    contains every item with local frequency > local_n / HH_K — checked
    over deterministic adversarial mixes of hot items and a unique
    tail."""
    rng = np.random.RandomState(11)
    for trial in range(5):
        hot = [f"hot{j}" for j in range(3)]
        items = hot * (100 + 50 * trial)
        items += [f"tail{i}" for i in range(1000)]
        order = rng.permutation(len(items))
        stream = [items[i] for i in order]
        out = list(
            _mg_sketch_partition(iter([pd.DataFrame({"item": stream})]))
        )
        cands = set(out[0]["item"]) if out else set()
        assert len(cands) <= HH_K
        n = len(stream)
        freq: dict[str, int] = {}
        for it in stream:
            freq[it] = freq.get(it, 0) + 1
        for it, c in freq.items():
            if c * HH_K > n:
                assert it in cands, (trial, it)


def test_mg_heavy_hitters_are_the_injected_hot_keys(spark, sf_small, sf_medium):
    for sf in (sf_small, sf_medium):
        rows = SPECS["sketch_heavy_hitters_mg"].fn(spark, sf).collect()
        assert {r.item for r in rows} == {"hot_0", "hot_1", "hot_2"}, sf


def test_mg_plan_uses_arrow_python_map(spark, sf_small):
    """Pass 1 must run through the Arrow-batched Python map — and pass 2
    must aggregate only candidate-filtered rows (the isin semi-filter
    sits under the aggregate)."""
    df = SPECS["sketch_heavy_hitters_mg"].fn(spark, sf_small)
    rep = plan_report(df)
    assert "item IN" in rep.text or "item#" in rep.text
    assert "hot_" in rep.text  # the literal candidate list reached the plan


# ----------------------------------------------------- streaming LM


def test_stream_lm_scores_equal_batch_restriction(spark, sf_small):
    """Stream and batch provably agree: the streaming scorer's output
    equals quality_unigram_lm_surprisal restricted to non-benchmark
    documents, score for score."""
    out_rows = (
        SPECS["stream_lm_surprisal_scores"].fn(spark, sf_small).collect()
    )
    # the LM trains on a superset of the streamed slice, so nothing is
    # out-of-vocabulary here — and no score may be NULL (the OOV path
    # filters + counts, it never poisons the fold).
    assert all(r.n_oov == 0 for r in out_rows)
    assert all(r.mean_surprisal is not None for r in out_rows)
    got = {r.doc_id: (r.n_words, r.mean_surprisal) for r in out_rows}
    con = duckdb.connect()
    streamed_ids = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM '{sf_small}/documents.parquet' "
            "WHERE source <> 'src0'"
        ).fetchall()
    }
    batch = {
        r.doc_id: (r.n_words, r.mean_surprisal)
        for r in SPECS["quality_unigram_lm_surprisal"]
        .fn(spark, sf_small)
        .collect()
        if r.doc_id in streamed_ids
    }
    assert set(got) == streamed_ids
    for doc_id, (n_words, mean) in batch.items():
        gn, gm = got[doc_id]
        assert gn == n_words
        assert abs(gm - mean) < 1e-12, doc_id
