"""Round-7 second wave: streaming Mann-Whitney monitor."""

from __future__ import annotations

import duckdb

from kafka_stream_processing_spark.registry import all_specs

SPECS = all_specs()


def test_stream_mwu_three_batches_python_replay(spark, sf_small):
    """Each micro-batch verdict equals a pure-Python midrank rank-sum
    of that doc_id-rank third against the src0 reference."""
    from kafka_stream_processing_spark.operators.quality_rank import (
        MWU_Z_CRIT_005,
    )

    rows = SPECS["stream_mannwhitney_monitor"].fn(spark, sf_small).collect()
    assert len(rows) == 3
    con = duckdb.connect()
    data = con.execute(
        f"SELECT doc_id, source, n_chars FROM "
        f"'{sf_small}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    ref = sorted(c for _, s, c in data if s == "src0")
    train = [(d, c) for d, s, c in data if s != "src0"]
    n = len(train)
    step = (n + 2) // 3
    chunks = [train[i * step : (i + 1) * step] for i in range(3)]
    by_key = {r.chunk_min_doc_id: r for r in rows}
    from collections import Counter

    na = len(ref)
    for chunk in chunks:
        key = min(d for d, _ in chunk)
        r = by_key[key]
        b = [c for _, c in chunk]
        nb = len(b)
        assert r.n_batch == nb
        cnt = Counter(ref) + Counter(b)
        midrank, pos = {}, 0
        for v in sorted(cnt):
            m = cnt[v]
            midrank[v] = pos + (m + 1) / 2
            pos += m
        u = sum(midrank[v] for v in b) - nb * (nb + 1) / 2
        assert r.u2 == round(2 * u)
        nn = na + nb
        tie = sum(m**3 - m for m in cnt.values())
        sigma = ((na * nb / 12) * ((nn + 1) - tie / (nn * (nn - 1)))) ** 0.5
        z = (u - na * nb / 2) / sigma
        assert abs(r.z - z) < 1e-9
        assert r.drift == (abs(r.z) > MWU_Z_CRIT_005)


def test_rake_python_replay(spark, sf_small):
    """Pure-Python RAKE replay with the same stopword set, score
    convention (round-6 word scores, exact sums), and top-k order."""
    from decimal import Decimal

    from kafka_stream_processing_spark.operators.text import (
        RAKE_STOPWORDS,
        RAKE_TOPK,
    )

    con = duckdb.connect()
    texts = [
        t
        for (t,) in con.execute(
            f"SELECT text FROM '{sf_small}/documents.parquet'"
        ).fetchall()
    ]
    phrases = []
    for t in texts:
        cur = []
        for w in t.split(" "):
            if w in RAKE_STOPWORDS:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    deg, freq = {}, {}
    for p in phrases:
        for w in p:
            deg[w] = deg.get(w, 0) + len(p)
            freq[w] = freq.get(w, 0) + 1
    wscore = {
        w: Decimal(str(round(deg[w] / freq[w], 6))) for w in deg
    }
    from collections import Counter

    occ = Counter(phrases)
    scored = [
        (
            " ".join(p),
            len(p),
            n,
            float(sum(wscore[w] for w in p)),
        )
        for p, n in occ.items()
    ]
    scored.sort(key=lambda r: (-r[3], r[0]))
    want = scored[:RAKE_TOPK]
    rows = SPECS["text_rake_keyphrases"].fn(spark, sf_small).collect()
    got = [
        (r.phrase, r.n_words, r.n_occurrences, r.score) for r in rows
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == w[1] and g[2] == w[2]
        assert abs(g[3] - w[3]) < 1e-9

