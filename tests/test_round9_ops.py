"""Round-9 ops: Ansari-Bradley folded-rank scale test, weighted-grid
distance correlation (length x vocab), Gopher-style repetition gates,
daily permutation entropy, and streaming Apriori level-3 — python
replays of each kernel plus the structural laws each op rides on."""

from __future__ import annotations

import math
from fractions import Fraction

from kafka_stream_processing_spark.registry import all_specs
from kafka_stream_processing_spark.sources.tables import table

SPECS = all_specs()


# ------------------------------------------------------ Ansari-Bradley


def _doc_lengths(spark, sf_dir):
    rows = (
        table(spark, sf_dir, "documents")
        .select("n_chars", "source")
        .collect()
    )
    a = sorted(r["n_chars"] for r in rows if r["source"] == "src0")
    b = sorted(r["n_chars"] for r in rows if r["source"] != "src0")
    return a, b


def test_ansari_bradley_brute_force_replay(spark, sf_small):
    """T2/sum_s2/sum_s4 equal a per-observation midrank replay (no
    histogram walk — ranks assigned by sorting the pooled sample), and
    z matches the generic tie-corrected linear-rank form computed with
    Fractions."""
    eng = SPECS["quality_ansari_bradley_drift"].fn(
        spark, sf_small
    ).collect()[0]
    a, b = _doc_lengths(spark, sf_small)
    pooled = sorted(a + b)
    n = len(pooled)
    # doubled midrank per value: 2r = 2*lt + m + 1
    from collections import Counter

    cnt = Counter(pooled)
    lt = 0
    r2 = {}
    for v in sorted(cnt):
        m = cnt[v]
        r2[v] = 2 * lt + m + 1
        lt += m
    s2 = {v: (n + 1) - abs(r2[v] - (n + 1)) for v in cnt}
    t2 = sum(s2[v] for v in a)
    sum_s2 = sum(cnt[v] * s2[v] for v in cnt)
    sum_s4 = sum(cnt[v] * s2[v] * s2[v] for v in cnt)
    assert eng["t2"] == t2
    assert eng["sum_s2"] == sum_s2
    assert eng["sum_s4"] == sum_s4
    na, nb = len(a), len(b)
    mean = Fraction(na * sum_s2, n)
    var = Fraction(
        na * nb * (n * sum_s4 - sum_s2 * sum_s2), n * n * (n - 1)
    )
    z = (t2 - float(mean)) / math.sqrt(float(var))
    assert abs(eng["z_ab"] - z) < 1e-9


def test_ansari_bradley_folded_scores_bounded(spark, sf_small):
    """Structural law of folding: every doubled score lies in
    [2, N+1], so sum_s2 is between 2N and N(N+1) — a cheap guard that
    the fold used the pooled N, not a per-sample one."""
    eng = SPECS["quality_ansari_bradley_drift"].fn(
        spark, sf_small
    ).collect()[0]
    n = eng["na"] + eng["nb"]
    assert 2 * n <= eng["sum_s2"] <= n * (n + 1)


# ---------------------------------------------- weighted-grid dCor


def test_dcor_length_vocab_weighted_identity(spark, sf_small):
    """The engine's decimal-combined components equal a brute-force
    python replay over the EXPANDED per-document observation list (the
    weighted grid must be invisible in the result), computed in exact
    ints."""
    import pyspark.sql.functions as F

    eng = SPECS["quality_dcor_length_vocab"].fn(
        spark, sf_small
    ).collect()[0]
    rows = (
        table(spark, sf_small, "documents")
        .select(
            (F.col("n_chars") / 16).cast("bigint").alias("xv"),
            F.size(
                F.array_distinct(F.split(F.col("text"), " "))
            ).alias("yv"),
        )
        .collect()
    )
    xs = [r["xv"] for r in rows]
    ys = [r["yv"] for r in rows]
    n = len(xs)
    assert eng["n_docs"] == n
    t1 = t1x = t1y = sa = sb = 0
    r = [0] * n
    s = [0] * n
    for i in range(n):
        for j in range(n):
            dx = abs(xs[i] - xs[j])
            dy = abs(ys[i] - ys[j])
            t1 += dx * dy
            t1x += dx * dx
            t1y += dy * dy
            sa += dx
            sb += dy
            r[i] += dx
            s[i] += dy
    tr = sum(r[i] * s[i] for i in range(n))
    trx = sum(r[i] * r[i] for i in range(n))
    try_ = sum(s[i] * s[i] for i in range(n))
    num = n * n * t1 - 2 * n * tr + sa * sb
    vx = n * n * t1x - 2 * n * trx + sa * sa
    vy = n * n * t1y - 2 * n * try_ + sb * sb
    assert eng["dcov2_num"] == float(num)
    assert eng["dvar2_x"] == float(vx)
    assert eng["dvar2_y"] == float(vy)
    assert num >= 0  # dCov^2 is a nonnegative V-statistic
    dcor = math.sqrt(float(num) / math.sqrt(float(vx) * float(vy)))
    assert abs(eng["dcor"] - dcor) < 1e-12
    assert 0.0 <= eng["dcor"] <= 1.0


# ------------------------------------------------- repetition gates


def test_repetition_rules_python_replay(spark, sf_small):
    """Per-doc bigram/trigram counts equal a pure-python n-gram count
    on a 50-doc sample, and the flag equals the two-threshold rule."""
    out = {
        r["doc_id"]: r
        for r in SPECS["text_repetition_gopher_rules"]
        .fn(spark, sf_small)
        .collect()
    }
    docs = (
        table(spark, sf_small, "documents")
        .select("doc_id", "text")
        .limit(50)
        .collect()
    )
    from collections import Counter

    for d in docs:
        t = d["text"].split(" ")
        row = out[d["doc_id"]]
        assert row["n_tokens"] == len(t)
        bi = Counter(
            " ".join(t[i : i + 2]) for i in range(len(t) - 1)
        )
        tri = Counter(
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        )
        assert row["top_bigram_cnt"] == (max(bi.values()) if bi else 0)
        assert row["n_trigrams"] == sum(tri.values())
        dup = sum(c for c in tri.values() if c >= 2)
        assert row["dup_trigram_occ"] == dup
        flag = (2 * row["top_bigram_cnt"] / len(t) > 0.20) or (
            row["n_trigrams"] > 0 and dup / row["n_trigrams"] > 0.18
        )
        assert row["repetitive"] == flag


def test_repetition_flags_a_planted_loop(spark, sf_small):
    """Sensitivity: a synthetic document that is one bigram repeated
    must flag, and a permutation-unique document must not.  Built by
    running the same engine expressions on a two-row DataFrame."""
    looped = " ".join(["spam ham"] * 30)
    unique = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, looped, "x", len(looped)), (2, unique, "x", len(unique))],
        "doc_id bigint, text string, source string, n_chars bigint",
    )
    df.createOrReplaceTempView("documents_synth")
    import kafka_stream_processing_spark.operators.text as text_mod
    import kafka_stream_processing_spark.sources.tables as tables_mod

    orig = tables_mod.table
    try:
        tables_mod.table = lambda spark, sf, name: (
            df if name == "documents" else orig(spark, sf, name)
        )
        text_mod.table = tables_mod.table
        rows = {
            r["doc_id"]: r["repetitive"]
            for r in text_mod.text_repetition_gopher_rules(
                spark, "unused"
            ).collect()
        }
    finally:
        tables_mod.table = orig
        text_mod.table = orig
    assert rows[1] is True
    assert rows[2] is False


# -------------------------------------------- permutation entropy


def test_permutation_entropy_python_replay(spark, sf_small):
    """Pattern counts equal a python replay over the exact DECIMAL
    daily sums, the two impossible ordinal patterns never occur (the
    replay checks by construction), and H matches the fixed-order
    6-term fold."""
    import pyspark.sql.functions as F
    from kafka_stream_processing_spark.functions.exact import dec

    eng = SPECS["window_permutation_entropy_daily"].fn(
        spark, sf_small
    ).collect()[0]
    daily = (
        table(spark, sf_small, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(dec("o_totalprice")).alias("rev"))
        .orderBy("day")
        .collect()
    )
    xs = [r["rev"] for r in daily]
    counts = {
        "p012": 0,
        "p021": 0,
        "p102": 0,
        "p120": 0,
        "p201": 0,
        "p210": 0,
    }
    label = {
        (0, 0, 0): "p012",
        (0, 0, 1): "p021",
        (1, 0, 0): "p102",
        (1, 1, 0): "p120",
        (0, 1, 1): "p201",
        (1, 1, 1): "p210",
    }
    for i in range(len(xs) - 2):
        x0, x1, x2 = xs[i], xs[i + 1], xs[i + 2]
        key = (int(x1 < x0), int(x2 < x0), int(x2 < x1))
        assert key in label, "impossible ordinal pattern emerged"
        counts[label[key]] += 1
    n = sum(counts.values())
    assert eng["n_windows"] == n
    for k, v in counts.items():
        assert eng[k] == v
    h = 0.0
    for k in sorted(counts):
        c = counts[k]
        if c > 0:
            h += -(c / n) * math.log(c / n)
    assert abs(eng["perm_entropy"] - h) < 1e-9
    assert 0.0 <= eng["perm_entropy_norm"] <= 1.0 + 1e-12


# ------------------------------------------- streaming level-3 Apriori


def test_frequent_triples_anti_monotone_and_closure(spark, sf_small):
    """Apriori laws against the level-2 op: every emitted triple's
    support <= the min of its three pair supports (anti-monotone), and
    every frequent pair triple-closure candidate appears (the gate
    prunes by PAIRS, so a triple absent from the output must have a
    non-frequent sub-pair)."""
    pairs = {
        (r["type_a"], r["type_b"]): r["support"]
        for r in SPECS["stream_frequent_pairs_stateful"]
        .fn(spark, sf_small)
        .collect()
    }
    trip_rows = (
        SPECS["stream_frequent_triples_stateful"]
        .fn(spark, sf_small)
        .collect()
    )
    from kafka_stream_processing_spark.streaming.stateful import (
        PAIR_MIN_SUPPORT,
        PAIR_TYPES,
    )

    emitted = set()
    for r in trip_rows:
        t = (r["type_a"], r["type_b"], r["type_c"])
        emitted.add(t)
        sub = [
            pairs[(t[0], t[1])],
            pairs[(t[0], t[2])],
            pairs[(t[1], t[2])],
        ]
        assert all(s >= PAIR_MIN_SUPPORT for s in sub)
        assert r["support"] <= min(sub) + 1e-12
    n = len(PAIR_TYPES)
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                t = (PAIR_TYPES[i], PAIR_TYPES[j], PAIR_TYPES[k])
                gate = all(
                    pairs[p] >= PAIR_MIN_SUPPORT
                    for p in [
                        (t[0], t[1]),
                        (t[0], t[2]),
                        (t[1], t[2]),
                    ]
                )
                assert (t in emitted) == gate


# --------------------------------------------- streaming repetition


def test_repetition_monitor_chunks_sum_to_batch(spark, sf_small):
    """The monitor's chunk flags sum to the batch gate's train-side
    totals, and the shared-kernel guard: both the batch gate and the
    monitor call repetition_metrics/repetition_flag."""
    import inspect

    from kafka_stream_processing_spark.operators import text as text_mod
    from kafka_stream_processing_spark.streaming import joins

    batch = (
        SPECS["text_repetition_gopher_rules"].fn(spark, sf_small)
        .filter("source <> 'src0'")
        .collect()
    )
    chunks = SPECS["stream_repetition_monitor"].fn(
        spark, sf_small
    ).collect()
    assert sum(c["n_batch"] for c in chunks) == len(batch)
    assert sum(c["n_repetitive"] for c in chunks) == sum(
        1 for r in batch if r["repetitive"]
    )
    for fn in (
        text_mod.text_repetition_gopher_rules,
        joins.stream_repetition_monitor,
    ):
        src = inspect.getsource(
            fn.__wrapped__ if hasattr(fn, "__wrapped__") else fn
        )
        assert "repetition_metrics(" in src
        assert "repetition_flag(" in src


# --------------------------------------------- token-budget water-fill


def test_waterfill_conservation_and_level(spark, sf_small):
    """Allocations sum to the budget (within one fill-level ULP per
    source), clamped sources are exactly the ones below the level,
    unclamped allocations all equal the level, and a python replay of
    the water-fill gives the same breakpoint and level."""
    rows = SPECS["sample_token_budget_waterfill"].fn(
        spark, sf_small
    ).collect()
    b = rows[0]["budget_tokens"]
    level = rows[0]["fill_level"]
    assert all(r["fill_level"] == level for r in rows)
    assert abs(sum(r["allocation_tokens"] for r in rows) - b) < 1e-6 * b
    for r in rows:
        if r["clamped"]:
            assert r["supply_tokens"] <= level + 1e-9
            assert r["allocation_tokens"] == float(r["supply_tokens"])
            assert r["epochs"] == 1.0
        else:
            assert r["allocation_tokens"] == level
            assert r["epochs"] <= 1.0 + 1e-12
    # python replay
    supplies = sorted(r["supply_tokens"] for r in rows)
    n = len(supplies)
    prefix = 0
    expected_level = None
    for k, s in enumerate(supplies, start=1):
        s_prev = supplies[k - 2] if k > 1 else 0
        rem = b - prefix
        if s_prev * (n - k + 1) <= rem <= s * (n - k + 1):
            expected_level = rem / (n - k + 1)
            break
        prefix += s
    assert expected_level is not None
    assert abs(level - expected_level) < 1e-9
