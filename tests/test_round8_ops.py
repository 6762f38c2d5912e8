"""Round-8 ops: distance correlation and Hoeffding's D between hourly
click and purchase volumes — brute-force python replays of both exact
integer kernels (the engine computes them via pair-sum identities and
dominance histograms; the replay walks raw observation pairs)."""

from __future__ import annotations

from fractions import Fraction

from kafka_stream_processing_spark.registry import all_specs
from kafka_stream_processing_spark.sources.tables import table

SPECS = all_specs()


def _hourly_xy(spark, sf_dir):
    """(x, y) = per-hour click/purchase counts, reconstructed in python
    from the raw events table (truncation done on epoch seconds, not
    via the engine's date_trunc, so the grid derivation is independent
    too)."""
    import pyspark.sql.functions as F

    rows = (
        table(spark, sf_dir, "events")
        .select(
            F.unix_timestamp("ts").alias("sec"),
            "event_type",
        )
        .collect()
    )
    grid: dict[int, list[int]] = {}
    for r in rows:
        h = r["sec"] // 3600
        cell = grid.setdefault(h, [0, 0])
        if r["event_type"] == "click":
            cell[0] += 1
        elif r["event_type"] == "purchase":
            cell[1] += 1
    return [tuple(v) for _, v in sorted(grid.items())]


def test_distance_correlation_brute_force_replay(spark, sf_small):
    """The engine's three BIGINT components equal the brute-force
    pair-sum values, AND the double-centering identity holds: the
    Fraction-exact mean of A_ij*B_ij over the centered distance
    matrices equals dcov2_num / n^4."""
    eng = SPECS["quality_distance_correlation_hourly"].fn(
        spark, sf_small
    ).collect()[0]
    pts = _hourly_xy(spark, sf_small)
    n = len(pts)
    assert eng["n_hours"] == n
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
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
    tr = sum(ri * si for ri, si in zip(r, s))
    trx = sum(ri * ri for ri in r)
    try_ = sum(si * si for si in s)
    num = n * n * t1 - 2 * n * tr + sa * sb
    vx = n * n * t1x - 2 * n * trx + sa * sa
    vy = n * n * t1y - 2 * n * try_ + sb * sb
    assert eng["dcov2_num"] == num
    assert eng["dvar2_x"] == vx
    assert eng["dvar2_y"] == vy
    # identity check against the textbook double-centered form
    ra = [Fraction(ri, n) for ri in r]
    ca = Fraction(sa, n * n)
    rb = [Fraction(si, n) for si in s]
    cb = Fraction(sb, n * n)
    acc = Fraction(0)
    for i in range(n):
        for j in range(n):
            aij = abs(xs[i] - xs[j]) - ra[i] - ra[j] + ca
            bij = abs(ys[i] - ys[j]) - rb[i] - rb[j] + cb
            acc += aij * bij
    assert acc / (n * n) == Fraction(num, n**4)
    assert 0.0 <= eng["dcor"] <= 1.0


def test_hoeffding_d_brute_force_replay(spark, sf_small):
    """The engine's D1_16/D2_16/D3_16 equal a brute-force replay over
    observation pairs with midrank tie credits (R2 = 2(R-1) on the
    half-integer grid, Q4 = 4Q on the quarter grid)."""
    eng = SPECS["quality_hoeffding_d_hourly"].fn(
        spark, sf_small
    ).collect()[0]
    pts = _hourly_xy(spark, sf_small)
    n = len(pts)
    assert eng["n_hours"] == n
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    d1 = d2 = d3 = 0
    for i in range(n):
        r2 = sum(
            2 if xs[j] < xs[i] else (1 if xs[j] == xs[i] else 0)
            for j in range(n)
            if j != i
        )
        s2 = sum(
            2 if ys[j] < ys[i] else (1 if ys[j] == ys[i] else 0)
            for j in range(n)
            if j != i
        )
        q4 = 4
        for j in range(n):
            if j == i:
                continue
            if xs[j] < xs[i] and ys[j] < ys[i]:
                q4 += 4
            elif xs[j] == xs[i] and ys[j] < ys[i]:
                q4 += 2
            elif xs[j] < xs[i] and ys[j] == ys[i]:
                q4 += 2
            elif xs[j] == xs[i] and ys[j] == ys[i]:
                q4 += 1
        d1 += (q4 - 4) * (q4 - 8)
        d2 += r2 * (r2 - 2) * s2 * (s2 - 2)
        d3 += (r2 - 2) * (s2 - 2) * (q4 - 4)
    assert eng["d1_16"] == d1
    assert eng["d2_16"] == d2
    assert eng["d3_16"] == d3
    expect_d = (
        30.0
        * (float((n - 2) * (n - 3)) * float(d1) + float(d2)
           - 2.0 * float(n - 2) * float(d3))
        / (16.0 * float(n) * float(n - 1) * float(n - 2)
           * float(n - 3) * float(n - 4))
    )
    assert abs(eng["hoeffding_d"] - expect_d) < 1e-12
    # scaled-D bound: 30*integral form lies in [-0.5, 1]
    assert -0.5 <= eng["hoeffding_d"] <= 1.0


def test_kuiper_brute_force_replay_and_ks_bound(spark, sf_small):
    """Integer gap maxima replay from raw (value, source) rows, plus
    the ordering law V >= D: Kuiper's statistic dominates the KS
    statistic on the same split by construction."""
    eng = SPECS["quality_kuiper_drift"].fn(spark, sf_small).collect()[0]
    rows = (
        table(spark, sf_small, "documents")
        .select("n_chars", "source")
        .collect()
    )
    a = sorted(r["n_chars"] for r in rows if r["source"] == "src0")
    b = sorted(r["n_chars"] for r in rows if r["source"] != "src0")
    na, nb = len(a), len(b)
    assert (eng["na"], eng["nb"]) == (na, nb)
    values = sorted(set(a) | set(b))
    assert eng["n_values"] == len(values)
    dplus = dminus = 0
    ca = cb = 0
    ia = ib = 0
    for v in values:
        while ia < na and a[ia] <= v:
            ia += 1
        while ib < nb and b[ib] <= v:
            ib += 1
        ca, cb = ia, ib
        dplus = max(dplus, ca * nb - cb * na)
        dminus = max(dminus, cb * na - ca * nb)
    assert eng["dplus_num"] == dplus
    assert eng["dminus_num"] == dminus
    assert eng["kuiper_v"] == (dplus + dminus) / (na * nb)
    ks = SPECS["quality_ks_drift_nchars"].fn(spark, sf_small).collect()[0]
    assert eng["kuiper_v"] >= ks["ks_d"] - 1e-15


def test_blomqvist_beta_replay_and_partition_law(spark, sf_small):
    """Lower-median + quadrant-count replay; the five counts must
    partition the grid exactly and beta must be the signed quadrant
    ratio."""
    eng = SPECS["quality_blomqvist_beta_hourly"].fn(
        spark, sf_small
    ).collect()[0]
    pts = _hourly_xy(spark, sf_small)
    n = len(pts)
    xs = sorted(p[0] for p in pts)
    ys = sorted(p[1] for p in pts)
    med_x = xs[(n + 1) // 2 - 1]
    med_y = ys[(n + 1) // 2 - 1]
    assert (eng["med_x"], eng["med_y"]) == (med_x, med_y)
    npp = sum(1 for x, y in pts if x > med_x and y > med_y)
    nmm = sum(1 for x, y in pts if x < med_x and y < med_y)
    npm = sum(1 for x, y in pts if x > med_x and y < med_y)
    nmp = sum(1 for x, y in pts if x < med_x and y > med_y)
    non = sum(1 for x, y in pts if x == med_x or y == med_y)
    assert (eng["n_pp"], eng["n_mm"], eng["n_pm"], eng["n_mp"]) == (
        npp, nmm, npm, nmp,
    )
    assert eng["n_on_median"] == non
    assert npp + nmm + npm + nmp + non == n == eng["n_hours"]
    denom = npp + nmm + npm + nmp
    assert eng["beta"] == (npp + nmm - npm - nmp) / denom
    assert -1.0 <= eng["beta"] <= 1.0


def test_frequent_pairs_stream_matches_python_replay(spark, sf_small):
    """The streamed per-user bitmask fold must land exactly on the
    batch truth: python replay of per-user type sets → pair supports,
    plus the anti-monotone Apriori law support(AB) <= min(support(A),
    support(B))."""
    from kafka_stream_processing_spark.streaming.stateful import (
        PAIR_TYPES,
    )

    rows = (
        table(spark, sf_small, "events")
        .select("user_id", "event_type")
        .collect()
    )
    seen: dict[int, set] = {}
    for r in rows:
        seen.setdefault(r["user_id"], set()).add(r["event_type"])
    n_users = len(seen)
    singles = {
        t: sum(1 for s in seen.values() if t in s) for t in PAIR_TYPES
    }
    out = {
        (r["type_a"], r["type_b"]): r
        for r in SPECS["stream_frequent_pairs_stateful"].fn(
            spark, sf_small
        ).collect()
    }
    assert len(out) == len(PAIR_TYPES) * (len(PAIR_TYPES) - 1) // 2
    for (ta, tb), r in out.items():
        both = sum(
            1 for s in seen.values() if ta in s and tb in s
        )
        assert r["n_users_both"] == both
        assert r["n_users_total"] == n_users
        assert r["support"] == both / n_users
        assert r["n_users_both"] <= min(singles[ta], singles[tb])


def test_watson_u2_replay_and_rotation_invariance(spark, sf_small):
    """Integer replay of u2_num from raw rows, plus the theorem the op
    exists for: cyclically rotating the (binned) support leaves u2_num
    EXACTLY unchanged — checked for several shifts in exact integers."""
    eng = SPECS["quality_watson_u2_drift"].fn(
        spark, sf_small
    ).collect()[0]
    rows = (
        table(spark, sf_small, "documents")
        .select("n_chars", "source")
        .collect()
    )
    a = [r["n_chars"] for r in rows if r["source"] == "src0"]
    b = [r["n_chars"] for r in rows if r["source"] != "src0"]
    na, nb = len(a), len(b)

    def u2_num(avals, bvals):
        values = sorted(set(avals) | set(bvals))
        from collections import Counter

        ca_h, cb_h = Counter(avals), Counter(bvals)
        ca = cb = 0
        s1 = s2 = 0
        for v in values:
            ca += ca_h[v]
            cb += cb_h[v]
            m = ca_h[v] + cb_h[v]
            g = ca * nb - cb * na
            s1 += m * g
            s2 += m * g * g
        return (na + nb) * s2 - s1 * s1

    base = u2_num(a, b)
    assert eng["u2_num"] == base
    assert eng["watson_u2"] == base / (na * nb * (na + nb) ** 3)
    mod = max(a + b) + 1
    for shift in (1, 7, mod // 3, mod - 2):
        ar = [(v + shift) % mod for v in a]
        br = [(v + shift) % mod for v in b]
        assert u2_num(ar, br) == base, f"shift {shift} broke invariance"


def test_circadian_drift_replay_and_dial_rotation(spark, sf_small):
    """Replay both circular statistics from raw hour-of-day samples
    and pin the dial-rotation theorem: u2_num AND the Kuiper gap SUM
    are exactly invariant under (h + s) % 24 for every shift s."""
    import pyspark.sql.functions as F
    from collections import Counter

    eng = SPECS["quality_circadian_drift_clicks_purchases"].fn(
        spark, sf_small
    ).collect()[0]
    rows = (
        table(spark, sf_small, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(F.hour("ts").alias("h"), "event_type")
        .collect()
    )
    a = [r["h"] for r in rows if r["event_type"] == "click"]
    b = [r["h"] for r in rows if r["event_type"] == "purchase"]
    na, nb = len(a), len(b)
    assert (eng["na"], eng["nb"]) == (na, nb)

    def stats(avals, bvals):
        ca_h, cb_h = Counter(avals), Counter(bvals)
        ca = cb = s1 = s2 = 0
        dplus = dminus = 0
        for v in sorted(set(avals) | set(bvals)):
            ca += ca_h[v]
            cb += cb_h[v]
            m = ca_h[v] + cb_h[v]
            g = ca * nb - cb * na
            s1 += m * g
            s2 += m * g * g
            dplus = max(dplus, g)
            dminus = max(dminus, -g)
        return (
            (na + nb) * s2 - s1 * s1,
            max(0, dplus) + max(0, dminus),
        )

    u2_base, v_base = stats(a, b)
    assert eng["u2_num"] == u2_base
    assert eng["dplus_num"] + eng["dminus_num"] == v_base
    assert eng["watson_u2"] == u2_base / (na * nb * (na + nb) ** 3)
    assert eng["kuiper_v"] == v_base / (na * nb)
    for shift in range(1, 24):
        ar = [(h + shift) % 24 for h in a]
        br = [(h + shift) % 24 for h in b]
        u2_r, v_r = stats(ar, br)
        assert u2_r == u2_base, f"U2 broke at shift {shift}"
        assert v_r == v_base, f"Kuiper broke at shift {shift}"


def test_stream_circadian_monitor_chunk_replay(spark, sf_small):
    """Python replay of the deterministic (ts, event_id)-sorted
    third-chunking and of each chunk's u2_num / gap sums — the stream's
    per-trigger folds must land exactly on the replayed integers, and
    the chunks' totals must add up to the whole-corpus click/purchase
    counts."""
    import pyspark.sql.functions as F
    from collections import Counter

    out = {
        r["chunk_min_event_id"]: r
        for r in SPECS["stream_circadian_monitor"].fn(
            spark, sf_small
        ).collect()
    }
    rows = (
        table(spark, sf_small, "events")
        .select(
            F.unix_micros("ts").alias("us"),
            "event_id",
            F.hour("ts").alias("h"),
            "event_type",
        )
        .collect()
    )
    ordered = sorted(rows, key=lambda r: (r["us"], r["event_id"]))
    n = len(ordered)
    size = (n + 2) // 3
    tot_na = tot_nb = 0
    seen_chunks = 0
    for c in range(3):
        chunk = ordered[c * size : (c + 1) * size]
        if not chunk:
            continue
        seen_chunks += 1
        key = min(r["event_id"] for r in chunk)
        a = [r["h"] for r in chunk if r["event_type"] == "click"]
        b = [r["h"] for r in chunk if r["event_type"] == "purchase"]
        na, nb = len(a), len(b)
        tot_na += na
        tot_nb += nb
        ca_h, cb_h = Counter(a), Counter(b)
        ca = cb = s1 = s2 = 0
        dplus = dminus = 0
        for v in sorted(set(a) | set(b)):
            ca += ca_h[v]
            cb += cb_h[v]
            m = ca_h[v] + cb_h[v]
            g = ca * nb - cb * na
            s1 += m * g
            s2 += m * g * g
            dplus = max(dplus, g)
            dminus = max(dminus, -g)
        eng = out[key]
        assert (eng["na"], eng["nb"]) == (na, nb)
        assert eng["u2_num"] == (na + nb) * s2 - s1 * s1
        if na and nb:
            assert eng["watson_u2"] == eng["u2_num"] / (
                na * nb * (na + nb) ** 3
            )
            assert eng["kuiper_v"] == (
                max(0, dplus) + max(0, dminus)
            ) / (na * nb)
    assert len(out) == seen_chunks
    batch = SPECS["quality_circadian_drift_clicks_purchases"].fn(
        spark, sf_small
    ).collect()[0]
    assert (batch["na"], batch["nb"]) == (tot_na, tot_nb)


def test_cucconi_replay_and_sensitivity(spark, sf_small):
    """Exact squared-midrank sums replayed from raw values; C
    recomputed in python floats must match the engine's shared-SQL
    evaluation; and the test's own power sanity: injecting a large
    location shift OR a pure scale inflation into sample A must raise
    the replayed C far above the null-ish observed value."""
    import math

    eng = SPECS["quality_cucconi_drift"].fn(spark, sf_small).collect()[0]
    rows = (
        table(spark, sf_small, "documents")
        .select("n_chars", "source")
        .collect()
    )
    a = [r["n_chars"] for r in rows if r["source"] == "src0"]
    b = [r["n_chars"] for r in rows if r["source"] != "src0"]

    def sums(avals, bvals):
        from collections import Counter

        allv = Counter(avals) + Counter(bvals)
        ca_h = Counter(avals)
        lt = 0
        s4 = t4 = 0
        n = len(avals) + len(bvals)
        for v in sorted(allv):
            m = allv[v]
            r2 = 2 * lt + m + 1  # doubled midrank
            r2c = 2 * (n + 1) - r2
            s4 += ca_h[v] * r2 * r2
            t4 += ca_h[v] * r2c * r2c
            lt += m
        return s4, t4

    def c_stat(s4, t4, na, nb):
        n = na + nb
        mean = na * (n + 1) * (2 * n + 1) / 6.0
        var = na * nb * (n + 1) * (2 * n + 1) * (8 * n + 11) / 180.0
        u = (s4 / 4.0 - mean) / math.sqrt(var)
        v = (t4 / 4.0 - mean) / math.sqrt(var)
        rho = 2.0 * (n * n - 4.0) / ((2 * n + 1) * (8 * n + 11)) - 1.0
        return (u * u + v * v - 2 * rho * u * v) / (
            2.0 * (1.0 - rho * rho)
        )

    na, nb = len(a), len(b)
    s4, t4 = sums(a, b)
    assert (eng["na"], eng["nb"]) == (na, nb)
    assert (eng["s4"], eng["t4"]) == (s4, t4)
    c = c_stat(s4, t4, na, nb)
    assert abs(eng["cucconi_c"] - c) < 1e-9
    assert abs(eng["p_asymptotic"] - math.exp(-c)) < 1e-12
    # power sanity on the replay: shift and scale disturbances both
    # blow up C
    shifted = [v + 10_000 for v in a]
    assert c_stat(*sums(shifted, b), na, nb) > max(10.0, 5 * c)
    center = sorted(a)[len(a) // 2]
    inflated = [center + 50 * (v - center) for v in a]
    assert c_stat(*sums(inflated, b), na, nb) > max(10.0, 5 * c)


def test_mood_replay_and_triad_consistency(spark, sf_small):
    """Exact M4 replay from raw values; z recomputed in python floats;
    and the triad consistency sanity on the replay: a pure scale
    inflation of sample A must blow up |z_mood| while a pure location
    shift (which keeps A's ranks contiguous) must NOT trip the scale
    gate anywhere near as hard as it trips MW."""
    import math
    from collections import Counter

    eng = SPECS["quality_mood_scale_drift"].fn(
        spark, sf_small
    ).collect()[0]
    rows = (
        table(spark, sf_small, "documents")
        .select("n_chars", "source")
        .collect()
    )
    a = [r["n_chars"] for r in rows if r["source"] == "src0"]
    b = [r["n_chars"] for r in rows if r["source"] != "src0"]
    na, nb = len(a), len(b)

    def m4_of(avals, bvals):
        allv = Counter(avals) + Counter(bvals)
        ca_h = Counter(avals)
        n = len(avals) + len(bvals)
        lt = 0
        m4 = 0
        for v in sorted(allv):
            m = allv[v]
            r2 = 2 * lt + m + 1
            m4 += ca_h[v] * (r2 - (n + 1)) ** 2
            lt += m
        return m4

    def z_of(m4):
        n = na + nb
        mean = na * (n * n - 1) / 12.0
        var = na * nb * (n + 1) * (n * n - 4.0) / 180.0
        return (m4 / 4.0 - mean) / math.sqrt(var)

    m4 = m4_of(a, b)
    assert (eng["na"], eng["nb"]) == (na, nb)
    assert eng["m4"] == m4
    assert abs(eng["z_mood"] - z_of(m4)) < 1e-9
    # scale inflation around A's median → strong positive z
    center = sorted(a)[len(a) // 2]
    inflated = [center + 50 * (v - center) for v in a]
    assert z_of(m4_of(inflated, b)) > max(5.0, abs(eng["z_mood"]) * 3)


def test_lm_train_heldout_gap_replay(spark, sf_small):
    """Full python replay of the Laplace LM and both surprisal sums
    (half-up 6-decimal quantization mirroring the engines' round()),
    plus the partition laws: tokens split exactly, and every held-out
    OOV token scores exactly the UNK surprisal."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from kafka_stream_processing_spark.operators.quality_lm import HELDOUT_MOD

    eng = SPECS["quality_lm_train_heldout_gap"].fn(
        spark, sf_small
    ).collect()[0]
    rows = (
        table(spark, sf_small, "documents")
        .select("doc_id", "text")
        .collect()
    )
    train_toks: Counter = Counter()
    held_toks: Counter = Counter()
    n_train_docs = n_held_docs = 0
    for r in rows:
        words = r["text"].split(" ")
        if r["doc_id"] % HELDOUT_MOD == 0:
            n_held_docs += 1
            held_toks.update(words)
        else:
            n_train_docs += 1
            train_toks.update(words)
    assert (eng["n_train_docs"], eng["n_heldout_docs"]) == (
        n_train_docs,
        n_held_docs,
    )
    n_tok = sum(train_toks.values())
    v = len(train_toks)
    assert eng["train_tokens"] == n_tok
    assert eng["heldout_tokens"] == sum(held_toks.values())

    def q6(x: float) -> Decimal:
        return Decimal(x).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )

    denom = n_tok + v + 1
    surp = {
        w: q6(-math.log((c + 1) / denom))
        for w, c in train_toks.items()
    }
    unk = q6(-math.log(1.0 / denom))
    ts = sum(k * surp[w] for w, k in train_toks.items())
    hs = sum(
        k * surp.get(w, unk) for w, k in held_toks.items()
    )
    oov = sum(k for w, k in held_toks.items() if w not in surp)
    assert eng["heldout_oov_tokens"] == oov
    mt = float(ts) / n_tok
    mh = float(hs) / sum(held_toks.values())
    assert abs(eng["mean_surprisal_train"] - mt) < 1e-9
    assert abs(eng["mean_surprisal_heldout"] - mh) < 1e-9
    assert abs(eng["generalization_gap"] - (mh - mt)) < 1e-9
