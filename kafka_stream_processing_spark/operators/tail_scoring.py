"""Distribution-tail audits and proper-scoring-rule forecast evals
(round 13): Hill tail-index / peaks-over-threshold, L-moments,
pinball-loss and empirical-CRPS scoring of calendar-window quantile
forecasters, and a split-conformal coverage audit.

These close the gap a 100 TB training-data pipeline has after point
forecasts and drift tests exist: HOW heavy are the tails feeding the
pipeline (Hill/POT, L-kurtosis), and are the uncertainty estimates it
ships CALIBRATED (pinball, CRPS, conformal coverage)?

House exactness rules throughout: exact DECIMAL/BIGINT sums
(order-independent), shared fixed-order expression texts evaluated by
BOTH engines (the ``_THETA_B_SQL`` precedent), integer rank selection
for every order statistic (never engine quantile builtins, which
disagree on interpolation), and ``frontier.global_rank(
mode="distributed")`` for the engine-side global order statistic (no
single-task total sort on the production path — the r12 verdict's
frontier rule, wired from day one).

Reference anchor: the reference computes windowed aggregates over an
event stream (UniqueUsersCounter.java:74-88); these ops extend the
same daily-rollup spine (events -> day grid -> exact sums) to tail
and calibration statistics a data-quality deployment of that topology
would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_stream_processing_spark.functions.exact import dec
from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import fanout, table

# ---------------------------------------------------------------------------
# Hill tail index + peaks-over-threshold, per source
# ---------------------------------------------------------------------------

#: Hill order-statistic count: the K largest doc lengths per source
#: (K+1 needed; smallest source has 25 docs at the test SFs).
HILL_K = 10
#: POT threshold on n_chars (chars; ~90th percentile of the corpus).
POT_THRESHOLD_CHARS = 400

HILL_POT_ORACLE = f"""
WITH ranked AS (
    SELECT source, n_chars, doc_id,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) AS r,
           count(*) OVER (PARTITION BY source) AS n_docs
    FROM documents
),
topk AS (
    SELECT source,
           CAST(MAX(n_docs) AS BIGINT) AS n_docs,
           SUM(CASE WHEN r <= {HILL_K}
                    THEN CAST(round(ln(CAST(n_chars AS DOUBLE)), 12)
                              AS DECIMAL(28,12)) END) AS sum_ln_top,
           MAX(CASE WHEN r = {HILL_K} + 1
                    THEN round(ln(CAST(n_chars AS DOUBLE)), 12)
               END) AS ln_xk1
    FROM ranked GROUP BY 1
    HAVING MAX(n_docs) >= {HILL_K} + 1
),
pot AS (
    SELECT source,
           CAST(SUM(CASE WHEN n_chars > {POT_THRESHOLD_CHARS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed,
           CAST(SUM(CASE WHEN n_chars > {POT_THRESHOLD_CHARS}
                         THEN n_chars - {POT_THRESHOLD_CHARS}
                         ELSE 0 END) AS BIGINT) AS sum_excess
    FROM documents GROUP BY 1
)
SELECT t.source,
       t.n_docs,
       CAST(t.sum_ln_top AS DOUBLE) / {HILL_K} - t.ln_xk1 AS hill_h,
       1.0 / (CAST(t.sum_ln_top AS DOUBLE) / {HILL_K} - t.ln_xk1)
           AS hill_alpha,
       p.n_exceed,
       CASE WHEN p.n_exceed > 0
            THEN CAST(p.sum_excess AS DOUBLE)
                 / CAST(p.n_exceed AS DOUBLE) END AS mean_excess,
       CAST(p.n_exceed AS DOUBLE) / CAST(t.n_docs AS DOUBLE)
           AS exceed_share
FROM topk t JOIN pot p ON p.source = t.source
"""


@register(
    "quality_hill_tail_index",
    oracle=HILL_POT_ORACLE,
    tags=("quality", "tails", "statistics"),
)
def quality_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimate plus a peaks-over-threshold excess
    audit of the per-source document-length distribution (Hill, Ann.
    Stat. 1975; the POT mean-excess readout is the empirical
    complement — for a GPD tail the mean excess is linear in the
    threshold).  Heavy-tailed length distributions are what break
    token-budget packing and batch-shape assumptions downstream, so
    the tail index is a first-class corpus-quality statistic.

    Hill over the K={HILL_K} largest lengths per source (r <= K) with
    the (K+1)-th as the threshold order statistic:
    H = mean(ln x_(i)) - ln x_(K+1), alpha = 1/H.  The ln values are
    round-12 then summed as exact DECIMAL (order-independent — the
    repo-wide round-12 double pattern); the order statistics are
    integer-rank selections over a (n_chars DESC, doc_id) total order,
    never an interpolating quantile builtin.  POT columns are pure
    BIGINT sums over a literal threshold.

    Scale: one hash-partitioned per-source window rank (no global
    sort), one map-side-combined aggregate per branch, join on the
    source key.  At 100 TB the per-source rank is the classic top-K
    pattern; K is a literal so state per source is O(K)."""
    d = fanout(table(spark, sf_dir, "documents"))
    ranked = d.select(
        "source",
        "n_chars",
        "doc_id",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.desc("n_chars"), "doc_id"
            )
        )
        .alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .alias("n_docs"),
    )
    ln12 = F.round(F.log(F.col("n_chars").cast("double")), 12)
    topk = (
        ranked.groupBy("source")
        .agg(
            F.max("n_docs").cast("bigint").alias("n_docs"),
            F.sum(
                F.when(
                    F.col("r") <= HILL_K,
                    ln12.cast("decimal(28,12)"),
                )
            ).alias("sum_ln_top"),
            F.max(F.when(F.col("r") == HILL_K + 1, ln12)).alias(
                "ln_xk1"
            ),
        )
        .filter(F.col("n_docs") >= HILL_K + 1)
    )
    exceed = F.col("n_chars") > POT_THRESHOLD_CHARS
    pot = d.groupBy("source").agg(
        F.sum(F.when(exceed, 1).otherwise(0))
        .cast("bigint")
        .alias("n_exceed"),
        F.sum(
            F.when(
                exceed, F.col("n_chars") - POT_THRESHOLD_CHARS
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("sum_excess"),
    )
    h = (
        F.col("sum_ln_top").cast("double") / F.lit(HILL_K)
        - F.col("ln_xk1")
    )
    return topk.join(pot, "source").select(
        "source",
        "n_docs",
        h.alias("hill_h"),
        (F.lit(1.0) / h).alias("hill_alpha"),
        "n_exceed",
        F.when(
            F.col("n_exceed") > 0,
            F.col("sum_excess").cast("double")
            / F.col("n_exceed").cast("double"),
        ).alias("mean_excess"),
        (
            F.col("n_exceed").cast("double")
            / F.col("n_docs").cast("double")
        ).alias("exceed_share"),
    )


# ---------------------------------------------------------------------------
# L-moments of the daily revenue series, per event type
# ---------------------------------------------------------------------------

#: Shared fixed-order final expressions over (n, s0..s3 -> b0..b3) —
#: evaluated verbatim by BOTH engines (the _THETA_B_SQL precedent).
_LM_B_SQL = {
    r: f"(CAST(s{r} AS DOUBLE) / CAST(d{r} AS DOUBLE))" for r in range(4)
}
_LM_L2_SQL = "(2.0 * b1 - b0)"
_LM_FINAL_SQL = {
    "l1": "b0",
    "l2": _LM_L2_SQL,
    "l_cv": f"({_LM_L2_SQL} / b0)",
    "t3": f"((6.0 * b2 - 6.0 * b1 + b0) / {_LM_L2_SQL})",
    "t4": f"((20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0) / {_LM_L2_SQL})",
}

L_MOMENTS_ORACLE = f"""
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           SUM(CAST(value AS DECIMAL(18,6))) AS x
    FROM events GROUP BY 1, 2
),
idx AS (
    SELECT event_type, x,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY x, day) AS i
    FROM daily
),
sums AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           SUM(CAST(x AS DECIMAL(38,6))) AS s0,
           SUM(CAST(x * (i - 1) AS DECIMAL(38,6))) AS s1,
           SUM(CAST(x * (((i - 1) * (i - 2)) // 2)
                    AS DECIMAL(38,6))) AS s2,
           SUM(CAST(x * (((i - 1) * (i - 2) * (i - 3)) // 6)
                    AS DECIMAL(38,6))) AS s3
    FROM idx GROUP BY 1
    HAVING count(*) >= 4
),
dens AS (
    SELECT event_type, n, s0, s1, s2, s3,
           n AS d0,
           n * (n - 1) AS d1,
           (n * (n - 1) * (n - 2)) // 2 AS d2,
           (n * (n - 1) * (n - 2) * (n - 3)) // 6 AS d3
    FROM sums
),
bs AS MATERIALIZED (
    SELECT event_type, n,
           {_LM_B_SQL[0]} AS b0,
           {_LM_B_SQL[1]} AS b1,
           {_LM_B_SQL[2]} AS b2,
           {_LM_B_SQL[3]} AS b3
    FROM dens
)
SELECT event_type,
       n AS n_days,
       {_LM_FINAL_SQL["l1"]} AS l1,
       {_LM_FINAL_SQL["l2"]} AS l2,
       {_LM_FINAL_SQL["l_cv"]} AS l_cv,
       {_LM_FINAL_SQL["t3"]} AS t3,
       {_LM_FINAL_SQL["t4"]} AS t4
FROM bs
"""


@register(
    "window_l_moments_daily",
    oracle=L_MOMENTS_ORACLE,
    tags=("windowed", "timeseries", "statistics", "tails"),
)
def window_l_moments_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-moments (Hosking, JRSS-B 1990) of the per-type daily revenue
    distribution: L-location, L-scale, L-CV, L-skewness (t3) and
    L-kurtosis (t4).  L-moments are the order-statistics counterpart
    of conventional moments — defined whenever the mean exists, far
    more robust for the heavy-tailed daily totals this corpus carries,
    and the standard basis for regional frequency analysis of
    extremes (pairs with quality_hill_tail_index).

    Exactness: the unbiased estimators reduce to order-weighted sums
    B_r = SUM x_(i) * C(i-1, r) with INTEGER binomial weights, so the
    entire computation up to the final ratios is exact arithmetic —
    DECIMAL(38,6) weighted sums over exact daily DECIMAL totals,
    BIGINT denominators n*C(n-1,r) (day-count sized, no overflow),
    then b_r and the lambda/tau combinations evaluated from ONE shared
    fixed-order expression text in both engines.  Value ties in x get
    equal weights under any rank tie-break, so the (x, day) total
    order is deterministic AND tie-insensitive.

    Scale: the rank is per-series (hash-partitioned by event_type,
    day-grid bounded — never a global sort); the weighted sums are one
    map-side-combined aggregate.  At 100 TB with per-key series the
    same shape holds per key."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.sum(dec("value")).alias("x"))
    )
    idx = daily.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("x", "day"))
        .alias("i"),
    )
    i1 = F.col("i") - 1
    sums = (
        idx.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("x").cast("decimal(38,6)")).alias("s0"),
            F.sum((F.col("x") * i1).cast("decimal(38,6)")).alias("s1"),
            F.sum(
                (
                    F.col("x")
                    * F.expr("((i - 1) * (i - 2)) div 2")
                ).cast("decimal(38,6)")
            ).alias("s2"),
            F.sum(
                (
                    F.col("x")
                    * F.expr("((i - 1) * (i - 2) * (i - 3)) div 6")
                ).cast("decimal(38,6)")
            ).alias("s3"),
        )
        .filter(F.col("n") >= 4)
    )
    dens = sums.select(
        "event_type",
        "n",
        "s0",
        "s1",
        "s2",
        "s3",
        F.col("n").alias("d0"),
        (F.col("n") * (F.col("n") - 1)).alias("d1"),
        F.expr("(n * (n - 1) * (n - 2)) div 2").alias("d2"),
        F.expr("(n * (n - 1) * (n - 2) * (n - 3)) div 6").alias("d3"),
    )
    bs = dens.select(
        "event_type",
        "n",
        *[F.expr(_LM_B_SQL[r]).alias(f"b{r}") for r in range(4)],
    )
    return bs.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.expr(_LM_FINAL_SQL["l1"]).alias("l1"),
        F.expr(_LM_FINAL_SQL["l2"]).alias("l2"),
        F.expr(_LM_FINAL_SQL["l_cv"]).alias("l_cv"),
        F.expr(_LM_FINAL_SQL["t3"]).alias("t3"),
        F.expr(_LM_FINAL_SQL["t4"]).alias("t4"),
    )


# ---------------------------------------------------------------------------
# Pinball-loss scoring of the trailing-window empirical-quantile
# forecaster
# ---------------------------------------------------------------------------

#: Trailing calendar window (days) forming the forecast ensemble.
PINBALL_WINDOW = 28
#: (tau as an exact DECIMAL(2,1) literal string, 1-based type-1
#: quantile rank ceil(tau * W)) — integer ranks, no interpolation.
PINBALL_TAUS = (("0.1", 3), ("0.5", 14), ("0.9", 26))


def _daily_total_sql() -> str:
    return """
daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE)
               - DATE '1970-01-01' AS d,
           SUM(CAST(value AS DECIMAL(18,6))) AS x
    FROM events GROUP BY 1
)"""


PINBALL_ORACLE = f"""
WITH {_daily_total_sql().lstrip()},
win AS (
    SELECT c.d, c.x AS y, p.x AS m,
           row_number() OVER (PARTITION BY c.d
                              ORDER BY p.x, p.d) AS r,
           count(*) OVER (PARTITION BY c.d) AS w
    FROM daily c JOIN daily p
      ON p.d >= c.d - {PINBALL_WINDOW} AND p.d <= c.d - 1
),
q AS MATERIALIZED (
    SELECT d, MAX(y) AS y,
           {", ".join(f"MAX(CASE WHEN r = {rk} THEN m END) AS q_{i}" for i, (_, rk) in enumerate(PINBALL_TAUS))}
    FROM win WHERE w = {PINBALL_WINDOW} GROUP BY d
)
{" UNION ALL ".join(
    f'''SELECT CAST({tau} AS DOUBLE) AS tau,
       CAST({rk} AS BIGINT) AS q_rank,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(SUM(CAST(GREATEST(CAST({tau} AS DECIMAL(2,1)) * (y - q_{i}),
                              (CAST({tau} AS DECIMAL(2,1)) - 1) * (y - q_{i}))
                     AS DECIMAL(38,7))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg_pinball,
       CAST(SUM(CASE WHEN y <= q_{i} THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS coverage
FROM q'''
    for i, (tau, rk) in enumerate(PINBALL_TAUS)
)}
"""


@register(
    "window_pinball_loss_daily",
    oracle=PINBALL_ORACLE,
    tags=("windowed", "timeseries", "forecast", "scoring"),
)
def window_pinball_loss_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pinball (quantile) loss and empirical coverage of the trailing
    {PINBALL_WINDOW}-day empirical-quantile forecaster on total daily
    revenue, at tau in {{0.1, 0.5, 0.9}} — the proper scoring rule for
    quantile forecasts (Koenker & Bassett 1978) that the forecast
    family (Theta/Holt/SES point models) previously had no
    uncertainty-side counterpart for.  Coverage vs tau is the
    calibration readout: a well-calibrated 0.9 quantile covers ~90%
    of days.

    Exactness: the forecast is the type-1 (discrete) quantile — the
    ceil(tau*W)-th smallest of the W calendar-window members, an
    INTEGER-rank order statistic (never an interpolating quantile
    builtin); days with an incomplete window (calendar gaps) are
    dropped in both engines (w = {PINBALL_WINDOW} filter).  The loss
    max(tau*(y-q), (tau-1)*(y-q)) is computed entirely in DECIMAL
    (tau is an exact DECIMAL(2,1) literal), summed exactly, with ONE
    final double division per output cell — zero float rounding
    anywhere in the accumulation.

    Scale: the day-grid self-join is calendar-bounded (W rows per
    day), the per-day rank windows are day-partitioned; nothing
    scales with raw event count except the first map-side-combined
    daily rollup."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(dec("value")).alias("x"))
        .select(
            F.datediff(
                "day", F.lit("1970-01-01").cast("date")
            ).alias("d"),
            "x",
        )
    )
    c, p = daily.alias("c"), daily.alias("p")
    win = (
        c.join(
            p,
            (F.col("p.d") >= F.col("c.d") - PINBALL_WINDOW)
            & (F.col("p.d") <= F.col("c.d") - 1),
        )
        .select(
            F.col("c.d").alias("d"),
            F.col("c.x").alias("y"),
            F.col("p.x").alias("m"),
            F.col("p.d").alias("pd"),
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("d").orderBy("m", "pd")
            ),
        )
        .withColumn(
            "w", F.count(F.lit(1)).over(Window.partitionBy("d"))
        )
    )
    q = (
        win.filter(F.col("w") == PINBALL_WINDOW)
        .groupBy("d")
        .agg(
            F.max("y").alias("y"),
            *[
                F.max(F.when(F.col("r") == rk, F.col("m"))).alias(
                    f"q_{i}"
                )
                for i, (_, rk) in enumerate(PINBALL_TAUS)
            ],
        )
    )
    parts = []
    for i, (tau, rk) in enumerate(PINBALL_TAUS):
        tdec = F.expr(f"CAST({tau} AS DECIMAL(2,1))")
        diff = F.col("y") - F.col(f"q_{i}")
        loss = F.greatest(
            tdec * diff, (tdec - F.lit(1)) * diff
        ).cast("decimal(38,7)")
        parts.append(
            q.agg(
                F.lit(float(tau)).alias("tau"),
                F.lit(rk).cast("bigint").alias("q_rank"),
                F.count(F.lit(1)).cast("bigint").alias("n_days"),
                (
                    F.sum(loss).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("avg_pinball"),
                (
                    F.sum(
                        F.when(
                            F.col("y") <= F.col(f"q_{i}"), 1
                        ).otherwise(0)
                    ).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("coverage"),
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


# ---------------------------------------------------------------------------
# Empirical CRPS of the same trailing-window ensemble, per day
# ---------------------------------------------------------------------------

CRPS_ORACLE = f"""
WITH {_daily_total_sql().lstrip()},
win AS (
    SELECT c.d, c.x AS y, p.x AS m, p.d AS pd,
           count(*) OVER (PARTITION BY c.d) AS w
    FROM daily c JOIN daily p
      ON p.d >= c.d - {PINBALL_WINDOW} AND p.d <= c.d - 1
),
full_win AS MATERIALIZED (
    SELECT d, y, m, pd FROM win WHERE w = {PINBALL_WINDOW}
),
t1 AS (
    SELECT d, MAX(y) AS y,
           SUM(CAST(abs(m - y) AS DECIMAL(38,6))) AS s1
    FROM full_win GROUP BY d
),
t2 AS (
    SELECT a.d, SUM(CAST(abs(a.m - b.m) AS DECIMAL(38,6))) AS s2
    FROM full_win a JOIN full_win b ON b.d = a.d
    GROUP BY a.d
)
SELECT t1.d AS d_epoch,
       CAST(t1.y AS DOUBLE) AS actual,
       CAST(t1.s1 AS DOUBLE) / {PINBALL_WINDOW}.0 AS mae_term,
       CAST(t1.s1 AS DOUBLE) / {PINBALL_WINDOW}.0
           - CAST(t2.s2 AS DOUBLE)
             / (2.0 * {PINBALL_WINDOW}.0 * {PINBALL_WINDOW}.0) AS crps
FROM t1 JOIN t2 ON t2.d = t1.d
"""


@register(
    "window_crps_empirical_daily",
    oracle=CRPS_ORACLE,
    tags=("windowed", "timeseries", "forecast", "scoring"),
)
def window_crps_empirical_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-day continuous ranked probability score of the trailing
    {PINBALL_WINDOW}-day empirical-distribution forecaster, via the
    exact energy form CRPS(F_emp, y) = mean|m_i - y|
    - mean|m_i - m_j|/2 (Gneiting & Raftery, JASA 2007, eq. 21) —
    the full-distribution companion of window_pinball_loss_daily's
    per-quantile scores (CRPS integrates pinball loss over all tau).

    Exactness: both energy terms are sums of absolute differences of
    exact DECIMAL daily totals — computed entirely in DECIMAL(38,6),
    order-independent, with the two literal-W divisions as the only
    float operations (identically nested in both engines).  The
    member-pair term is the FULL W x W grid including the zero
    diagonal, exactly as the estimator is defined.

    Scale: pairs are day-grid bounded (W^2 = {PINBALL_WINDOW}**2 rows
    per scored day — a calendar-sized blowup, independent of raw event
    count); both terms are single hashed aggregates partitioned by
    day.  The first daily rollup is the only stage that sees raw
    events."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(dec("value")).alias("x"))
        .select(
            F.datediff(
                "day", F.lit("1970-01-01").cast("date")
            ).alias("d"),
            "x",
        )
    )
    c, p = daily.alias("c"), daily.alias("p")
    win = (
        c.join(
            p,
            (F.col("p.d") >= F.col("c.d") - PINBALL_WINDOW)
            & (F.col("p.d") <= F.col("c.d") - 1),
        )
        .select(
            F.col("c.d").alias("d"),
            F.col("c.x").alias("y"),
            F.col("p.x").alias("m"),
            F.col("p.d").alias("pd"),
        )
        .withColumn(
            "w", F.count(F.lit(1)).over(Window.partitionBy("d"))
        )
        .filter(F.col("w") == PINBALL_WINDOW)
        .drop("w")
    )
    t1 = win.groupBy("d").agg(
        F.max("y").alias("y"),
        F.sum(
            F.abs(F.col("m") - F.col("y")).cast("decimal(38,6)")
        ).alias("s1"),
    )
    a, b = win.alias("a"), win.alias("b")
    t2 = (
        a.join(b, F.col("b.d") == F.col("a.d"))
        .groupBy(F.col("a.d").alias("d"))
        .agg(
            F.sum(
                F.abs(F.col("a.m") - F.col("b.m")).cast(
                    "decimal(38,6)"
                )
            ).alias("s2")
        )
    )
    wlit = float(PINBALL_WINDOW)
    mae = F.col("s1").cast("double") / F.lit(wlit)
    return t1.join(t2, "d").select(
        F.col("d").alias("d_epoch"),
        F.col("y").cast("double").alias("actual"),
        mae.alias("mae_term"),
        (
            mae
            - F.col("s2").cast("double")
            / (F.lit(2.0) * F.lit(wlit) * F.lit(wlit))
        ).alias("crps"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction-interval coverage audit
# ---------------------------------------------------------------------------

#: Hash-split cuts on hash64(doc_id) % 100: train < CAL_LO,
#: calibration in [CAL_LO, TEST_LO), test >= TEST_LO.
CONFORMAL_CAL_LO = 50
CONFORMAL_TEST_LO = 80
#: Miscoverage levels audited: (alpha literal, numerator/denominator
#: of 1 - alpha as integers for the exact ceil rank).
CONFORMAL_ALPHAS = (("0.1", 9, 10), ("0.2", 8, 10))

#: Shared fixed-order OLS + residual texts (the _THETA_B_SQL
#: precedent) over exact BIGINT sums (x, y are integers).
_CONF_B_SQL = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)
_CONF_A_SQL = "((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))"
_CONF_RESID_SQL = "abs(CAST(y AS DOUBLE) - (a + b * CAST(x AS DOUBLE)))"

_CONF_SPLIT_SQL = (
    "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
    " AS BIGINT) % 100)"
)

CONFORMAL_ORACLE = f"""
WITH feat AS (
    SELECT doc_id,
           {_CONF_SPLIT_SQL} AS bucket,
           CAST(n_chars AS BIGINT) AS x,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS y
    FROM documents
),
tr AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(x * y) AS BIGINT) AS sxy
    FROM feat WHERE bucket < {CONFORMAL_CAL_LO}
),
fit AS MATERIALIZED (
    SELECT n AS n_train, b, {_CONF_A_SQL} AS a
    FROM (SELECT n, sx, sy, sxx, sxy, {_CONF_B_SQL} AS b FROM tr)
),
cal AS MATERIALIZED (
    SELECT f.doc_id, {_CONF_RESID_SQL} AS resid
    FROM feat f CROSS JOIN fit
    WHERE f.bucket >= {CONFORMAL_CAL_LO}
      AND f.bucket < {CONFORMAL_TEST_LO}
),
calr AS (
    SELECT resid,
           row_number() OVER (ORDER BY resid, doc_id) AS rnk,
           count(*) OVER () AS n_cal
    FROM cal
),
te AS MATERIALIZED (
    SELECT f.doc_id, {_CONF_RESID_SQL} AS resid
    FROM feat f CROSS JOIN fit
    WHERE f.bucket >= {CONFORMAL_TEST_LO}
),
{",".join(
    f'''
q{i} AS (
    SELECT CAST(rnk AS BIGINT) AS q_rank, resid AS q_hat,
           CAST(n_cal AS BIGINT) AS n_cal
    FROM calr
    WHERE rnk = ((n_cal + 1) * {num} + {den} - 1) // {den}
),
cov{i} AS (
    SELECT MAX(q.q_rank) AS q_rank, MAX(q.q_hat) AS q_hat,
           MAX(q.n_cal) AS n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN te.resid <= q.q_hat THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS coverage
    FROM te CROSS JOIN q{i} q
)'''
    for i, (alpha, num, den) in enumerate(CONFORMAL_ALPHAS)
)}
{" UNION ALL ".join(
    f'''SELECT CAST({alpha} AS DOUBLE) AS alpha,
       fit.n_train AS n_train,
       c.n_cal AS n_cal,
       c.n_test AS n_test,
       c.q_rank AS q_rank,
       c.q_hat AS q_hat,
       c.coverage AS coverage
FROM cov{i} c CROSS JOIN fit'''
    for i, (alpha, num, den) in enumerate(CONFORMAL_ALPHAS)
)}
"""


@register(
    "quality_conformal_coverage_audit",
    oracle=CONFORMAL_ORACLE,
    tags=("quality", "calibration", "statistics"),
)
def quality_conformal_coverage_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal prediction-interval coverage audit (Vovk et
    al., Algorithmic Learning in a Random World 2005; Lei et al.,
    JASA 2018): hash-split the corpus into train/calibration/test,
    fit token-count ~ char-count by OLS on train, take the
    ceil((n_cal+1)(1-alpha))-th smallest absolute calibration
    residual as the conformal radius q_hat, and audit EMPIRICAL
    test-set coverage of |y - y_hat| <= q_hat against the 1 - alpha
    target — the finite-sample-valid calibration readout a pipeline
    shipping length predictions needs.

    Exactness: splits via the md5-derived hash64 (engine-portable,
    the sampling-family convention); OLS from exact BIGINT sums with
    the shared fixed-order coefficient texts; residuals are one
    shared double expression; the conformal radius is an INTEGER-rank
    order statistic over (resid, doc_id) with the rank computed by
    exact integer ceiling arithmetic — never a quantile builtin.

    Scale: the engine-side rank uses frontier.global_rank(
    mode="distributed") — range-partitioned two-phase exact rank, no
    single-task total sort (the r12 verdict's frontier rule, wired
    from day one); the oracle uses the single-window form.  Train
    sums and the coverage test are map-side-combined aggregates;
    the fit is a broadcast scalar."""
    from kafka_stream_processing_spark.operators.dedup import hash64
    from kafka_stream_processing_spark.operators.frontier import (
        global_rank,
    )

    feat = fanout(table(spark, sf_dir, "documents")).select(
        "doc_id",
        (hash64(F.col("doc_id").cast("string")) % 100).alias("bucket"),
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split("text", " ")).cast("bigint").alias("y"),
    )
    tr = feat.filter(F.col("bucket") < CONFORMAL_CAL_LO).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    # Mirror the oracle's nested scopes exactly: inner select keeps the
    # raw sums in scope for the b text, outer evaluates the a text
    # against (n, sx, sy, b).
    fit = tr.select(
        "n", "sx", "sy", F.expr(_CONF_B_SQL).alias("b")
    ).select(
        F.col("n").alias("n_train"),
        "b",
        F.expr(_CONF_A_SQL).alias("a"),
    )
    resid_expr = F.expr(_CONF_RESID_SQL)
    cal = (
        feat.filter(
            (F.col("bucket") >= CONFORMAL_CAL_LO)
            & (F.col("bucket") < CONFORMAL_TEST_LO)
        )
        .crossJoin(F.broadcast(fit))
        .select("doc_id", resid_expr.alias("resid"))
    )
    calr = global_rank(
        cal,
        [F.col("resid"), F.col("doc_id")],
        mode="distributed",
        rank_name="rnk",
    )
    n_cal_df = calr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal")
    )
    te = (
        feat.filter(F.col("bucket") >= CONFORMAL_TEST_LO)
        .crossJoin(F.broadcast(fit))
        .select("doc_id", resid_expr.alias("resid"))
    )
    parts = []
    for alpha, num, den in CONFORMAL_ALPHAS:
        k_expr = F.expr(
            f"((n_cal + 1) * {num} + {den} - 1) div {den}"
        )
        q = (
            calr.crossJoin(F.broadcast(n_cal_df))
            .filter(F.col("rnk") == k_expr)
            .select(
                F.col("rnk").cast("bigint").alias("q_rank"),
                F.col("resid").alias("q_hat"),
                "n_cal",
            )
        )
        cov = (
            te.crossJoin(F.broadcast(q))
            .agg(
                F.lit(float(alpha)).alias("alpha"),
                F.max("q_rank").alias("q_rank"),
                F.max("q_hat").alias("q_hat"),
                F.max("n_cal").alias("n_cal"),
                F.count(F.lit(1)).cast("bigint").alias("n_test"),
                (
                    F.sum(
                        F.when(
                            F.col("resid") <= F.col("q_hat"), 1
                        ).otherwise(0)
                    ).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("coverage"),
            )
            .crossJoin(F.broadcast(fit.select("n_train")))
            .select(
                "alpha",
                "n_train",
                "n_cal",
                "n_test",
                "q_rank",
                "q_hat",
                "coverage",
            )
        )
        parts.append(cov)
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


# ---------------------------------------------------------------------------
# Value-at-Risk + expected shortfall of the daily series, per type
# ---------------------------------------------------------------------------

#: (alpha literal, numerator/denominator of alpha as integers for the
#: exact ceil rank ceil(alpha * n)).
ES_ALPHAS = (("0.9", 9, 10), ("0.95", 19, 20))

ES_ORACLE = f"""
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           SUM(CAST(value AS DECIMAL(18,6))) AS x
    FROM events GROUP BY 1, 2
),
idx AS MATERIALIZED (
    SELECT event_type, x,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY x, day) AS r,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM daily
)
{" UNION ALL ".join(
    f'''SELECT event_type,
       CAST({alpha} AS DOUBLE) AS alpha,
       CAST(MAX(n) AS BIGINT) AS n_days,
       CAST(MAX(CASE WHEN r = (n * {num} + {den} - 1) // {den}
                     THEN x END) AS DOUBLE) AS var_value,
       CAST(SUM(CASE WHEN r >= (n * {num} + {den} - 1) // {den}
                     THEN CAST(x AS DECIMAL(38,6)) END) AS DOUBLE)
           / CAST(SUM(CASE WHEN r >= (n * {num} + {den} - 1) // {den}
                           THEN 1 ELSE 0 END) AS DOUBLE)
           AS expected_shortfall,
       CAST(SUM(CASE WHEN r >= (n * {num} + {den} - 1) // {den}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_tail
FROM idx GROUP BY event_type'''
    for alpha, num, den in ES_ALPHAS
)}
"""


@register(
    "window_expected_shortfall_daily",
    oracle=ES_ORACLE,
    tags=("windowed", "timeseries", "tails", "statistics"),
)
def window_expected_shortfall_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Upper-tail value-at-risk and expected shortfall (CVaR) of the
    per-type daily revenue distribution at alpha in {0.9, 0.95}
    (Rockafellar & Uryasev 2000; Acerbi & Tasche 2002) — the coherent
    tail-risk readout for capacity planning: ES answers "when a day
    lands in the top (1-alpha) tail, how big is it on average?",
    which prices burst load the way a quantile alone cannot.

    Exactness: VaR is the type-1 quantile at the exact integer rank
    ceil(alpha*n) = (n*num + den - 1) // den over the (x, day) total
    order (never an interpolating quantile builtin); ES averages the
    tail AT-AND-ABOVE the VaR rank (the atom-inclusive CVaR
    convention) as an exact DECIMAL(38,6) sum with ONE final double
    division; n_tail is BIGINT.  Ties in x are rank-broken by day but
    the tail SET {{r >= k}} is tie-stable because equal values sort
    adjacently.

    Scale: per-series hash-partitioned rank window over the
    calendar-bounded daily frame (never a global sort; the day grid
    is thousands of rows at any corpus size), one map-side-combined
    conditional aggregate per alpha."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.sum(dec("value")).alias("x"))
    )
    idx = daily.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("x", "day"))
        .alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    parts = []
    for alpha, num, den in ES_ALPHAS:
        k = F.expr(f"(n * {num} + {den} - 1) div {den}")
        in_tail = F.col("r") >= k
        parts.append(
            idx.groupBy("event_type").agg(
                F.lit(float(alpha)).alias("alpha"),
                F.max("n").cast("bigint").alias("n_days"),
                F.max(F.when(F.col("r") == k, F.col("x")))
                .cast("double")
                .alias("var_value"),
                (
                    F.sum(
                        F.when(
                            in_tail, F.col("x").cast("decimal(38,6)")
                        )
                    ).cast("double")
                    / F.sum(F.when(in_tail, 1).otherwise(0)).cast(
                        "double"
                    )
                ).alias("expected_shortfall"),
                F.sum(F.when(in_tail, 1).otherwise(0))
                .cast("bigint")
                .alias("n_tail"),
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


# ---------------------------------------------------------------------------
# Extremal index (Ferro-Segers intervals estimator), per type
# ---------------------------------------------------------------------------

#: Exceedance threshold: the type-1 quantile at EXT_Q_NUM/EXT_Q_DEN of
#: each type's daily totals (integer rank, per-series).
EXT_Q_NUM, EXT_Q_DEN = 4, 5

#: Shared fixed-order Ferro-Segers texts over the exact BIGINT gap
#: sums (the _THETA_B_SQL precedent).  v1: max gap <= 2; v2: else.
_FS_THETA_V1_SQL = (
    "(2.0 * CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)"
    " / (CAST(ng AS DOUBLE) * CAST(sg2 AS DOUBLE)))"
)
_FS_THETA_V2_SQL = (
    "(2.0 * CAST(sg1 AS DOUBLE) * CAST(sg1 AS DOUBLE)"
    " / (CAST(ng AS DOUBLE) * CAST(sg12 AS DOUBLE)))"
)

EXTREMAL_ORACLE = f"""
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(date_trunc('day', ts) AS DATE)
               - DATE '1970-01-01' AS d,
           SUM(CAST(value AS DECIMAL(18,6))) AS x
    FROM events GROUP BY 1, 2
),
idx AS MATERIALIZED (
    SELECT event_type, d, x,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY x, day) AS r,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM daily
),
thr AS (
    SELECT event_type,
           MAX(CASE WHEN r = (n * {EXT_Q_NUM} + {EXT_Q_DEN} - 1)
                             // {EXT_Q_DEN}
                    THEN x END) AS u,
           MAX(n) AS n_days
    FROM idx GROUP BY 1
),
exc AS MATERIALIZED (
    SELECT i.event_type, i.d,
           lag(i.d) OVER (PARTITION BY i.event_type
                          ORDER BY i.d) AS prev_d
    FROM idx i JOIN thr t ON t.event_type = i.event_type
    WHERE i.x > t.u
),
gaps AS (
    SELECT event_type, CAST(d - prev_d AS BIGINT) AS g
    FROM exc WHERE prev_d IS NOT NULL
),
sums AS MATERIALIZED (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS ng,
           CAST(MAX(g) AS BIGINT) AS gmax,
           CAST(SUM(g) AS BIGINT) AS sg,
           CAST(SUM(g * g) AS BIGINT) AS sg2,
           CAST(SUM(g - 1) AS BIGINT) AS sg1,
           CAST(SUM((g - 1) * (g - 2)) AS BIGINT) AS sg12
    FROM gaps GROUP BY 1
    HAVING count(*) >= 2
)
SELECT s.event_type,
       t.n_days,
       CAST(s.ng + 1 AS BIGINT) AS n_exceed,
       s.gmax AS max_gap,
       CAST(t.u AS DOUBLE) AS threshold,
       LEAST(1.0, CASE WHEN s.gmax <= 2 THEN {_FS_THETA_V1_SQL}
                       ELSE {_FS_THETA_V2_SQL} END) AS theta
FROM sums s JOIN thr t ON t.event_type = s.event_type
"""


@register(
    "window_extremal_index_runs",
    oracle=EXTREMAL_ORACLE,
    tags=("windowed", "timeseries", "tails", "statistics"),
)
def window_extremal_index_runs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Extremal index of each type's daily-revenue exceedance process
    via the Ferro-Segers intervals estimator (JRSS-B 2003) — theta ~ 1
    means extreme days arrive independently, theta << 1 means they
    CLUSTER (1/theta is the mean extreme-cluster size).  Clustered
    load spikes need different capacity headroom than isolated ones,
    which is why theta belongs next to VaR/ES and the Hill index in
    the tail-audit family.

    Exactness: the threshold is the per-series type-1 quantile at the
    exact integer rank ceil({EXT_Q_NUM}/{EXT_Q_DEN} * n) (never a
    quantile builtin); interexceedance gaps are BIGINT day
    differences; both estimator variants (gaps <= 2 -> moment form,
    else the shifted (g-1)(g-2) form) are evaluated from ONE shared
    fixed-order expression text over exact BIGINT gap sums, with the
    LEAST(1, .) cap applied to identical doubles in both engines.

    Scale: everything after the daily rollup lives on the
    calendar-bounded day grid — per-series rank window, one lag
    window over exceedance days, one map-side-combined gap-sum
    aggregate.  Nothing scales with raw event count except the first
    rollup."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.sum(dec("value")).alias("x"))
        .select(
            "event_type",
            "day",
            F.datediff(
                "day", F.lit("1970-01-01").cast("date")
            ).alias("d"),
            "x",
        )
    )
    idx = daily.select(
        "event_type",
        "d",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("x", "day"))
        .alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    k = F.expr(
        f"(n * {EXT_Q_NUM} + {EXT_Q_DEN} - 1) div {EXT_Q_DEN}"
    )
    thr = idx.groupBy("event_type").agg(
        F.max(F.when(F.col("r") == k, F.col("x"))).alias("u"),
        F.max("n").alias("n_days"),
    )
    exc = (
        idx.join(F.broadcast(thr), "event_type")
        .filter(F.col("x") > F.col("u"))
        .select(
            "event_type",
            "d",
            F.lag("d")
            .over(Window.partitionBy("event_type").orderBy("d"))
            .alias("prev_d"),
        )
    )
    gaps = exc.filter(F.col("prev_d").isNotNull()).select(
        "event_type",
        (F.col("d") - F.col("prev_d")).cast("bigint").alias("g"),
    )
    g = F.col("g")
    sums = (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ng"),
            F.max("g").cast("bigint").alias("gmax"),
            F.sum("g").cast("bigint").alias("sg"),
            F.sum(g * g).cast("bigint").alias("sg2"),
            F.sum(g - 1).cast("bigint").alias("sg1"),
            F.sum((g - 1) * (g - 2)).cast("bigint").alias("sg12"),
        )
        .filter(F.col("ng") >= 2)
    )
    theta = F.least(
        F.lit(1.0),
        F.when(
            F.col("gmax") <= 2, F.expr(_FS_THETA_V1_SQL)
        ).otherwise(F.expr(_FS_THETA_V2_SQL)),
    )
    return sums.join(F.broadcast(thr), "event_type").select(
        "event_type",
        "n_days",
        (F.col("ng") + 1).cast("bigint").alias("n_exceed"),
        F.col("gmax").alias("max_gap"),
        F.col("u").cast("double").alias("threshold"),
        theta.alias("theta"),
    )


# ---------------------------------------------------------------------------
# Winkler interval score of the trailing-window interval forecaster
# ---------------------------------------------------------------------------

#: (alpha literal, 2/alpha as an exact integer literal, lo rank,
#: hi rank) for the central (1-alpha) interval from the
#: PINBALL_WINDOW-member ensemble: lo = ceil(alpha/2 * W),
#: hi = ceil((1 - alpha/2) * W).
WINKLER_ALPHAS = (("0.2", 10, 3, 26), ("0.5", 4, 7, 21))

WINKLER_ORACLE = f"""
WITH {_daily_total_sql().lstrip()},
win AS (
    SELECT c.d, c.x AS y, p.x AS m,
           row_number() OVER (PARTITION BY c.d
                              ORDER BY p.x, p.d) AS r,
           count(*) OVER (PARTITION BY c.d) AS w
    FROM daily c JOIN daily p
      ON p.d >= c.d - {PINBALL_WINDOW} AND p.d <= c.d - 1
),
iv AS MATERIALIZED (
    SELECT d, MAX(y) AS y,
           {", ".join(
               f"MAX(CASE WHEN r = {lo} THEN m END) AS lo_{i},"
               f" MAX(CASE WHEN r = {hi} THEN m END) AS hi_{i}"
               for i, (_, _, lo, hi) in enumerate(WINKLER_ALPHAS)
           )}
    FROM win WHERE w = {PINBALL_WINDOW} GROUP BY d
)
{" UNION ALL ".join(
    f'''SELECT CAST({alpha} AS DOUBLE) AS alpha,
       CAST({lo} AS BIGINT) AS lo_rank,
       CAST({hi} AS BIGINT) AS hi_rank,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(SUM(CAST(hi_{i} - lo_{i} AS DECIMAL(38,6))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg_width,
       CAST(SUM(CAST((hi_{i} - lo_{i})
                     + CASE WHEN y < lo_{i}
                            THEN {two_over} * (lo_{i} - y)
                            ELSE 0 END
                     + CASE WHEN y > hi_{i}
                            THEN {two_over} * (y - hi_{i})
                            ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg_interval_score,
       CAST(SUM(CASE WHEN y >= lo_{i} AND y <= hi_{i}
                     THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS coverage
FROM iv'''
    for i, (alpha, two_over, lo, hi) in enumerate(WINKLER_ALPHAS)
)}
"""


@register(
    "window_winkler_interval_score",
    oracle=WINKLER_ORACLE,
    tags=("windowed", "timeseries", "forecast", "scoring"),
)
def window_winkler_interval_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winkler interval score of the trailing {PINBALL_WINDOW}-day
    central-interval forecaster at alpha in {{0.2, 0.5}} (Winkler,
    JASA 1972; the M4/M5 competition's prediction-interval metric):
    score = width + (2/alpha) * distance-outside, averaged over scored
    days, with empirical interval coverage beside it.  Completes the
    uncertainty-scoring triad — pinball (per-quantile), CRPS
    (full-distribution), Winkler (central interval).

    Exactness: interval endpoints are type-1 quantiles at exact
    integer ranks ceil(alpha/2 * W) and ceil((1 - alpha/2) * W) of
    the calendar-window ensemble; 2/alpha is an exact INTEGER literal
    ({WINKLER_ALPHAS[0][1]} and {WINKLER_ALPHAS[1][1]}); the score
    accumulates entirely in DECIMAL(38,6) with ONE final double
    division per cell — zero float rounding in the accumulation
    (the pinball-loss exactness pattern).

    Scale: identical shape to window_pinball_loss_daily — the
    day-grid self-join is calendar-bounded, per-day rank windows are
    day-partitioned, nothing but the first rollup sees raw events."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(dec("value")).alias("x"))
        .select(
            F.datediff(
                "day", F.lit("1970-01-01").cast("date")
            ).alias("d"),
            "x",
        )
    )
    c, p = daily.alias("c"), daily.alias("p")
    win = (
        c.join(
            p,
            (F.col("p.d") >= F.col("c.d") - PINBALL_WINDOW)
            & (F.col("p.d") <= F.col("c.d") - 1),
        )
        .select(
            F.col("c.d").alias("d"),
            F.col("c.x").alias("y"),
            F.col("p.x").alias("m"),
            F.col("p.d").alias("pd"),
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("d").orderBy("m", "pd")
            ),
        )
        .withColumn(
            "w", F.count(F.lit(1)).over(Window.partitionBy("d"))
        )
    )
    agg_cols = [F.max("y").alias("y")]
    for i, (_, _, lo, hi) in enumerate(WINKLER_ALPHAS):
        agg_cols.append(
            F.max(F.when(F.col("r") == lo, F.col("m"))).alias(f"lo_{i}")
        )
        agg_cols.append(
            F.max(F.when(F.col("r") == hi, F.col("m"))).alias(f"hi_{i}")
        )
    iv = (
        win.filter(F.col("w") == PINBALL_WINDOW)
        .groupBy("d")
        .agg(*agg_cols)
    )
    parts = []
    for i, (alpha, two_over, lo, hi) in enumerate(WINKLER_ALPHAS):
        lo_c, hi_c, y = F.col(f"lo_{i}"), F.col(f"hi_{i}"), F.col("y")
        width = hi_c - lo_c
        score = (
            width
            + F.when(y < lo_c, F.lit(two_over) * (lo_c - y)).otherwise(
                F.lit(0)
            )
            + F.when(y > hi_c, F.lit(two_over) * (y - hi_c)).otherwise(
                F.lit(0)
            )
        ).cast("decimal(38,6)")
        parts.append(
            iv.agg(
                F.lit(float(alpha)).alias("alpha"),
                F.lit(lo).cast("bigint").alias("lo_rank"),
                F.lit(hi).cast("bigint").alias("hi_rank"),
                F.count(F.lit(1)).cast("bigint").alias("n_days"),
                (
                    F.sum(width.cast("decimal(38,6)")).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("avg_width"),
                (
                    F.sum(score).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("avg_interval_score"),
                (
                    F.sum(
                        F.when(
                            (y >= lo_c) & (y <= hi_c), 1
                        ).otherwise(0)
                    ).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("coverage"),
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


# ---------------------------------------------------------------------------
# GEV shape from weekly block maxima (L-moment / Hosking approximation)
# ---------------------------------------------------------------------------

#: Calendar block length in days for the block-maxima sample.
GEV_BLOCK_DAYS = 7

#: ln2/ln3 as ONE correctly-rounded double literal shared by both
#: engines (no libm log call at query time anywhere in this op).
_GEV_LN2_OVER_LN3 = "0.6309297535714574e0"

#: Shared fixed-order texts over (n, s0, s1, s2 -> b0, b1, b2):
#: t3, then the Hosking-Wallis GEV shape approximation
#: k = 7.8590 c + 2.9554 c**2 with c = 2/(3 + t3) - ln2/ln3
#: (Hosking, Wallis & Wood, Technometrics 1985, eq. 14 — quoted
#: accuracy |err| < 9e-4 for -0.5 <= k <= 0.5).
_GEV_T3_SQL = "((6.0e0 * b2 - 6.0e0 * b1 + b0) / (2.0e0 * b1 - b0))"
_GEV_C_SQL = f"(2.0e0 / (3.0e0 + t3) - {_GEV_LN2_OVER_LN3})"
_GEV_K_SQL = "(7.8590e0 * c + 2.9554e0 * c * c)"

GEV_ORACLE = f"""
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE)
               - DATE '1970-01-01' AS d,
           SUM(CAST(value AS DECIMAL(18,6))) AS x
    FROM events GROUP BY 1
),
blocks AS (
    SELECT d // {GEV_BLOCK_DAYS} AS blk,
           CAST(count(*) AS BIGINT) AS n_days,
           MAX(x) AS mx
    FROM daily GROUP BY 1
    HAVING count(*) = {GEV_BLOCK_DAYS}
),
idx AS (
    SELECT mx,
           row_number() OVER (ORDER BY mx, blk) AS i
    FROM blocks
),
sums AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           SUM(CAST(mx AS DECIMAL(38,6))) AS s0,
           SUM(CAST(mx * (i - 1) AS DECIMAL(38,6))) AS s1,
           SUM(CAST(mx * (((i - 1) * (i - 2)) // 2)
                    AS DECIMAL(38,6))) AS s2
    FROM idx HAVING count(*) >= 3
),
bs AS MATERIALIZED (
    SELECT n,
           CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE) AS b0,
           CAST(s1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS b1,
           CAST(s2 AS DOUBLE)
               / CAST((n * (n - 1) * (n - 2)) // 2 AS DOUBLE) AS b2
    FROM sums
),
ts AS MATERIALIZED (
    SELECT n, b0, b1, b2, {_GEV_T3_SQL} AS t3 FROM bs
),
cs AS MATERIALIZED (
    SELECT n, b0, b1, b2, t3, {_GEV_C_SQL} AS c FROM ts
)
SELECT CAST(n AS BIGINT) AS n_blocks,
       b0 AS l1,
       (2.0e0 * b1 - b0) AS l2,
       t3,
       {_GEV_K_SQL} AS gev_shape
FROM cs
"""


@register(
    "window_gev_blockmax_shape",
    oracle=GEV_ORACLE,
    tags=("windowed", "timeseries", "tails", "statistics"),
)
def window_gev_blockmax_shape(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GEV shape parameter of weekly block maxima of total daily
    revenue, estimated from sample L-moments via the Hosking-Wallis-
    Wood approximation k = 7.8590c + 2.9554c^2, c = 2/(3+t3) -
    ln2/ln3 (Technometrics 1985) — the extreme-value-theory readout
    that classifies the load distribution's domain of attraction:
    k < 0 Frechet-like heavy tail (pairs with a finite Hill alpha),
    k ~ 0 Gumbel, k > 0 bounded tail.

    Exactness: block maxima are MAX of exact DECIMAL daily totals
    (exact); only COMPLETE {GEV_BLOCK_DAYS}-day calendar blocks enter
    (count(*) = {GEV_BLOCK_DAYS} in both engines); L-moment b_r come
    from integer-binomial-weighted DECIMAL(38,6) sums (the
    window_l_moments_daily pattern); t3, c, and k are ONE shared
    fixed-order expression chain per stage (each stage MATERIALIZED
    in the oracle — the r11 inlining gotcha), and ln2/ln3 enters as a
    single correctly-rounded double LITERAL, so no libm call exists
    at query time in either engine.

    Scale: the block-max frame is calendar-bounded (n_days/7 rows at
    ANY corpus size), so its rank window is structurally tiny; the
    only corpus-scale stage is the map-side-combined daily rollup."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(dec("value")).alias("x"))
        .select(
            F.datediff(
                "day", F.lit("1970-01-01").cast("date")
            ).alias("d"),
            "x",
        )
    )
    blocks = (
        daily.groupBy(
            F.expr(f"d div {GEV_BLOCK_DAYS}").alias("blk")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.max("x").alias("mx"),
        )
        .filter(F.col("n_days") == GEV_BLOCK_DAYS)
    )
    idx = blocks.select(
        "mx",
        F.row_number()
        .over(Window.orderBy("mx", "blk"))
        .alias("i"),
    )
    i1 = F.col("i") - 1
    sums = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("mx").cast("decimal(38,6)")).alias("s0"),
        F.sum((F.col("mx") * i1).cast("decimal(38,6)")).alias("s1"),
        F.sum(
            (
                F.col("mx") * F.expr("((i - 1) * (i - 2)) div 2")
            ).cast("decimal(38,6)")
        ).alias("s2"),
    ).filter(F.col("n") >= 3)
    bs = sums.select(
        "n",
        (F.col("s0").cast("double") / F.col("n").cast("double")).alias(
            "b0"
        ),
        (
            F.col("s1").cast("double")
            / (F.col("n") * (F.col("n") - 1)).cast("double")
        ).alias("b1"),
        (
            F.col("s2").cast("double")
            / F.expr("(n * (n - 1) * (n - 2)) div 2").cast("double")
        ).alias("b2"),
    )
    ts = bs.select("n", "b0", "b1", "b2", F.expr(_GEV_T3_SQL).alias("t3"))
    cs = ts.select(
        "n", "b0", "b1", "b2", "t3", F.expr(_GEV_C_SQL).alias("c")
    )
    return cs.select(
        F.col("n").alias("n_blocks"),
        F.col("b0").alias("l1"),
        F.expr("(2.0e0 * b1 - b0)").alias("l2"),
        "t3",
        F.expr(_GEV_K_SQL).alias("gev_shape"),
    )


# ---------------------------------------------------------------------------
# Diebold-Mariano test: seasonal-naive vs lag-1 naive
# ---------------------------------------------------------------------------

#: Shared fixed-order texts over (n, sd, sd2): mean loss differential,
#: population autocovariance-0, DM statistic (h = 1, no long-run
#: variance correction needed for one-step forecasts), and the
#: Harvey-Leybourne-Newbold small-sample factor sqrt((n-1)/n) at h=1.
_DM_DBAR_SQL = "(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))"
_DM_G0_SQL = (
    "(CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE) - dbar * dbar)"
)
_DM_STAT_SQL = "(dbar / sqrt(g0 / CAST(n AS DOUBLE)))"
_DM_HLN_SQL = (
    "(dm_stat * sqrt(CAST(n - 1 AS DOUBLE) / CAST(n AS DOUBLE)))"
)

DM_ORACLE = f"""
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE)
               - DATE '1970-01-01' AS d,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
    FROM events GROUP BY 1
),
joined AS (
    SELECT c.d, c.x, l1.x AS f1, l7.x AS f7
    FROM daily c
    JOIN daily l1 ON l1.d = c.d - 1
    JOIN daily l7 ON l7.d = c.d - 7
),
diffs AS (
    SELECT CAST(CAST(round(abs(x - f7), 6) AS DECIMAL(18,6))
                - CAST(round(abs(x - f1), 6) AS DECIMAL(18,6))
                AS DECIMAL(19,6)) AS dd
    FROM joined
),
sums AS MATERIALIZED (
    SELECT CAST(count(*) AS BIGINT) AS n,
           SUM(CAST(dd AS DECIMAL(38,6))) AS sd,
           -- dd capped at DECIMAL(19,6) so the exact product is
           -- representable: 19+19 = 38, scale 12 in both engines.
           SUM(dd * dd) AS sd2
    FROM diffs HAVING count(*) >= 2
),
m AS MATERIALIZED (
    SELECT n, sd, sd2, {_DM_DBAR_SQL} AS dbar FROM sums
),
g AS MATERIALIZED (
    SELECT n, dbar, {_DM_G0_SQL} AS g0 FROM m
),
s AS MATERIALIZED (
    SELECT n, dbar, g0, {_DM_STAT_SQL} AS dm_stat FROM g
)
SELECT CAST(n AS BIGINT) AS n_days,
       dbar AS mean_loss_diff,
       g0 AS var_loss_diff,
       dm_stat,
       {_DM_HLN_SQL} AS dm_hln
FROM s
"""


@register(
    "window_diebold_mariano_naive",
    oracle=DM_ORACLE,
    tags=("windowed", "timeseries", "forecast", "statistics"),
)
def window_diebold_mariano_naive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Diebold-Mariano equal-predictive-accuracy test between the
    seasonal-naive (lag-7) and lag-1 naive forecasters on total daily
    revenue (Diebold & Mariano, JBES 1995), with the
    Harvey-Leybourne-Newbold small-sample correction at h=1 —
    window_forecast_skill_scores reports the MASE/U2 point ratios;
    this op adds the SIGNIFICANCE statistic for the same comparison
    (dm < 0: seasonal model's absolute loss is smaller).

    Exactness: the loss differential d_t = |e7| - |e1| is a
    difference of round-6 DECIMALs (exact, the forecast-skill
    convention); Sum(d) and Sum(d^2) accumulate as DECIMAL(38,6) /
    DECIMAL(38,12); dbar, the population autocovariance gamma_0, the
    DM ratio and the HLN factor are ONE shared fixed-order expression
    chain (stage-MATERIALIZED in the oracle), using only IEEE basic
    ops and sqrt (correctly rounded per IEEE-754, hence
    bit-identical).  h=1 one-step losses need no long-run variance
    window, so the statistic is closed-form.

    Scale: two calendar self-joins on the day grid plus one scalar
    aggregate; only the daily rollup sees raw events."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(dec("value")).cast("double").alias("x"))
        .select(
            F.datediff(
                "day", F.lit("1970-01-01").cast("date")
            ).alias("d"),
            "x",
        )
    )
    c, l1, l7 = daily.alias("c"), daily.alias("l1"), daily.alias("l7")
    joined = (
        c.join(l1, F.col("l1.d") == F.col("c.d") - 1)
        .join(l7, F.col("l7.d") == F.col("c.d") - 7)
        .select(
            F.col("c.x").alias("x"),
            F.col("l1.x").alias("f1"),
            F.col("l7.x").alias("f7"),
        )
    )
    dd = (
        F.round(F.abs(F.col("x") - F.col("f7")), 6).cast("decimal(18,6)")
        - F.round(F.abs(F.col("x") - F.col("f1")), 6).cast(
            "decimal(18,6)"
        )
    ).cast("decimal(19,6)")
    diffs = joined.select(dd.alias("dd"))
    sums = diffs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("dd").cast("decimal(38,6)")).alias("sd"),
        # dd capped at DECIMAL(19,6): the product is exact at
        # DECIMAL(38,12) in both engines (19+19 = 38).
        F.sum(
            (F.col("dd") * F.col("dd")).cast("decimal(38,12)")
        ).alias("sd2"),
    ).filter(F.col("n") >= 2)
    m = sums.select("n", "sd", "sd2", F.expr(_DM_DBAR_SQL).alias("dbar"))
    g = m.select("n", "dbar", F.expr(_DM_G0_SQL).alias("g0"))
    s = g.select("n", "dbar", "g0", F.expr(_DM_STAT_SQL).alias("dm_stat"))
    return s.select(
        F.col("n").alias("n_days"),
        F.col("dbar").alias("mean_loss_diff"),
        F.col("g0").alias("var_loss_diff"),
        "dm_stat",
        F.expr(_DM_HLN_SQL).alias("dm_hln"),
    )


# ---------------------------------------------------------------------------
# Cliff's delta effect size: each source's doc-length shift vs rest
# ---------------------------------------------------------------------------

#: Romano et al. (2006) magnitude thresholds on |delta| — literal
#: doubles, identical CASE ladder in both engines.
CLIFF_THRESHOLDS = ("0.147", "0.33", "0.474")

CLIFF_DELTA_ORACLE = f"""
WITH hist AS (
    SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
    FROM documents GROUP BY 1, 2
),
tot AS MATERIALIZED (
    SELECT n_chars, CAST(SUM(c) AS BIGINT) AS ct,
           COALESCE(SUM(SUM(c)) OVER (ORDER BY n_chars
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0) AS cum_t
    FROM hist GROUP BY 1
),
cums AS MATERIALIZED (
    SELECT h.source, h.n_chars, h.c,
           COALESCE(SUM(h.c) OVER (PARTITION BY h.source
                                   ORDER BY h.n_chars
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS cum_s,
           t.ct,
           t.cum_t,
           SUM(h.c) OVER (PARTITION BY h.source) AS n_s_all
    FROM hist h JOIN tot t ON t.n_chars = h.n_chars
),
grand AS (SELECT CAST(SUM(ct) AS BIGINT) AS g FROM tot),
sums AS MATERIALIZED (
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_s,
           CAST(SUM(c * (cum_t - cum_s)) AS BIGINT) AS p_below,
           CAST(SUM(c * (g - (cum_t + ct)
                         - (n_s_all - cum_s - c))) AS BIGINT)
               AS p_above,
           CAST(MAX(g) AS BIGINT) AS g
    FROM cums CROSS JOIN grand GROUP BY source
),
fin AS MATERIALIZED (
    SELECT source, n_s,
           g - n_s AS n_o,
           p_below, p_above,
           CAST(p_below - p_above AS DOUBLE)
               / (CAST(n_s AS DOUBLE) * CAST(g - n_s AS DOUBLE))
               AS delta
    FROM sums
)
SELECT source, n_s, n_o,
       p_below AS n_pairs_greater,
       p_above AS n_pairs_less,
       delta,
       CASE WHEN abs(delta) < {CLIFF_THRESHOLDS[0]} THEN 'negligible'
            WHEN abs(delta) < {CLIFF_THRESHOLDS[1]} THEN 'small'
            WHEN abs(delta) < {CLIFF_THRESHOLDS[2]} THEN 'medium'
            ELSE 'large' END AS magnitude
FROM fin
"""


@register(
    "quality_cliff_delta_source_length",
    oracle=CLIFF_DELTA_ORACLE,
    tags=("quality", "statistics", "effect-size"),
)
def quality_cliff_delta_source_length(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cliff's delta effect size of each source's document-length
    distribution against the REST of the corpus (Cliff, Psych. Bull.
    1993; magnitude labels per Romano et al. 2006) — the
    distribution-free effect-size readout that the drift-test family
    (p-value-shaped statistics) lacks: delta = P(X > Y) - P(X < Y)
    for X a source's doc, Y any other source's doc.  A source whose
    delta is 'large' feeds systematically longer/shorter documents
    and will dominate token budgets even when a location test is
    inconclusive.

    Exactness: pure INTEGER pair counting without materializing
    pairs — the (source, n_chars) histogram joined to the global
    value histogram, strictly-below cumulative counts from
    ROWS-bounded windows, P = Sum c_s(v) * (#others < v) and
    Q = Sum c_s(v) * (#others > v) as exact BIGINT dot products, one
    final double division, literal-threshold CASE for the magnitude.

    Scale: the windows run over the VALUE HISTOGRAM (bounded by the
    n_chars domain, the cvm/histogram-sized precedent), partitioned
    by source; raw documents are only seen by the first
    map-side-combined groupBy.  No pair set ever exists."""
    d = table(spark, sf_dir, "documents")
    hist = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # Global strictly-below cumulative on the VALUE HISTOGRAM (one
    # unpartitioned window over the bounded n_chars domain — the
    # cvm/histogram-sized precedent); computed on tot, NOT per-source,
    # so values absent from a source still count into cum_t.
    w_t = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = (
        hist.groupBy("n_chars")
        .agg(F.sum("c").cast("bigint").alias("ct"))
        .withColumn(
            "cum_t", F.coalesce(F.sum("ct").over(w_t), F.lit(0))
        )
    )
    w_s = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cums = hist.join(tot, "n_chars").withColumn(
        "cum_s", F.coalesce(F.sum("c").over(w_s), F.lit(0))
    )
    grand = tot.agg(F.sum("ct").cast("bigint").alias("g"))
    w_src = Window.partitionBy("source")
    cums = cums.withColumn("n_s_all", F.sum("c").over(w_src))
    sums = (
        cums.crossJoin(F.broadcast(grand))
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_s"),
            F.sum(
                F.col("c") * (F.col("cum_t") - F.col("cum_s"))
            )
            .cast("bigint")
            .alias("p_below"),
            F.sum(
                F.col("c")
                * (
                    F.col("g")
                    - (F.col("cum_t") + F.col("ct"))
                    - (
                        F.col("n_s_all")
                        - F.col("cum_s")
                        - F.col("c")
                    )
                )
            )
            .cast("bigint")
            .alias("p_above"),
            F.max("g").alias("g"),
        )
    )
    delta = (F.col("p_below") - F.col("p_above")).cast("double") / (
        F.col("n_s").cast("double")
        * (F.col("g") - F.col("n_s")).cast("double")
    )
    mag = (
        F.when(
            F.abs(F.col("delta")) < float(CLIFF_THRESHOLDS[0]),
            F.lit("negligible"),
        )
        .when(
            F.abs(F.col("delta")) < float(CLIFF_THRESHOLDS[1]),
            F.lit("small"),
        )
        .when(
            F.abs(F.col("delta")) < float(CLIFF_THRESHOLDS[2]),
            F.lit("medium"),
        )
        .otherwise(F.lit("large"))
    )
    return (
        sums.select(
            "source",
            "n_s",
            (F.col("g") - F.col("n_s")).cast("bigint").alias("n_o"),
            F.col("p_below").alias("n_pairs_greater"),
            F.col("p_above").alias("n_pairs_less"),
            delta.alias("delta"),
        )
        .withColumn("magnitude", mag)
    )
