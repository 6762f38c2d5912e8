"""Data-quality operators for large-scale training-data pipelines:
single-pass table profiling and declarative rule auditing.

At 100 TB the cardinal rule is ONE pass: a profile that scans once per
column (or a rule audit that scans once per rule) is unusable — every
metric here rides one scan as conditional aggregates, so the plan is
scan → partial agg → single exchange → final agg no matter how many
metrics are attached.  The reference has no data-validation surface at
all (its JSON input is unvalidated — a missing `uid` NPEs at
UniqueUsersCounter.java:68); these operators are the engine-level answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_processing_spark.functions.exact import dec
from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import table


@register(
    "quality_profile_orders",
    oracle="""
    SELECT count(*) AS n_rows,
           count(o_custkey) AS custkey_nonnull,
           count(DISTINCT o_custkey) AS custkey_distinct,
           count(DISTINCT o_orderstatus) AS status_distinct,
           count(DISTINCT o_orderpriority) AS priority_distinct,
           min(o_totalprice) AS price_min,
           max(o_totalprice) AS price_max,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS price_nonpositive,
           CAST(min(o_orderdate) AS VARCHAR) AS orderdate_min,
           CAST(max(o_orderdate) AS VARCHAR) AS orderdate_max
    FROM orders
    """,
    tags=("quality",),
)
def quality_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of `orders`: row count, per-column
    non-null / distinct counts, numeric ranges, a non-positive-price
    violation counter, and the date span — the pre-training sanity scan.

    Scale: every metric is a conditional aggregate over the SAME scan
    (count-distinct plans as partial sets merged per key — here the
    global key, so the exchange carries one partial state per partition,
    not the data)."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("custkey_nonnull"),
        F.countDistinct("o_custkey").alias("custkey_distinct"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.countDistinct("o_orderpriority").alias("priority_distinct"),
        F.min("o_totalprice").alias("price_min"),
        F.max("o_totalprice").alias("price_max"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("price_nonpositive"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
        .alias("orderdate_min"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
        .alias("orderdate_max"),
    )


@register(
    "quality_rule_violations",
    oracle="""
    SELECT rule, CAST(violations AS BIGINT) AS violations, n_rows
    FROM (
        SELECT 'discount_out_of_range' AS rule,
               SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                        THEN 1 ELSE 0 END) AS violations,
               count(*) AS n_rows
        FROM lineitem
        UNION ALL
        SELECT 'quantity_out_of_range',
               SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                        THEN 1 ELSE 0 END),
               count(*)
        FROM lineitem
        UNION ALL
        SELECT 'tax_negative',
               SUM(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END),
               count(*)
        FROM lineitem
        UNION ALL
        SELECT 'ship_before_order',
               SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END),
               count(*)
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    )
    """,
    tags=("quality",),
)
def quality_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative rule audit: each business rule becomes one conditional
    counter; same-table rules share ONE scan (a single aggregate emits
    all three lineitem counters, then unpivots to rule rows), and the
    cross-table rule (ship-before-order) is the only join.

    Scale: rules-per-scan batching means auditing R same-table rules
    costs one pass, not R; the unpivot to long form is a zero-shuffle
    stack expression."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    li_counts = li.agg(
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
            .otherwise(0)
        ).alias("discount_out_of_range"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
            .otherwise(0)
        ).alias("quantity_out_of_range"),
        F.sum(F.when(F.col("l_tax") < 0, 1).otherwise(0)).alias("tax_negative"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    li_rules = li_counts.select(
        F.expr(
            "stack(3, "
            "'discount_out_of_range', discount_out_of_range, "
            "'quantity_out_of_range', quantity_out_of_range, "
            "'tax_negative', tax_negative) AS (rule, violations)"
        ),
        "n_rows",
    )
    joined_rule = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(
            F.lit("ship_before_order").alias("rule"),
            F.sum(
                F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
            ).alias("violations"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return li_rules.select(
        "rule", F.col("violations").cast("bigint").alias("violations"), "n_rows"
    ).unionByName(
        joined_rule.select(
            "rule", F.col("violations").cast("bigint").alias("violations"), "n_rows"
        )
    )


@register(
    "quality_approx_quantiles",
    # approx_percentile sketches (Spark: variant of KLL/GK; DuckDB:
    # t-digest) can never match across engines — rows-only check here;
    # tests/test_properties.py bounds the rank error against the exact
    # interpolated percentile instead.
    oracle=None,
    tags=("quality", "scale"),
)
def quality_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantile profile: p50/p90/p99 of order totals per
    status via approx_percentile — O(sketch) state per group instead of
    the full sort an exact percentile needs.

    Scale: this is the 100 TB replacement for `agg_stats_orders`'s exact
    median — mergeable sketch state flows through partial aggregation,
    so the exchange carries KBs per group regardless of group size
    (the same sketch-not-set principle as approx_count_distinct)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)"
            ).alias("pcts"),
        )
        .select(
            "o_orderstatus",
            "n",
            F.col("pcts")[0].alias("p50_approx"),
            F.col("pcts")[1].alias("p90_approx"),
            F.col("pcts")[2].alias("p99_approx"),
        )
    )


@register(
    "quality_exact_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.90), 6) AS p90,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("quality", "statistics"),
)
def quality_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT linear-interpolation percentiles per group (the counterpart
    of quality_approx_quantiles' sketch: same statistic, exact algorithm,
    so it IS cross-engine oracle-checkable — both engines interpolate
    (1-g)*lo + g*hi over the sorted group; round(6) absorbs the last-ulp
    of that one interpolation).

    Scale: exact percentiles require the full sorted group — Spark's
    `percentile` aggregates a per-group value buffer (memory ∝ group
    size).  That's the documented cost of exactness: fine for bounded
    groups (5 event types here), use the approx_percentile sketch
    (mergeable, O(1/ε) state) when groups are unbounded — the engine
    ships both deliberately."""
    events = table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(value, 0.90)"), 6).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "sketch_hll_daily_merge",
    # No oracle: DuckDB's HLL implementation differs by design (same
    # reason as quality_approx_quantiles); tests/test_properties.py
    # asserts the estimates' error bounds and merge consistency.
    tags=("sketch", "statistics"),
)
def sketch_hll_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL sketches of distinct users,
    UNION-merged into a whole-period estimate WITHOUT re-scanning the
    facts — the pattern behind every incremental distinct-count dashboard
    (store a sketch per partition; answer any date range by merging
    sketches, never recounting).

    Scale: this is the only way distinct-counting composes at 100 TB —
    exact distinct is not mergeable across pre-aggregated partitions,
    HLL union is (O(KB) state per day, associative, re-aggregable).  The
    final row carries the merged estimate plus the day count it was
    assembled from."""
    events = table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").cast("string").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_unique_users"),
        F.count(F.lit(1)).alias("n_days"),
    )


@register(
    "quality_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk, count(*) AS n_orphans
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'orders.o_custkey->customer', count(*)
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem.l_partkey->part', count(*)
    FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_partkey IS NULL
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier', count(*)
    FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE s.s_suppkey IS NULL
    UNION ALL
    SELECT 'customer.c_nationkey->nation', count(*)
    FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE n.n_nationkey IS NULL
    UNION ALL
    SELECT 'nation.n_regionkey->region', count(*)
    FROM nation n LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_regionkey IS NULL
    """,
    tags=("quality", "referential-integrity"),
)
def quality_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the whole star schema: orphan
    counts for every foreign-key edge, in one result — the pre-flight
    check a pipeline runs before trusting joins (an orphan FK silently
    DROPS rows from every inner join downstream).

    Scale: each edge is a left-anti-shaped count; small dims broadcast,
    the two fact edges shuffle once each on their key.  All six audits
    share table scans where AQE can reuse them; orphan counts are the
    only driver traffic."""
    def orphans(child, child_key, parent, parent_key, label):
        c = table(spark, sf_dir, child)
        p = table(spark, sf_dir, parent).select(parent_key)
        return (
            c.join(p, c[child_key] == p[parent_key], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    checks = [
        orphans("lineitem", "l_orderkey", "orders", "o_orderkey",
                "lineitem.l_orderkey->orders"),
        orphans("orders", "o_custkey", "customer", "c_custkey",
                "orders.o_custkey->customer"),
        orphans("lineitem", "l_partkey", "part", "p_partkey",
                "lineitem.l_partkey->part"),
        orphans("lineitem", "l_suppkey", "supplier", "s_suppkey",
                "lineitem.l_suppkey->supplier"),
        orphans("customer", "c_nationkey", "nation", "n_nationkey",
                "customer.c_nationkey->nation"),
        orphans("nation", "n_regionkey", "region", "r_regionkey",
                "nation.n_regionkey->region"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "quality_snapshot_diff",
    oracle="""
    WITH now AS (
        SELECT event_id, user_id, event_type, value FROM events
    ),
    prev AS (
        SELECT event_id, user_id, event_type,
               CASE WHEN event_id % 97 = 0 THEN value + 0.5 ELSE value END
                   AS value
        FROM events
        WHERE event_id % 101 <> 0
        UNION ALL
        SELECT event_id + 10000000, user_id, event_type, value
        FROM events WHERE event_id % 103 = 0
    )
    SELECT
        CAST(SUM(CASE WHEN p.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_added,
        CAST(SUM(CASE WHEN n.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_removed,
        CAST(SUM(CASE WHEN n.event_id IS NOT NULL AND p.event_id IS NOT NULL
                       AND md5(concat_ws('|', n.user_id, n.event_type, n.value))
                           <> md5(concat_ws('|', p.user_id, p.event_type, p.value))
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        CAST(SUM(CASE WHEN n.event_id IS NOT NULL AND p.event_id IS NOT NULL
                       AND md5(concat_ws('|', n.user_id, n.event_type, n.value))
                           = md5(concat_ws('|', p.user_id, p.event_type, p.value))
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_identical
    FROM now n FULL OUTER JOIN prev p ON p.event_id = n.event_id
    """,
    tags=("quality", "reconciliation"),
)
def quality_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two versions of a table by key —
    added / removed / changed / identical counts — the migration and
    backfill acceptance check (did the rewrite change anything it
    shouldn't?).  The 'previous' snapshot is synthesized deterministically
    (drop every 101st key, perturb every 97th value, add phantom rows
    from every 103rd) so all four diff classes are non-empty and
    hash-verified.

    Row comparison goes through an md5 of the concatenated payload — at
    100 TB you diff FINGERPRINTS, not columns (one hash per row beats N
    column comparisons, and pre-computed row hashes make re-diffs
    incremental).  Scale: one full-outer hash join on the key; counts
    only to the driver."""
    now = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    base = table(spark, sf_dir, "events")
    prev = (
        base.filter(F.col("event_id") % 101 != 0)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.when(F.col("event_id") % 97 == 0, F.col("value") + 0.5)
            .otherwise(F.col("value"))
            .alias("value"),
        )
        .unionByName(
            base.filter(F.col("event_id") % 103 == 0).select(
                (F.col("event_id") + 10000000).alias("event_id"),
                "user_id",
                "event_type",
                "value",
            )
        )
    )

    def row_hash(side):
        return F.md5(
            F.concat_ws(
                "|",
                F.col(f"{side}_user_id"),
                F.col(f"{side}_event_type"),
                F.col(f"{side}_value"),
            ).cast("binary")
        )

    n = now.select(
        F.col("event_id").alias("n_key"),
        F.col("user_id").alias("n_user_id"),
        F.col("event_type").alias("n_event_type"),
        F.col("value").alias("n_value"),
    )
    p = prev.select(
        F.col("event_id").alias("p_key"),
        F.col("user_id").alias("p_user_id"),
        F.col("event_type").alias("p_event_type"),
        F.col("value").alias("p_value"),
    )
    joined = n.join(p, F.col("n_key") == F.col("p_key"), "full_outer")
    both = F.col("n_key").isNotNull() & F.col("p_key").isNotNull()
    same = row_hash("n") == row_hash("p")
    return joined.agg(
        F.sum(F.when(F.col("p_key").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_added"),
        F.sum(F.when(F.col("n_key").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.sum(F.when(both & ~same, 1).otherwise(0)).cast("bigint").alias("n_changed"),
        F.sum(F.when(both & same, 1).otherwise(0))
        .cast("bigint")
        .alias("n_identical"),
    )


#: Hashed-feature space and weight granularity for the linear quality
#: classifier.  4096 buckets is a stand-in for a fastText-style hashed
#: vocabulary; weights are integer centi-units so scoring is bit-exact.
MODEL_BUCKETS = 4096
_WEIGHT_MULT = 2654435761  # Knuth multiplicative-hash constant


@register(
    "quality_model_score_linear",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, string_split(lower(text), ' ') AS t
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang, len(t) AS n_tokens,
               CAST(list_aggregate(list_transform(t, w ->
                   (CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)
                    % {MODEL_BUCKETS}) * {_WEIGHT_MULT} % 2001 - 1000),
                   'sum') AS BIGINT) AS score_centi
        FROM toks
    )
    SELECT doc_id, lang, n_tokens, score_centi,
           score_centi >= 0 AS keep
    FROM scored
    """,
    tags=("quality", "model"),
)
def quality_model_score_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the GPT-3/CCNet classifier stage),
    expressed as a hashed linear model: each lowercased token hashes into
    one of MODEL_BUCKETS features, each bucket carries a deterministic
    integer centi-weight ((bucket * Knuth) % 2001 - 1000 ∈ [-1000, 1000]),
    and the document score is the sum over token OCCURRENCES — exactly the
    dot product of a hashed bag-of-words with a dense weight vector.  The
    weights here are hash-derived stand-ins; swapping in trained fastText
    weights is a literal-table substitution, the dataflow is identical.

    Scale: scoring is a narrow higher-order expression over the scan
    (transform → aggregate, whole-stage codegen), zero shuffle and zero
    Python — at 100 TB the classifier runs at scan speed, which is why
    production pipelines run the cheap linear filter BEFORE any pairwise
    dedup.  Integer arithmetic keeps the keep/drop frontier bit-exact
    across engines (no float dot-product drift)."""
    from kafka_stream_processing_spark.operators.dedup import hash64
    from kafka_stream_processing_spark.sources.tables import fanout

    d = fanout(table(spark, sf_dir, "documents"))
    t = F.split(F.lower(F.col("text")), " ")
    weight = lambda w: (  # noqa: E731
        (hash64(w) % MODEL_BUCKETS) * _WEIGHT_MULT % 2001 - 1000
    )
    score = F.aggregate(
        F.transform(t, weight),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        "lang",
        F.size(t).alias("n_tokens"),
        score.cast("bigint").alias("score_centi"),
        (score >= 0).alias("keep"),
    )


@register(
    "quality_ccnet_perplexity_buckets",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, string_split(lower(text), ' ') AS t
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               CAST(list_aggregate(list_transform(t, w ->
                   (CAST(('0x' || substr(md5(w || 'p'), 1, 15)) AS BIGINT)
                    % {MODEL_BUCKETS}) * {_WEIGHT_MULT} % 2001),
                   'sum') AS BIGINT) // len(t) AS ppl_centi
        FROM toks
        WHERE len(t) > 0
    ),
    ranked AS (
        SELECT doc_id, lang, ppl_centi,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY ppl_centi, doc_id) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM scored
    )
    SELECT doc_id, lang, ppl_centi,
           CASE WHEN rn * 3 <= n THEN 'head'
                WHEN rn * 3 <= 2 * n THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    """,
    tags=("quality", "ccnet"),
)
def quality_ccnet_perplexity_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020): score every
    document with a language-model perplexity proxy, then split EACH
    LANGUAGE into equal head/middle/tail terciles by rank — head is the
    cleanest third of that language's crawl, the slice CCNet keeps for
    pretraining.  The per-token loss here is the hashed stand-in (salt
    'p' on the shared quality-model kernel, non-negative 0..2000
    centi-nats, per-doc integer mean); swapping a real KenLM/GPT
    per-token NLL in is a column substitution.  Rank bucketing uses the
    integer frontier ``rn*3 <= k*n`` with a doc_id tiebreak so the
    tercile edges are bit-exact cross-engine (quantile thresholds on
    float scores are not).

    Scale: scoring is a narrow higher-order expression at scan speed;
    the tercile split is ONE shuffle on the language key — and language
    is the natural shard key of a multilingual crawl, so the window
    parallelizes across languages exactly as CCNet's per-language
    pipelines do.  State per language is a counter, not a buffer."""
    from pyspark.sql import Window

    from kafka_stream_processing_spark.operators.dedup import hash64
    from kafka_stream_processing_spark.sources.tables import fanout

    d = fanout(table(spark, sf_dir, "documents"))
    t = F.split(F.lower(F.col("text")), " ")
    loss = lambda w: (  # noqa: E731
        (hash64(F.concat(w, F.lit("p"))) % MODEL_BUCKETS) * _WEIGHT_MULT % 2001
    )
    total = F.aggregate(
        F.transform(t, loss), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    scored = d.filter(F.size(t) > 0).select(
        "doc_id",
        "lang",
        (total / F.size(t)).cast("bigint").alias("ppl_centi"),
    )
    w_rank = Window.partitionBy("lang").orderBy("ppl_centi", "doc_id")
    w_n = Window.partitionBy("lang")
    rn = F.row_number().over(w_rank)
    n = F.count(F.lit(1)).over(w_n)
    return scored.select(
        "doc_id",
        "lang",
        "ppl_centi",
        F.when(rn * 3 <= n, "head")
        .when(rn * 3 <= 2 * n, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


@register(
    "quality_unigram_lm_surprisal",
    oracle="""
    WITH occ AS (
        SELECT doc_id, lang, w
        FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
              FROM documents)
    ),
    vocab AS (
        SELECT w, count(*) AS c FROM occ GROUP BY w
    ),
    lm AS (
        SELECT w,
               CAST(round(-ln(CAST(c AS DOUBLE) / SUM(c) OVER ()), 6)
                    AS DECIMAL(18,6)) AS surp
        FROM vocab
    ),
    doc_occ AS (
        SELECT doc_id, lang, w, count(*) AS k
        FROM occ GROUP BY 1, 2, 3
    )
    SELECT d.doc_id, d.lang,
           CAST(SUM(d.k) AS BIGINT) AS n_words,
           CAST(SUM(d.k * lm.surp) AS DOUBLE) / SUM(d.k)
               AS mean_surprisal
    FROM doc_occ d JOIN lm ON d.w = lm.w
    GROUP BY 1, 2
    """,
    tags=("quality", "lm"),
)
def quality_unigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram language model scoring: train word
    probabilities ON the corpus itself (MLE over all occurrences — every
    scored word is in-vocabulary by construction), then score each
    document by its mean surprisal −(1/n)·Σ ln p(w).  This is the real
    trained-model counterpart to quality_ccnet_perplexity_buckets'
    hashed per-token-loss stand-in: documents full of rare words score
    high, boilerplate of corpus-dominant words scores low — the same
    axis a KenLM wiki-model orders a crawl by (Wenzek et al. 2020),
    learned here from the data with zero out-of-band artifacts.
    Cross-engine exactness: per-word surprisal is round(ln, 6) cast
    DECIMAL(18,6) (the shared round-ln convention); the per-doc sum is
    k·surp over (doc, word) pairs — exact decimal arithmetic, and the
    final mean is one IEEE double division of identical operands.

    Scale: training is ONE groupBy(word) with map-side combine — vocab
    is Heaps-law sublinear (~10⁷ rows at 100 TB, a few hundred MB: still
    a broadcast).  Scoring pre-aggregates (doc, word) counts so the
    probability join touches distinct-words-per-doc rows, not raw
    occurrences, then ONE groupBy(doc_id).  Bodies never shuffle; if
    vocab ever outgrows broadcast, the join keys are already word-hashed
    and skew-free."""
    from kafka_stream_processing_spark.operators.dedup import hash64  # noqa: F401
    from kafka_stream_processing_spark.sources.tables import fanout
    from pyspark.sql import Window

    d = fanout(table(spark, sf_dir, "documents"))
    occ = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = occ.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    lm = vocab.select(
        "w",
        F.round(
            -F.log(
                F.col("c").cast("double")
                / F.sum("c").over(Window.partitionBy())
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("surp"),
    )
    doc_occ = occ.groupBy("doc_id", "lang", "w").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        doc_occ.join(F.broadcast(lm), "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("k").cast("bigint").alias("n_words"),
            (
                F.sum(F.col("k") * F.col("surp")).cast("double")
                / F.sum("k")
            ).alias("mean_surprisal"),
        )
    )


#: Interpolation weight on the bigram term (Jelinek-Mercer smoothing);
#: the unigram back-off carries the rest.  A literal so both engines
#: fold the identical double.
LM_LAMBDA = 0.7

#: Beginning-of-document sentinel context ('<' never occurs in the
#: corpus vocabulary, so it cannot collide with a real word).
LM_BOS = "<s>"

#: Shared oracle CTEs: BOS-prefixed bigram occurrences (doc_id, lang,
#: w1, w2) — the single source both bigram LMs build on (interpolated
#: and Kneser-Ney), mirrored Spark-side by ``_bos_bigrams``.
_BI_CTES = f"""toks AS (
        SELECT doc_id, lang,
               list_prepend('{LM_BOS}', string_split(text, ' ')) AS t
        FROM documents
    ),
    bi AS (
        SELECT doc_id, lang, t[k] AS w1, t[k + 1] AS w2
        FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) u(k)
    )"""


def _bos_bigrams(d: DataFrame) -> DataFrame:
    """BOS-prefixed bigram occurrences (doc_id, lang, w1, w2) — the
    Spark mirror of ``_BI_CTES``."""
    t = F.concat(F.array(F.lit(LM_BOS)), F.split("text", " "))
    toks = d.select("doc_id", "lang", t.alias("t"))
    return toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1).alias("w1"),
                F.slice("t", 2, F.size("t") - 1).alias("w2"),
            )
        ).alias("p"),
    ).select(
        "doc_id", "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


@register(
    "quality_bigram_lm_interpolated",
    oracle=f"""
    WITH {_BI_CTES},
    uni AS (
        SELECT w2 AS w, count(*) AS c FROM bi GROUP BY w2
    ),
    cb AS (
        SELECT w1, w2, count(*) AS c FROM bi GROUP BY 1, 2
    ),
    ctx AS (
        SELECT w1, SUM(c) AS c FROM cb GROUP BY w1
    ),
    lm AS (
        SELECT cb.w1, cb.w2,
               CAST(round(-ln(
                   {LM_LAMBDA} * (CAST(cb.c AS DOUBLE) / ctx.c)
                 + {1 - LM_LAMBDA} * (CAST(uni.c AS DOUBLE)
                                      / (SELECT SUM(c) FROM uni))), 6)
               AS DECIMAL(18,6)) AS surp
        FROM cb
        JOIN ctx ON cb.w1 = ctx.w1
        JOIN uni ON cb.w2 = uni.w
    ),
    doc_bi AS (
        SELECT doc_id, lang, w1, w2, count(*) AS k
        FROM bi GROUP BY 1, 2, 3, 4
    )
    SELECT d.doc_id, d.lang,
           CAST(SUM(d.k) AS BIGINT) AS n_tokens,
           CAST(SUM(d.k * lm.surp) AS DOUBLE) / SUM(d.k)
               AS mean_surprisal
    FROM doc_bi d
    JOIN lm ON d.w1 = lm.w1 AND d.w2 = lm.w2
    GROUP BY 1, 2
    """,
    tags=("quality", "lm"),
)
def quality_bigram_lm_interpolated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interpolated bigram language model (Jelinek-Mercer smoothing):
    p(w₂|w₁) = λ·c(w₁w₂)/c(w₁·) + (1−λ)·c(w₂)/N, trained on the corpus
    and scoring every token in context — the first model in this engine
    family that penalizes IMPROBABLE SEQUENCES of common words, not just
    rare vocabulary (quality_unigram_lm_surprisal's blind spot; shuffled
    boilerplate scores identically there, higher here).  A '<s>'
    sentinel prepended per document gives the first token a real
    conditioning context (its ctx count = the document count), so every
    whitespace token is scored exactly once by one rule.  Cross-engine
    exactness: both probability terms are IEEE double divisions of
    identical integers, the λ-mix is two exact multiply-adds, and the
    single ln rounds to 6 decimals into DECIMAL(18,6) — the engine's
    round-ln convention — before the exact per-doc decimal sum.

    Scale: training is two groupBys (bigram, unigram) with map-side
    combine; the bigram table is O(distinct bigrams) — Heaps-law
    sublinear but bigger than vocab, so the scoring join is a SHUFFLE
    join on (w₁,w₂) by design (no forced broadcast; AQE picks broadcast
    while it fits).  Scoring pre-aggregates per-doc DISTINCT bigrams so
    join input is bounded by doc distinctness, then ONE groupBy(doc_id).
    Bodies never shuffle."""
    from pyspark.sql import Window

    from kafka_stream_processing_spark.sources.tables import fanout

    d = fanout(table(spark, sf_dir, "documents"))
    pairs = _bos_bigrams(d)
    uni = pairs.groupBy(F.col("w2").alias("w")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cb = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    ctx = cb.groupBy("w1").agg(F.sum("cb").alias("cc"))
    n_total = F.sum("c").over(Window.partitionBy())
    uni_p = uni.select(
        "w", (F.col("c").cast("double") / n_total).alias("pu")
    )
    lm = (
        cb.join(ctx, "w1")
        .join(uni_p, F.col("w2") == F.col("w"))
        .select(
            "w1",
            "w2",
            F.round(
                -F.log(
                    F.lit(LM_LAMBDA)
                    * (F.col("cb").cast("double") / F.col("cc"))
                    + F.lit(1 - LM_LAMBDA) * F.col("pu")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("surp"),
        )
    )
    doc_bi = pairs.groupBy("doc_id", "lang", "w1", "w2").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        doc_bi.join(lm, ["w1", "w2"])
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("k").cast("bigint").alias("n_tokens"),
            (
                F.sum(F.col("k") * F.col("surp")).cast("double")
                / F.sum("k")
            ).alias("mean_surprisal"),
        )
    )


#: Absolute discount for Kneser-Ney smoothing — the textbook constant;
#: a literal so both engines fold the identical double.
KN_DISCOUNT = 0.75


@register(
    "quality_bigram_kneser_ney",
    oracle=f"""
    WITH {_BI_CTES},
    cb AS (
        SELECT w1, w2, count(*) AS c FROM bi GROUP BY 1, 2
    ),
    ctx AS (
        SELECT w1, SUM(c) AS total, count(*) AS n1fwd FROM cb GROUP BY w1
    ),
    bwd AS (
        SELECT w2, count(*) AS n1bwd FROM cb GROUP BY w2
    ),
    lm AS (
        SELECT cb.w1, cb.w2,
               CAST(round(-ln(
                   ((CAST(cb.c AS DOUBLE) - {KN_DISCOUNT}) / ctx.total)
                 + (({KN_DISCOUNT} * ctx.n1fwd) / ctx.total)
                   * (CAST(bwd.n1bwd AS DOUBLE)
                      / (SELECT count(*) FROM cb))), 6)
               AS DECIMAL(18,6)) AS surp
        FROM cb
        JOIN ctx ON cb.w1 = ctx.w1
        JOIN bwd ON cb.w2 = bwd.w2
    ),
    doc_bi AS (
        SELECT doc_id, lang, w1, w2, count(*) AS k
        FROM bi GROUP BY 1, 2, 3, 4
    )
    SELECT d.doc_id, d.lang,
           CAST(SUM(d.k) AS BIGINT) AS n_tokens,
           CAST(SUM(d.k * lm.surp) AS DOUBLE) / SUM(d.k)
               AS mean_surprisal
    FROM doc_bi d
    JOIN lm ON d.w1 = lm.w1 AND d.w2 = lm.w2
    GROUP BY 1, 2
    """,
    tags=("quality", "lm"),
)
def quality_bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram LM (Kneser & Ney 1995; the Chen &
    Goodman 1999 benchmark winner and KenLM's default — the smoothing a
    CCNet-style quality filter actually runs): absolute discounting
    p(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁·) + D·N₁₊(w₁·)/c(w₁·) · p_cont(w₂),
    where the CONTINUATION probability p_cont(w₂) = N₁₊(·w₂)/N₁₊(··)
    counts how many distinct contexts a word follows rather than how
    often it occurs — the insight that 'francisco' is frequent but only
    ever follows 'san', so its back-off mass should be tiny.  That
    continuation-vs-frequency distinction is exactly what the
    interpolated model above cannot express; the three LMs (unigram /
    JM-interpolated / KN) form the standard smoothing ladder.  Every
    scored bigram is in-vocabulary (self-trained), so c ≥ 1 > D and the
    max() truncation never binds.  Cross-engine exactness: the
    probability is a fixed parenthesized chain of IEEE ops on
    integer-derived doubles, then one round(ln, 6) into DECIMAL(18,6)
    before the exact per-doc sum — the shared LM convention.

    Scale: identical dataflow to the interpolated model (one BOS-bigram
    kernel, _bos_bigrams, shared verbatim): two training groupBys plus
    one distinct-context groupBy, a shuffle join of per-doc DISTINCT
    bigrams against the O(distinct bigrams) LM table, ONE
    groupBy(doc_id).  Bodies never shuffle."""
    from kafka_stream_processing_spark.sources.tables import fanout

    d = fanout(table(spark, sf_dir, "documents"))
    pairs = _bos_bigrams(d)
    cb = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    ctx = cb.groupBy("w1").agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("n1fwd")
    )
    bwd = cb.groupBy("w2").agg(F.count(F.lit(1)).alias("n1bwd"))
    from pyspark.sql import Window

    n1tot = F.count(F.lit(1)).over(Window.partitionBy())
    cb_tot = cb.withColumn("n1tot", n1tot)
    lm = (
        cb_tot.join(ctx, "w1")
        .join(bwd, "w2")
        .select(
            "w1",
            "w2",
            F.round(
                -F.log(
                    (
                        (F.col("c").cast("double") - F.lit(KN_DISCOUNT))
                        / F.col("total")
                    )
                    + (
                        (F.lit(KN_DISCOUNT) * F.col("n1fwd"))
                        / F.col("total")
                    )
                    * (F.col("n1bwd").cast("double") / F.col("n1tot"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("surp"),
        )
    )
    doc_bi = pairs.groupBy("doc_id", "lang", "w1", "w2").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        doc_bi.join(lm, ["w1", "w2"])
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("k").cast("bigint").alias("n_tokens"),
            (
                F.sum(F.col("k") * F.col("surp")).cast("double")
                / F.sum("k")
            ).alias("mean_surprisal"),
        )
    )


@register(
    "quality_length_outlier_mad",
    oracle="""
    WITH x AS (
        SELECT doc_id, n_chars FROM documents
    ),
    med AS (
        SELECT n_chars AS m FROM (
            SELECT n_chars, doc_id,
                   row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM x
        ) WHERE rn = (n + 1) // 2
    ),
    dev AS (
        SELECT x.doc_id, x.n_chars, abs(x.n_chars - med.m) AS ad, med.m
        FROM x, med
    ),
    mad AS (
        SELECT ad AS mad FROM (
            SELECT ad, doc_id,
                   row_number() OVER (ORDER BY ad, doc_id) AS rn,
                   count(*) OVER () AS n
            FROM dev
        ) WHERE rn = (n + 1) // 2
    )
    SELECT dev.doc_id, dev.n_chars,
           CAST(dev.m AS BIGINT) AS median_chars,
           CAST(dev.ad AS BIGINT) AS abs_dev,
           CAST(mad.mad AS BIGINT) AS mad,
           dev.ad > 3 * mad.mad AS is_outlier
    FROM dev, mad
    """,
    tags=("quality", "robust"),
)
def quality_length_outlier_mad(
    spark: SparkSession, sf_dir: str, frontier: str = "exact"
) -> DataFrame:
    """Robust length-outlier detection via median absolute deviation:
    flag documents with |len − median| > 3·MAD — the robust-statistics
    replacement for mean±3σ, whose mean and σ are themselves dragged by
    the very outliers being hunted (one 10 GB concatenation artifact
    shifts a mean; it cannot shift a median).  Both the median and the
    MAD use the lower-median integer rank frontier rn = (n+1)÷2 with a
    doc_id tiebreak — ENTIRELY integer arithmetic end to end, the only
    operator family where even the threshold compare (ad > 3·mad) never
    touches a float.

    Scale: two rank frontiers = two total-order sorts of a NARROW
    (value, id) projection at oracle scale; ``frontier="approx"`` is
    the IMPLEMENTED 100 TB path — each median comes from ONE
    percentile_approx aggregate (operators.frontier.quantile_cuts; GK
    sketch, map-side mergeable, no total-order sort), same downstream
    shape; agreement pinned in tests/test_frontier.py.  Either way the
    per-doc flagging pass broadcasts the two 1-row scalars."""
    from pyspark.sql import Window

    from kafka_stream_processing_spark.operators.frontier import (
        quantile_cuts,
    )

    d = table(spark, sf_dir, "documents")
    x = d.select("doc_id", "n_chars")

    def lower_median(df: DataFrame, col: str) -> DataFrame:
        if frontier == "approx":
            return quantile_cuts(df, col, [(1, 2)], mode="approx").select(
                F.col("cut_0").alias("m")
            )
        w = Window.orderBy(col, "doc_id")
        wn = Window.partitionBy()
        return (
            df.withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count(F.lit(1)).over(wn))
            .filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .select(F.col(col).alias("m"))
        )

    med = lower_median(x, "n_chars")
    dev = x.crossJoin(F.broadcast(med)).select(
        "doc_id",
        "n_chars",
        F.col("m"),
        F.abs(F.col("n_chars") - F.col("m")).alias("ad"),
    )
    mad = lower_median(
        dev.select("doc_id", F.col("ad").alias("admc")), "admc"
    ).select(F.col("m").alias("mad"))
    return dev.crossJoin(F.broadcast(mad)).select(
        "doc_id",
        "n_chars",
        F.col("m").cast("bigint").alias("median_chars"),
        F.col("ad").cast("bigint").alias("abs_dev"),
        F.col("mad").cast("bigint").alias("mad"),
        (F.col("ad") > 3 * F.col("mad")).alias("is_outlier"),
    )


#: Shared oracle CTEs for the trigram KN model: double-BOS-prefixed
#: trigram occurrences (doc_id, lang, w1, w2, w3).
_TRI_CTES = f"""toks3 AS (
        SELECT doc_id, lang,
               list_prepend('{LM_BOS}',
                   list_prepend('{LM_BOS}', string_split(text, ' '))) AS t
        FROM documents
    ),
    tri AS (
        SELECT doc_id, lang, t[k] AS w1, t[k + 1] AS w2, t[k + 2] AS w3
        FROM toks3, LATERAL unnest(generate_series(1, len(t) - 2)) u(k)
    )"""


@register(
    "quality_trigram_kneser_ney",
    oracle=f"""
    WITH {_TRI_CTES},
    c3 AS (
        SELECT w1, w2, w3, count(*) AS c FROM tri GROUP BY 1, 2, 3
    ),
    ctx3 AS (
        SELECT w1, w2, SUM(c) AS total, count(*) AS n1 FROM c3 GROUP BY 1, 2
    ),
    c2 AS (
        SELECT w2, w3, count(DISTINCT w1) AS c FROM tri GROUP BY 1, 2
    ),
    ctx2 AS (
        SELECT w2, SUM(c) AS total, count(*) AS n1 FROM c2 GROUP BY 1
    ),
    c1 AS (
        SELECT w3, count(*) AS c FROM c2 GROUP BY w3
    ),
    lm AS (
        SELECT c3.w1, c3.w2, c3.w3,
               CAST(round(-ln(
                   ((CAST(c3.c AS DOUBLE) - {KN_DISCOUNT}) / ctx3.total)
                 + (({KN_DISCOUNT} * ctx3.n1) / ctx3.total)
                   * (((CAST(c2.c AS DOUBLE) - {KN_DISCOUNT}) / ctx2.total)
                      + (({KN_DISCOUNT} * ctx2.n1) / ctx2.total)
                        * (CAST(c1.c AS DOUBLE)
                           / (SELECT SUM(c) FROM c1)))), 6)
               AS DECIMAL(18,6)) AS surp
        FROM c3
        JOIN ctx3 ON ctx3.w1 = c3.w1 AND ctx3.w2 = c3.w2
        JOIN c2 ON c2.w2 = c3.w2 AND c2.w3 = c3.w3
        JOIN ctx2 ON ctx2.w2 = c3.w2
        JOIN c1 ON c1.w3 = c3.w3
    ),
    doc_tri AS (
        SELECT doc_id, lang, w1, w2, w3, count(*) AS k
        FROM tri GROUP BY 1, 2, 3, 4, 5
    )
    SELECT d.doc_id, d.lang,
           CAST(SUM(d.k) AS BIGINT) AS n_tokens,
           CAST(SUM(d.k * lm.surp) AS DOUBLE) / SUM(d.k)
               AS mean_surprisal
    FROM doc_tri d
    JOIN lm ON d.w1 = lm.w1 AND d.w2 = lm.w2 AND d.w3 = lm.w3
    GROUP BY 1, 2
    """,
    tags=("quality", "lm"),
)
def quality_trigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram Kneser-Ney with the FULL two-level backoff recursion
    (Chen & Goodman 1999's interpolated form — the construction KenLM
    generalizes to 5-grams): the highest order discounts RAW trigram
    counts; the bigram level below it is built from CONTINUATION counts
    N₁₊(·w₂w₃) (how many distinct left-contexts attest the bigram —
    counted from the order above, never raw bigrams); the unigram floor
    counts distinct middles per word over that same table.  A double
    '<s>' prefix gives every token a full trigram context, so each
    whitespace token is scored exactly once by one three-level rule.
    This completes the n-gram ladder (unigram MLE → JM bigram → KN
    bigram → KN trigram) at the order where context genuinely
    disambiguates ('hash join build' vs 'hash join probe').
    Cross-engine exactness: a fixed parenthesized chain of IEEE ops on
    integer-derived doubles, one round(ln, 6) into DECIMAL(18,6), exact
    per-doc decimal sums — the LM family convention.

    Scale: four training groupBys (trigram, trigram-context, bigram
    continuation — a count-distinct over left contexts, plans as
    partial-distinct then count — and its margins); the scoring join
    keys on (w₁,w₂,w₃) against the O(distinct trigrams) LM table —
    Heaps-sublinear but the largest table in the family, so the join is
    a shuffle join by design with per-doc DISTINCT trigrams as probe
    input.  Bodies never shuffle."""
    from pyspark.sql import Window

    from kafka_stream_processing_spark.sources.tables import fanout

    d = fanout(table(spark, sf_dir, "documents"))
    t = F.concat(
        F.array(F.lit(LM_BOS), F.lit(LM_BOS)), F.split("text", " ")
    )
    toks = d.select("doc_id", "lang", t.alias("t"))
    n = F.size("t")
    tri = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, n - 2).alias("w1"),
                F.slice("t", 2, n - 2).alias("w2"),
                F.slice("t", 3, n - 2).alias("w3"),
            )
        ).alias("p"),
    ).select(
        "doc_id",
        "lang",
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
        F.col("p.w3").alias("w3"),
    )
    c3 = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c3"))
    ctx3 = c3.groupBy("w1", "w2").agg(
        F.sum("c3").alias("t3"), F.count(F.lit(1)).alias("n13")
    )
    c2 = tri.groupBy("w2", "w3").agg(F.countDistinct("w1").alias("c2"))
    ctx2 = c2.groupBy("w2").agg(
        F.sum("c2").alias("t2"), F.count(F.lit(1)).alias("n12")
    )
    c1 = c2.groupBy("w3").agg(F.count(F.lit(1)).alias("c1"))
    total1 = F.sum("c1").over(Window.partitionBy())
    c1t = c1.withColumn("tot1", total1)
    D = KN_DISCOUNT
    p2 = (
        (F.col("c2").cast("double") - F.lit(D)) / F.col("t2")
    ) + ((F.lit(D) * F.col("n12")) / F.col("t2")) * (
        F.col("c1").cast("double") / F.col("tot1")
    )
    p3 = (
        (F.col("c3").cast("double") - F.lit(D)) / F.col("t3")
    ) + ((F.lit(D) * F.col("n13")) / F.col("t3")) * p2
    lm = (
        c3.join(ctx3, ["w1", "w2"])
        .join(c2, ["w2", "w3"])
        .join(ctx2, "w2")
        .join(c1t, "w3")
        .select(
            "w1",
            "w2",
            "w3",
            F.round(-F.log(p3), 6).cast("decimal(18,6)").alias("surp"),
        )
    )
    doc_tri = tri.groupBy("doc_id", "lang", "w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        doc_tri.join(lm, ["w1", "w2", "w3"])
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("k").cast("bigint").alias("n_tokens"),
            (
                F.sum(F.col("k") * F.col("surp")).cast("double")
                / F.sum("k")
            ).alias("mean_surprisal"),
        )
    )


#: Kolmogorov-Smirnov critical coefficient at alpha = 0.05.
KS_C005 = 1.358


@register(
    "quality_ks_drift_nchars",
    oracle=f"""
    WITH rows_t AS (
        SELECT n_chars AS v,
               CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_a,
               CASE WHEN source = 'src0' THEN 0 ELSE 1 END AS is_b
        FROM documents
    ),
    hist AS (
        SELECT v, SUM(is_a) AS ca_i, SUM(is_b) AS cb_i
        FROM rows_t GROUP BY v
    ),
    cum AS (
        SELECT v,
               SUM(ca_i) OVER (ORDER BY v) AS ca,
               SUM(cb_i) OVER (ORDER BY v) AS cb
        FROM hist
    ),
    tot AS (
        SELECT SUM(is_a) AS na, SUM(is_b) AS nb FROM rows_t
    )
    SELECT CAST(tot.na AS BIGINT) AS na,
           CAST(tot.nb AS BIGINT) AS nb,
           CAST(count(*) AS BIGINT) AS n_values,
           max(abs(CAST(cum.ca AS DOUBLE) / tot.na
                   - CAST(cum.cb AS DOUBLE) / tot.nb)) AS ks_d,
           {KS_C005} * sqrt((CAST(tot.na AS DOUBLE) + tot.nb)
                            / (CAST(tot.na AS DOUBLE) * tot.nb))
               AS critical_005,
           max(abs(CAST(cum.ca AS DOUBLE) / tot.na
                   - CAST(cum.cb AS DOUBLE) / tot.nb))
             > {KS_C005} * sqrt((CAST(tot.na AS DOUBLE) + tot.nb)
                                / (CAST(tot.na AS DOUBLE) * tot.nb))
               AS drift
    FROM cum, tot
    GROUP BY tot.na, tot.nb
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_ks_drift_nchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test — distribution
    monitoring as a query: D = max |ECDF_A − ECDF_B| between the src0
    slice and the rest of the corpus over document length, against the
    α=0.05 critical value 1.358·√((n_a+n_b)/(n_a·n_b)).  This is the
    statistical complement to quality_snapshot_diff's row-level
    reconciliation: a backfill can leave every row hash intact while a
    NEW ingest source silently shifts the length distribution — exactly
    the change a KS gate on each arriving batch catches before the
    corpus drifts.  Exactness: ECDFs are double divisions of exact
    cumulative integers, max is order-free, and IEEE sqrt is correctly
    rounded — every output bit matches cross-engine with zero
    quantization needed.

    Scale: the per-value histogram is ONE groupBy (map-side combined to
    distinct-values rows); the cumulative window runs over the
    VALUE-DISTINCT histogram, not raw rows — for a discrete or binned
    column that is thousands of rows regardless of corpus size (bin
    continuous columns first, the standard KS-on-big-data move)."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    is_a = (F.col("source") == "src0").cast("bigint")
    rows_t = d.select(
        F.col("n_chars").alias("v"),
        is_a.alias("is_a"),
        (1 - is_a).alias("is_b"),
    )
    hist = rows_t.groupBy("v").agg(
        F.sum("is_a").alias("ca_i"), F.sum("is_b").alias("cb_i")
    )
    w = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "v",
        F.sum("ca_i").over(w).alias("ca"),
        F.sum("cb_i").over(w).alias("cb"),
    )
    tot = rows_t.agg(
        F.sum("is_a").alias("na"), F.sum("is_b").alias("nb")
    )
    j = cum.crossJoin(F.broadcast(tot))
    diff = F.abs(
        F.col("ca").cast("double") / F.col("na")
        - F.col("cb").cast("double") / F.col("nb")
    )
    crit = F.lit(KS_C005) * F.sqrt(
        (F.col("na").cast("double") + F.col("nb"))
        / (F.col("na").cast("double") * F.col("nb"))
    )
    return j.groupBy("na", "nb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.max(diff).alias("ks_d"),
        F.any_value(crit).alias("critical_005"),
        (F.max(diff) > F.any_value(crit)).alias("drift"),
    ).select(
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
        "n_values",
        "ks_d",
        "critical_005",
        "drift",
    )


#: Upper-tail chi-squared critical values at alpha = 0.05 by degrees of
#: freedom (literals, so both engines compare against identical doubles).
#: Standard published table through dof=30; beyond it both engines fall
#: back to the Wilson-Hilferty cube approximation (below) so the drift
#: gate NEVER returns a NULL verdict — a gate that silently stops gating
#: when the category count grows is worse than a slightly approximate
#: threshold.
CHI2_CRIT_005 = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070,
                 6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919, 10: 18.307,
                 11: 19.675, 12: 21.026, 13: 22.362, 14: 23.685,
                 15: 24.996, 16: 26.296, 17: 27.587, 18: 28.869,
                 19: 30.144, 20: 31.410, 21: 32.671, 22: 33.924,
                 23: 35.172, 24: 36.415, 25: 37.652, 26: 38.885,
                 27: 40.113, 28: 41.337, 29: 42.557, 30: 43.773}

#: z_{0.95} for the Wilson-Hilferty fallback (dof > 30):
#: crit = dof * b^3 with b = 1 - 2/(9*dof) + z*sqrt(2/(9*dof)).
#: The cube is spelled b*b*b (not pow) and sqrt/divide are IEEE
#: correctly-rounded, so the fallback is bit-identical cross-engine
#: just like the literal table.
_WH_Z095 = 1.6448536269514722

_WH_B_SQL = (
    f"(1 - 2.0 / (9 * dof) + {_WH_Z095} * sqrt(2.0 / (9 * dof)))"
)

_CHI2_CRIT_SQL = "CASE " + " ".join(
    f"WHEN dof = {k} THEN {v}" for k, v in CHI2_CRIT_005.items()
) + f" ELSE dof * {_WH_B_SQL} * {_WH_B_SQL} * {_WH_B_SQL} END"


@register(
    "quality_chi2_categorical_drift",
    oracle=f"""
    WITH rows_t AS (
        SELECT lang AS cat,
               CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_a
        FROM documents
    ),
    cells AS (
        SELECT cat,
               SUM(is_a) AS oa,
               SUM(1 - is_a) AS ob
        FROM rows_t GROUP BY cat
    ),
    tot AS (
        SELECT SUM(oa) AS na, SUM(ob) AS nb, count(*) AS k FROM cells
    ),
    terms AS (
        SELECT c.cat,
               CAST(c.oa AS DOUBLE) AS oa, CAST(c.ob AS DOUBLE) AS ob,
               (CAST(c.oa + c.ob AS DOUBLE) * t.na) / (t.na + t.nb) AS ea,
               (CAST(c.oa + c.ob AS DOUBLE) * t.nb) / (t.na + t.nb) AS eb
        FROM cells c, tot t
    ),
    stat AS (
        SELECT SUM(CAST((oa - ea) * (oa - ea) / ea
                        + (ob - eb) * (ob - eb) / eb
                        AS DECIMAL(18,12))) AS chi2,
               count(*) - 1 AS dof
        FROM terms
    )
    SELECT CAST(dof AS INT) AS dof,
           CAST(chi2 AS DOUBLE) AS chi2,
           {_CHI2_CRIT_SQL} AS critical_005,
           CAST(chi2 AS DOUBLE) > {_CHI2_CRIT_SQL} AS drift
    FROM stat
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_chi2_categorical_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chi-squared homogeneity test — the CATEGORICAL drift gate pairing
    the KS test's continuous one: does the language distribution of the
    src0 slice match the rest of the corpus?  χ² = Σ (O−E)²/E over the
    2×k contingency table with expected counts from pooled marginals,
    compared to the α=0.05 critical value for k−1 degrees of freedom
    (a literal table through dof=30, a deterministic Wilson-Hilferty
    cube beyond it — the incomplete-gamma p-value is libm-dependent,
    the decision threshold is not, and the gate never returns a NULL
    verdict however many categories arrive).  Per-cell terms are
    quantized to
    DECIMAL(18,12) before the sum so the statistic is order-independent
    and bit-identical cross-engine.

    Scale: one groupBy(category) with map-side combine → a k-row cell
    table; everything after runs on k rows.  This is the gate for
    source/language/format mix shift — the drifts a KS on a single
    numeric column cannot see."""
    d = table(spark, sf_dir, "documents")
    is_a = (F.col("source") == "src0").cast("bigint")
    cells = d.select(F.col("lang").alias("cat"), is_a.alias("is_a")).groupBy(
        "cat"
    ).agg(
        F.sum("is_a").alias("oa"),
        F.sum(1 - F.col("is_a")).alias("ob"),
    )
    tot = cells.agg(
        F.sum("oa").alias("na"),
        F.sum("ob").alias("nb"),
        F.count(F.lit(1)).alias("k"),
    )
    t = cells.crossJoin(F.broadcast(tot))
    ea = ((F.col("oa") + F.col("ob")).cast("double") * F.col("na")) / (
        F.col("na") + F.col("nb")
    )
    eb = ((F.col("oa") + F.col("ob")).cast("double") * F.col("nb")) / (
        F.col("na") + F.col("nb")
    )
    oa = F.col("oa").cast("double")
    ob = F.col("ob").cast("double")
    term = (
        (oa - ea) * (oa - ea) / ea + (ob - eb) * (ob - eb) / eb
    ).cast("decimal(18,12)")
    stat = t.agg(
        F.sum(term).alias("chi2"),
        (F.count(F.lit(1)) - 1).alias("dof"),
    )
    # Wilson-Hilferty fallback for dof > 30 — same b*b*b spelling as the
    # oracle CASE so the two engines compare against identical doubles.
    dof_d = F.col("dof").cast("double")
    wh_b = (
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * dof_d)
        + F.lit(_WH_Z095) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof_d))
    )
    crit = dof_d * wh_b * wh_b * wh_b
    for k, v in CHI2_CRIT_005.items():
        crit = F.when(F.col("dof") == k, F.lit(v)).otherwise(crit)
    return stat.select(
        F.col("dof").cast("int").alias("dof"),
        F.col("chi2").cast("double").alias("chi2"),
        crit.alias("critical_005"),
        (F.col("chi2").cast("double") > crit).alias("drift"),
    )


@register(
    "quality_js_divergence_sources",
    oracle="""
    WITH occ AS (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    cnt AS (
        SELECT source, w, count(*) AS c FROM occ GROUP BY 1, 2
    ),
    tot AS (
        SELECT source, SUM(c) AS n FROM cnt GROUP BY source
    ),
    p AS (
        SELECT cnt.source, cnt.w, CAST(cnt.c AS DOUBLE) / tot.n AS p
        FROM cnt JOIN tot USING (source)
    ),
    prs AS (
        SELECT a.source AS sa, b.source AS sb
        FROM tot a, tot b WHERE a.source < b.source
    ),
    vocab AS (SELECT DISTINCT w FROM cnt),
    grid AS (
        SELECT prs.sa, prs.sb, v.w,
               coalesce(pa.p, 0) AS pa, coalesce(pb.p, 0) AS pb
        FROM prs
        CROSS JOIN vocab v
        LEFT JOIN p pa ON pa.source = prs.sa AND pa.w = v.w
        LEFT JOIN p pb ON pb.source = prs.sb AND pb.w = v.w
    ),
    terms AS (
        SELECT sa, sb,
               CASE WHEN pa > 0
                    THEN CAST(round(pa * ln(pa / ((pa + pb) / 2)), 6)
                         AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END AS ta,
               CASE WHEN pb > 0
                    THEN CAST(round(pb * ln(pb / ((pa + pb) / 2)), 6)
                         AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END AS tb
        FROM grid
    )
    SELECT sa AS source_a, sb AS source_b,
           0.5 * (CAST(SUM(ta) AS DOUBLE) + CAST(SUM(tb) AS DOUBLE))
               AS js_divergence
    FROM terms
    GROUP BY 1, 2
    """,
    tags=("quality", "statistics", "mixture"),
)
def quality_js_divergence_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source-domain word
    distributions — the information-theoretic domain-similarity matrix
    mixture design actually consults (DoReMi-style reweighting and
    dedup-across-sources both assume you know WHICH domains are
    near-duplicates in distribution; JS is the symmetric, bounded
    [0, ln 2] measure for that, vs chi2's same/different verdict).
    JS(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M) with M the even mixture; each
    p·ln(p/m) term is round-6-quantized into DECIMAL(18,6) (the LM
    family's ln convention) so the per-pair sum is exact and
    order-free; zero-probability terms contribute exactly 0 by the KL
    convention.

    SPARSE plan (the oracle keeps the dense sources²·vocab grid as the
    independent formulation): a word contributes a non-trivial term
    only when BOTH sources carry it — an a-only word's term is exactly
    round(pa·ln 2, 6), because m = pa/2 and pa/(pa/2) is EXACTLY 2.0
    in IEEE (halving and the division are both exact).  So per pair,
    Σ ta = Σ_both round(pa·ln(pa/m), 6)
         + [Q(sa) − Σ_both round(pa·ln 2, 6)]
    with Q(s) = Σ_w round(p·ln 2, 6) a per-SOURCE decimal total —
    and DECIMAL sums are exact and associative, so the complement
    subtraction reproduces the dense grid's sum bit-for-bit.  One
    self-equi-join on word replaces crossJoin(broadcast(vocab)).

    Scale: one groupBy(source, word) builds every distribution in a
    single pass; the self-join on word emits ≤ sources² rows per word
    (sources are dozens, so stopword skew is bounded); NO vocabulary
    broadcast and NO dense grid — at 10⁷–10⁸ terms the dense grid was
    the scale-killer, the sparse intersection is Heaps-sublinear.
    This is what makes the docstring's "costs less than one corpus
    scan" claim actually true."""
    d = table(spark, sf_dir, "documents")
    occ = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    cnt = occ.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    ln2 = F.log(F.lit(2.0))
    p = cnt.join(tot, "source").select(
        "source",
        "w",
        (F.col("c").cast("double") / F.col("n")).alias("p"),
    ).withColumn(
        # the word's term if the OTHER source lacks it: round(p*ln2, 6)
        "q", F.round(F.col("p") * ln2, 6).cast("decimal(18,6)")
    ).localCheckpoint(eager=True)
    # ^ three consumers (pa, pb, qtot) would each replay the corpus
    # explode+groupBy without this; the checkpoint pins "one corpus
    # scan" physically — p itself is vocab×sources (Heaps-sublinear).
    qtot = p.groupBy("source").agg(F.sum("q").alias("q_total"))
    pa = p.select(
        F.col("source").alias("sa"),
        "w",
        F.col("p").alias("pa"),
        F.col("q").alias("qa"),
    )
    pb = p.select(
        F.col("source").alias("sb"),
        "w",
        F.col("p").alias("pb"),
        F.col("q").alias("qb"),
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term_a = F.round(F.col("pa") * F.log(F.col("pa") / m), 6).cast(
        "decimal(18,6)"
    )
    term_b = F.round(F.col("pb") * F.log(F.col("pb") / m), 6).cast(
        "decimal(18,6)"
    )
    inter = (
        pa.join(pb, "w")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(
            F.sum(term_a).alias("ta_both"),
            F.sum(term_b).alias("tb_both"),
            F.sum("qa").alias("qa_both"),
            F.sum("qb").alias("qb_both"),
        )
    )
    # every ordered pair, even ones with an EMPTY word intersection
    # (their JS is ½(Q(sa)+Q(sb)) — two fully disjoint distributions)
    prs = (
        qtot.select(
            F.col("source").alias("sa"), F.col("q_total").alias("qa_total")
        )
        .crossJoin(
            qtot.select(
                F.col("source").alias("sb"),
                F.col("q_total").alias("qb_total"),
            )
        )
        .filter(F.col("sa") < F.col("sb"))
    )
    zero = F.lit(0).cast("decimal(18,6)")
    sum_ta = F.coalesce("ta_both", zero) + (
        F.col("qa_total") - F.coalesce("qa_both", zero)
    )
    sum_tb = F.coalesce("tb_both", zero) + (
        F.col("qb_total") - F.coalesce("qb_both", zero)
    )
    return prs.join(inter, ["sa", "sb"], "left").select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        (
            F.lit(0.5) * (sum_ta.cast("double") + sum_tb.cast("double"))
        ).alias("js_divergence"),
    )


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap confidence interval
# ---------------------------------------------------------------------------

#: Number of bootstrap replicates.
BOOT_B = 64
#: Poisson(1) CDF literals (P(X <= k) for k = 0..6; k = 7 absorbs the
#: tail, P ~ 1e-5) — written as exact double literals so both engines
#: threshold on identical bits.
BOOT_POISSON_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
)
#: 2^60 as a double — hash64 yields 60-bit integers; h / 2^60 is the
#: uniform variate.
_BOOT_SCALE = 1152921504606846976.0
#: Percentile-method ranks for a 95% interval over 64 sorted replicate
#: means: rank 2 (~2.5th pct) and rank 63 (~97.5th pct).  Stated as the
#: convention, not interpolated — interpolation rules differ by engine.
BOOT_LO_RANK = 2
BOOT_HI_RANK = 63


def _boot_weight_sql(u_expr: str = "u") -> str:
    """Poisson(1) multiplicity CASE over the uniform expression
    ``u_expr`` — interpolated directly (NOT post-hoc string
    replacement, which would corrupt any other literal ``u`` in the
    CASE text; ADVICE r06)."""
    branches = " ".join(
        f"WHEN {u_expr} < {t} THEN {k}"
        for k, t in enumerate(BOOT_POISSON_CDF)
    )
    return f"CASE {branches} ELSE 7 END"


@register(
    "quality_bootstrap_mean_ci",
    oracle=f"""
    WITH rep AS (
        SELECT d.doc_id, d.n_chars, u.b
        FROM documents d, unnest(generate_series(0, {BOOT_B - 1})) u(b)
    ),
    weighted AS (
        SELECT b, n_chars,
               {_boot_weight_sql(f"(CAST(('0x' || substr(md5(doc_id || '_boot_' || b), 1, 15)) AS BIGINT) / {_BOOT_SCALE})")} AS w
        FROM rep
    ),
    means AS (
        SELECT b,
               CAST(round(CAST(SUM(w * n_chars) AS DOUBLE) / SUM(w), 6)
                    AS DECIMAL(18,6)) AS m
        FROM weighted GROUP BY b
    ),
    ranked AS (
        SELECT m, row_number() OVER (ORDER BY m) AS rk FROM means
    ),
    stats AS (
        SELECT CAST(SUM(m) AS DOUBLE) AS s1,
               CAST(SUM(m * m) AS DOUBLE) AS s2
        FROM means
    ),
    point AS (
        SELECT count(*) AS n_docs,
               CAST(SUM(n_chars) AS DOUBLE) / count(*) AS point_mean
        FROM documents
    )
    SELECT CAST(p.n_docs AS BIGINT) AS n_docs,
           p.point_mean,
           s.s1 / {BOOT_B} AS boot_mean,
           sqrt((s.s2 - s.s1 * s.s1 / {BOOT_B}) / {BOOT_B - 1}) AS boot_se,
           CAST((SELECT m FROM ranked WHERE rk = {BOOT_LO_RANK}) AS DOUBLE)
               AS ci_lo,
           CAST((SELECT m FROM ranked WHERE rk = {BOOT_HI_RANK}) AS DOUBLE)
               AS ci_hi
    FROM point p, stats s
    """,
    tags=("quality", "statistics", "bootstrap"),
)
def quality_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al. 2012 — the bootstrap Google
    built for MapReduce) on the corpus mean document length: each of
    64 replicates gives every document an independent Poisson(1)
    multiplicity, so a "resample with replacement" of N docs never
    materializes — ONE pass computes every replicate's weighted sum,
    and the 2.5/97.5-percentile replicate means are the 95% CI.  This
    is how a 100 TB pipeline puts an error bar on any corpus statistic
    (dedup rate, mean quality score, token count) without a second
    pass, and the whole construction is DETERMINISTIC: the multiplicity
    comes from inverse-CDF lookup on a 60-bit md5 uniform, so reruns —
    and the DuckDB oracle — reproduce the interval bit-for-bit.

    Exactness: per-replicate sums are INTEGER (weight x n_chars);
    replicate means quantize to DECIMAL(18,6) before the cross-replicate
    moments, so s1/s2 are order-free; se/CI derive from those exact
    aggregates in identical double arithmetic.

    Scale: the explode is map-side (B rows per input row, combined to B
    partial sums per task before the one shuffle); cross-replicate state
    is B rows total.  B=64 trades +/-9% CI-endpoint noise for a 64x
    replication factor — raise B, not passes, when tighter intervals
    are needed."""
    from kafka_stream_processing_spark.operators.dedup import hash64

    d = table(spark, sf_dir, "documents")
    rep = d.select("doc_id", "n_chars").select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    )
    u = hash64(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit("_boot_"),
            F.col("b").cast("string"),
        )
    ) / F.lit(_BOOT_SCALE)
    w = F.lit(7)
    for k in range(len(BOOT_POISSON_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(BOOT_POISSON_CDF[k]), F.lit(k)).otherwise(w)
    means = (
        rep.select("b", "n_chars", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum("w").alias("n_b"),
            F.sum(F.col("w") * F.col("n_chars")).alias("s_b"),
        )
        .select(
            "b",
            F.round(
                F.col("s_b").cast("double") / F.col("n_b"), 6
            ).cast("decimal(18,6)").alias("m"),
        )
    )
    from pyspark.sql import Window as _W

    ranked = means.withColumn(
        "rk", F.row_number().over(_W.orderBy("m"))
    )
    stats = means.agg(
        F.sum("m").cast("double").alias("s1"),
        F.sum(F.col("m") * F.col("m")).cast("double").alias("s2"),
    )
    point = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum("n_chars").cast("double") / F.count(F.lit(1))
        ).alias("point_mean"),
    )
    lo = ranked.filter(F.col("rk") == BOOT_LO_RANK).select(
        F.col("m").cast("double").alias("ci_lo")
    )
    hi = ranked.filter(F.col("rk") == BOOT_HI_RANK).select(
        F.col("m").cast("double").alias("ci_hi")
    )
    b_lit = float(BOOT_B)
    return (
        point.crossJoin(stats)
        .crossJoin(lo)
        .crossJoin(hi)
        .select(
            "n_docs",
            "point_mean",
            (F.col("s1") / F.lit(b_lit)).alias("boot_mean"),
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.lit(b_lit))
                / F.lit(float(BOOT_B - 1))
            ).alias("boot_se"),
            "ci_lo",
            "ci_hi",
        )
    )


#: Shared oracle CTEs for the 4-gram KN model: triple-BOS-prefixed
#: 4-gram occurrences (doc_id, lang, w1..w4).
_QUAD_CTES = f"""toks4 AS (
        SELECT doc_id, lang,
               list_prepend('{LM_BOS}', list_prepend('{LM_BOS}',
                   list_prepend('{LM_BOS}', string_split(text, ' ')))) AS t
        FROM documents
    ),
    quad AS (
        SELECT doc_id, lang,
               t[k] AS w1, t[k + 1] AS w2, t[k + 2] AS w3, t[k + 3] AS w4
        FROM toks4, LATERAL unnest(generate_series(1, len(t) - 3)) u(k)
    )"""


@register(
    "quality_fourgram_kneser_ney",
    oracle=f"""
    WITH {_QUAD_CTES},
    c4 AS (
        SELECT w1, w2, w3, w4, count(*) AS c FROM quad GROUP BY 1, 2, 3, 4
    ),
    ctx4 AS (
        SELECT w1, w2, w3, SUM(c) AS total, count(*) AS n1
        FROM c4 GROUP BY 1, 2, 3
    ),
    c3k AS (
        SELECT w2, w3, w4, count(DISTINCT w1) AS c FROM quad GROUP BY 1, 2, 3
    ),
    ctx3k AS (
        SELECT w2, w3, SUM(c) AS total, count(*) AS n1 FROM c3k GROUP BY 1, 2
    ),
    c2k AS (
        SELECT w3, w4, count(*) AS c FROM c3k GROUP BY 1, 2
    ),
    ctx2k AS (
        SELECT w3, SUM(c) AS total, count(*) AS n1 FROM c2k GROUP BY 1
    ),
    c1k AS (
        SELECT w4, count(*) AS c FROM c2k GROUP BY w4
    ),
    lm AS (
        SELECT c4.w1, c4.w2, c4.w3, c4.w4,
               CAST(round(-ln(
                   ((CAST(c4.c AS DOUBLE) - {KN_DISCOUNT}) / ctx4.total)
                 + (({KN_DISCOUNT} * ctx4.n1) / ctx4.total)
                   * (((CAST(c3k.c AS DOUBLE) - {KN_DISCOUNT}) / ctx3k.total)
                      + (({KN_DISCOUNT} * ctx3k.n1) / ctx3k.total)
                        * (((CAST(c2k.c AS DOUBLE) - {KN_DISCOUNT})
                            / ctx2k.total)
                           + (({KN_DISCOUNT} * ctx2k.n1) / ctx2k.total)
                             * (CAST(c1k.c AS DOUBLE)
                                / (SELECT SUM(c) FROM c1k))))), 6)
               AS DECIMAL(18,6)) AS surp
        FROM c4
        JOIN ctx4 ON ctx4.w1 = c4.w1 AND ctx4.w2 = c4.w2 AND ctx4.w3 = c4.w3
        JOIN c3k ON c3k.w2 = c4.w2 AND c3k.w3 = c4.w3 AND c3k.w4 = c4.w4
        JOIN ctx3k ON ctx3k.w2 = c4.w2 AND ctx3k.w3 = c4.w3
        JOIN c2k ON c2k.w3 = c4.w3 AND c2k.w4 = c4.w4
        JOIN ctx2k ON ctx2k.w3 = c4.w3
        JOIN c1k ON c1k.w4 = c4.w4
    ),
    doc_quad AS (
        SELECT doc_id, lang, w1, w2, w3, w4, count(*) AS k
        FROM quad GROUP BY 1, 2, 3, 4, 5, 6
    )
    SELECT d.doc_id, d.lang,
           CAST(SUM(d.k) AS BIGINT) AS n_tokens,
           CAST(SUM(d.k * lm.surp) AS DOUBLE) / SUM(d.k)
               AS mean_surprisal
    FROM doc_quad d
    JOIN lm ON d.w1 = lm.w1 AND d.w2 = lm.w2
           AND d.w3 = lm.w3 AND d.w4 = lm.w4
    GROUP BY 1, 2
    """,
    tags=("quality", "lm"),
)
def quality_fourgram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-gram interpolated Kneser-Ney — the ladder's production order
    (KenLM's default for web-corpus quality scoring is 4- or 5-gram):
    raw counts at the top, then THREE levels of continuation counts,
    each derived from the distinct n-gram TYPES of the level above
    (N₁₊(·w₂w₃w₄) from raw 4-gram types, N₁₊(·w₃w₄) from those
    continuation trigram types, N₁₊(·w₄) from the continuation bigram
    types) — the Chen & Goodman recursion quality_trigram_kneser_ney
    documents, one level deeper.  A triple '<s>' prefix gives every
    token a full 4-gram context, so each token is scored exactly once.
    Cross-engine exactness: same fixed IEEE parenthesization chain,
    one round(ln, 6) into DECIMAL(18,6), exact per-doc decimal sums.

    Scale: five training groupBys, all map-side-combined; the LM table
    is O(distinct 4-grams) — the largest in the family and the reason
    production LMs prune singletons; the scoring join shuffles on
    (w1..w4) with per-doc DISTINCT 4-grams as probe input.  Bodies
    never shuffle."""
    from pyspark.sql import Window

    from kafka_stream_processing_spark.sources.tables import fanout

    d = fanout(table(spark, sf_dir, "documents"))
    t = F.concat(
        F.array(F.lit(LM_BOS), F.lit(LM_BOS), F.lit(LM_BOS)),
        F.split("text", " "),
    )
    toks = d.select("doc_id", "lang", t.alias("t"))
    n = F.size("t")
    quad = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, n - 3).alias("w1"),
                F.slice("t", 2, n - 3).alias("w2"),
                F.slice("t", 3, n - 3).alias("w3"),
                F.slice("t", 4, n - 3).alias("w4"),
            )
        ).alias("p"),
    ).select(
        "doc_id",
        "lang",
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
        F.col("p.w3").alias("w3"),
        F.col("p.w4").alias("w4"),
    )
    c4 = quad.groupBy("w1", "w2", "w3", "w4").agg(
        F.count(F.lit(1)).alias("c4")
    )
    ctx4 = c4.groupBy("w1", "w2", "w3").agg(
        F.sum("c4").alias("t4"), F.count(F.lit(1)).alias("n14")
    )
    c3k = quad.groupBy("w2", "w3", "w4").agg(
        F.countDistinct("w1").alias("c3k")
    )
    ctx3k = c3k.groupBy("w2", "w3").agg(
        F.sum("c3k").alias("t3"), F.count(F.lit(1)).alias("n13")
    )
    c2k = c3k.groupBy("w3", "w4").agg(F.count(F.lit(1)).alias("c2k"))
    ctx2k = c2k.groupBy("w3").agg(
        F.sum("c2k").alias("t2"), F.count(F.lit(1)).alias("n12")
    )
    c1k = c2k.groupBy("w4").agg(F.count(F.lit(1)).alias("c1k"))
    c1t = c1k.withColumn("tot1", F.sum("c1k").over(Window.partitionBy()))
    D = KN_DISCOUNT
    p1 = F.col("c1k").cast("double") / F.col("tot1")
    p2 = (
        (F.col("c2k").cast("double") - F.lit(D)) / F.col("t2")
    ) + ((F.lit(D) * F.col("n12")) / F.col("t2")) * p1
    p3 = (
        (F.col("c3k").cast("double") - F.lit(D)) / F.col("t3")
    ) + ((F.lit(D) * F.col("n13")) / F.col("t3")) * p2
    p4 = (
        (F.col("c4").cast("double") - F.lit(D)) / F.col("t4")
    ) + ((F.lit(D) * F.col("n14")) / F.col("t4")) * p3
    lm = (
        c4.join(ctx4, ["w1", "w2", "w3"])
        .join(c3k, ["w2", "w3", "w4"])
        .join(ctx3k, ["w2", "w3"])
        .join(c2k, ["w3", "w4"])
        .join(ctx2k, "w3")
        .join(c1t, "w4")
        .select(
            "w1",
            "w2",
            "w3",
            "w4",
            F.round(-F.log(p4), 6).cast("decimal(18,6)").alias("surp"),
        )
    )
    doc_quad = quad.groupBy("doc_id", "lang", "w1", "w2", "w3", "w4").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        doc_quad.join(lm, ["w1", "w2", "w3", "w4"])
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("k").cast("bigint").alias("n_tokens"),
            (
                F.sum(F.col("k") * F.col("surp")).cast("double")
                / F.sum("k")
            ).alias("mean_surprisal"),
        )
    )


# ---------------------------------------------------------------------------
# Privacy and skew audits
# ---------------------------------------------------------------------------

#: k-anonymity bands: a group's size k determines its re-identification
#: risk class.  Frontiers are the conventional k=5 / k=20 policy cuts.
KANON_BUCKET_CHARS = 100


@register(
    "quality_k_anonymity_audit",
    oracle=f"""
    WITH groups AS (
        SELECT lang, source, n_chars // {KANON_BUCKET_CHARS} AS len_bucket,
               count(*) AS k
        FROM documents
        GROUP BY 1, 2, 3
    )
    SELECT CASE WHEN k = 1 THEN 'k=1 unique'
                WHEN k < 5 THEN 'k=2-4'
                WHEN k < 20 THEN 'k=5-19'
                ELSE 'k>=20' END AS band,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM groups
    GROUP BY 1
    """,
    tags=("quality", "privacy"),
)
def quality_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier combination
    (lang, source, length bucket): every row whose QI group has size
    k=1 is uniquely re-identifiable from those attributes alone — the
    check a training-data release runs BEFORE publication (Sweeney
    2002), complementing the PII scrub (text_pii_scrub removes direct
    identifiers; k-anonymity measures the quasi-identifier risk that
    scrubbing cannot).  Output is the band histogram a release gate
    thresholds on: rows in k=1/k<5 bands either generalize (coarser
    buckets), suppress, or block the release.

    Scale: ONE groupBy over the QI tuple (map-side combined) to a
    groups table bounded by the QI domain product, then a 4-row band
    aggregate — corpus-size-independent state, the same shape at
    100 TB."""
    d = table(spark, sf_dir, "documents")
    groups = d.groupBy(
        "lang",
        "source",
        # integer `div`, not double-divide-then-truncate: exact mirror
        # of the oracle's // on integer semantics (ADVICE r06)
        F.expr(f"n_chars div {KANON_BUCKET_CHARS}").alias("len_bucket"),
    ).agg(F.count(F.lit(1)).alias("k"))
    band = (
        F.when(F.col("k") == 1, F.lit("k=1 unique"))
        .when(F.col("k") < 5, F.lit("k=2-4"))
        .when(F.col("k") < 20, F.lit("k=5-19"))
        .otherwise(F.lit("k>=20"))
    )
    return groups.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("k").cast("bigint").alias("n_rows"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
    )


@register(
    "quality_key_skew_gini",
    oracle="""
    WITH freq AS (
        SELECT user_id, count(*) AS c FROM events GROUP BY 1
    ),
    ranked AS (
        SELECT c,
               row_number() OVER (ORDER BY c, user_id) AS i,
               count(*) OVER () AS n,
               SUM(c) OVER () AS total
        FROM freq
    ),
    topf AS (
        SELECT SUM(c) AS top_events
        FROM ranked
        WHERE i > n - (n + 99) // 100
    )
    SELECT CAST(n AS BIGINT) AS n_keys,
           CAST(total AS BIGINT) AS total_events,
           CAST(max(c) AS BIGINT) AS max_count,
           CAST((SELECT top_events FROM topf) AS DOUBLE) / total
               AS top1pct_share,
           (2.0 * SUM(i * c)) / (CAST(n AS DOUBLE) * total)
               - (CAST(n AS DOUBLE) + 1) / n AS gini
    FROM ranked
    GROUP BY n, total
    """,
    tags=("quality", "skew", "statistics"),
)
def quality_key_skew_gini(
    spark: SparkSession, sf_dir: str, frontier: str = "exact"
) -> DataFrame:
    """Key-skew diagnostics — the numbers that DECIDE the engine's own
    salting/AQE-skew-join knobs: the Gini coefficient of the per-key
    frequency distribution (0 = perfectly uniform keys, →1 = one key
    owns the stream), the top-1% key share, and the max single-key
    count.  Computed with the exact rank formula
    G = 2·Σᵢ i·cᵢ / (n·Σc) − (n+1)/n over ascending (count, key) ranks —
    integer sums until two final IEEE divisions, so the score is
    bit-stable cross-engine.  agg_salted_high_cardinality is the
    treatment; this operator is the diagnosis that says when to apply
    it (run it on the join/group key BEFORE choosing a partitioning).

    Scale: one groupBy(key) (map-side combined), one total-order rank
    over the KEY-frequency table (keys-sized, not stream-sized) at
    oracle scale; ``frontier="histogram"`` is the IMPLEMENTED
    billion-key path — every statistic is recomputed EXACTLY from the
    count-of-counts histogram (ranks of equal counts are consecutive,
    so Σ i·cᵢ over a tie block of m keys at value c starting after s
    smaller keys is c·(m·s + m(m+1)/2)); the only window runs over
    DISTINCT count values, a table bounded by √(2·Σc) rows regardless
    of key cardinality.  Bit-identical to the exact rank form (integer
    arithmetic throughout; pinned in tests/test_frontier.py)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    freq = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    if frontier == "histogram":
        hist = freq.groupBy("c").agg(F.count(F.lit(1)).alias("m"))
        w_cum = (
            Window.orderBy("c")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_all2 = Window.partitionBy()
        blocks = hist.select(
            "c",
            "m",
            F.coalesce(F.sum("m").over(w_cum), F.lit(0)).alias("s"),
            F.sum("m").over(w_all2).alias("n"),
            F.sum(F.col("m") * F.col("c")).over(w_all2).alias("total"),
        )
        # top-1% keys: k = ceil(n/100); a block's overlap with the top
        # k ranks is min(m, s + m - (n - k)) clamped at 0
        k = F.expr("(n + 99) div 100")
        in_top = F.greatest(
            F.lit(0),
            F.least(F.col("m"), F.col("s") + F.col("m") - (F.col("n") - k)),
        )
        return (
            blocks.groupBy("n", "total")
            .agg(
                F.max("c").cast("bigint").alias("max_count"),
                # m·(m+1) is even, so `div 2` is exact integer
                # arithmetic — sic stays a bigint sum exactly like the
                # rank form's Σ i·cᵢ
                F.sum(
                    F.col("c")
                    * (
                        F.col("m") * F.col("s")
                        + F.expr("m * (m + 1) div 2")
                    )
                ).alias("sic"),
                F.sum(F.col("c") * in_top).alias("top_events"),
            )
            .select(
                F.col("n").cast("bigint").alias("n_keys"),
                F.col("total").cast("bigint").alias("total_events"),
                "max_count",
                (
                    F.col("top_events").cast("double") / F.col("total")
                ).alias("top1pct_share"),
                (
                    (F.lit(2.0) * F.col("sic"))
                    / (F.col("n").cast("double") * F.col("total"))
                    - (F.col("n").cast("double") + 1) / F.col("n")
                ).alias("gini"),
            )
        )
    w_rank = Window.orderBy("c", "user_id")
    w_all = Window.partitionBy()
    ranked = freq.select(
        "c",
        F.row_number().over(w_rank).alias("i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("c").over(w_all).alias("total"),
    )
    # top-1% frontier by integer rank: (n + 99) // 100 == ceil(n / 100)
    topf = ranked.filter(
        F.col("i")
        > F.col("n") - ((F.col("n") + 99) / 100).cast("bigint")
    ).agg(F.sum("c").alias("top_events"))
    return (
        ranked.groupBy("n", "total")
        .agg(
            F.max("c").cast("bigint").alias("max_count"),
            F.sum(F.col("i") * F.col("c")).alias("sic"),
        )
        .crossJoin(F.broadcast(topf))
        .select(
            F.col("n").cast("bigint").alias("n_keys"),
            F.col("total").cast("bigint").alias("total_events"),
            "max_count",
            (
                F.col("top_events").cast("double") / F.col("total")
            ).alias("top1pct_share"),
            (
                (F.lit(2.0) * F.col("sic"))
                / (F.col("n").cast("double") * F.col("total"))
                - (F.col("n").cast("double") + 1) / F.col("n")
            ).alias("gini"),
        )
    )


#: Benford first-significant-digit proportions log10(1 + 1/d), written
#: as exact double literals so both engines compute identical expected
#: counts.
BENFORD_P = (
    0.3010299956639812,
    0.17609125905568124,
    0.12493873660829992,
    0.09691001300805642,
    0.07918124604762482,
    0.06694678963061322,
    0.05799194697768673,
    0.05115252244738129,
    0.04575749056067514,
)

_BENFORD_P_SQL = "CASE " + " ".join(
    f"WHEN digit = {d + 1} THEN {p}" for d, p in enumerate(BENFORD_P)
) + " END"


@register(
    "quality_benford_digit_drift",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM lineitem
        WHERE l_extendedprice >= 1
    ),
    hist AS (
        SELECT digit, count(*) AS n_obs FROM digits GROUP BY digit
    ),
    -- literal 9-digit frame: a digit absent from the data still
    -- contributes its full (0 - np)^2 / np expected-count term, and
    -- the chi-square is always the 9-category / dof=8 table
    -- (ADVICE r06)
    obs AS (
        SELECT g.digit, COALESCE(h.n_obs, 0) AS n_obs
        FROM (SELECT unnest(generate_series(1, 9)) AS digit) g
        LEFT JOIN hist h ON h.digit = g.digit
    ),
    tot AS (SELECT SUM(n_obs) AS n FROM obs),
    terms AS (
        SELECT o.digit, o.n_obs, t.n,
               {_BENFORD_P_SQL} AS p_benford,
               CAST((CAST(o.n_obs AS DOUBLE) - {_BENFORD_P_SQL} * t.n)
                    * (CAST(o.n_obs AS DOUBLE) - {_BENFORD_P_SQL} * t.n)
                    / ({_BENFORD_P_SQL} * t.n)
                    AS DECIMAL(18,12)) AS term
        FROM obs o, tot t
    ),
    stat AS (
        SELECT CAST(SUM(term) AS DOUBLE) AS chi2 FROM terms
    )
    SELECT t.digit,
           CAST(t.n_obs AS BIGINT) AS n_obs,
           t.p_benford,
           CAST(t.n_obs AS DOUBLE) / t.n AS p_obs,
           s.chi2,
           s.chi2 > {CHI2_CRIT_005[8]} AS drift
    FROM terms t, stat s
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_benford_digit_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benford's-law first-digit gate — the synthetic-data tripwire
    (naturally occurring multi-scale amounts follow
    P(d) = log10(1+1/d); uniform or fabricated generators don't, which
    is why auditors and data-quality teams chi-square against Benford):
    first significant digits come from the INTEGER part as a string
    (floor → BIGINT → substr — deterministic on both engines; no
    log10/pow on doubles, whose boundary behavior is libm-dependent),
    χ² against the literal Benford proportions with the dof=8 critical
    value from the shared CHI2_CRIT_005 table.  On TPC-H-style uniform
    prices the gate correctly FIRES (p_obs ≈ 1/9 per digit) — the
    tripwire pays for itself by flagging generated data, and the
    per-digit rows show exactly which digits deviate.

    Scale: one scan → 9-row digit histogram (map-side combined);
    everything after runs on 9 rows.  Pairs with Zipf/Heaps as the
    numeric-column member of the generated-content tripwire family."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice") >= 1
    )
    digit = F.substring(
        F.floor("l_extendedprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    hist = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    # Literal 9-digit frame (ADVICE r06): an absent digit still
    # contributes its (0 - np)^2 / np term and dof stays the
    # 9-category value, so the gate never understates drift.
    frame = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    obs = (
        frame.join(hist, "digit", "left")
        .select("digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs"))
    )
    from pyspark.sql import Window

    n = F.sum("n_obs").over(Window.partitionBy())
    p_benford = F.lit(None).cast("double")
    for d, p in enumerate(BENFORD_P):
        p_benford = F.when(F.col("digit") == d + 1, F.lit(p)).otherwise(
            p_benford
        )
    terms = obs.select(
        "digit",
        "n_obs",
        n.alias("n"),
        p_benford.alias("p_benford"),
    ).withColumn(
        "term",
        (
            (F.col("n_obs").cast("double") - F.col("p_benford") * F.col("n"))
            * (F.col("n_obs").cast("double") - F.col("p_benford") * F.col("n"))
            / (F.col("p_benford") * F.col("n"))
        ).cast("decimal(18,12)"),
    )
    chi2 = F.sum("term").over(Window.partitionBy()).cast("double")
    return terms.select(
        "digit",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        "p_benford",
        (F.col("n_obs").cast("double") / F.col("n")).alias("p_obs"),
        chi2.alias("chi2"),
        (chi2 > F.lit(CHI2_CRIT_005[8])).alias("drift"),
    )


# ---------------------------------------------------------------------------
# Winsorized moments
# ---------------------------------------------------------------------------

#: Winsorization fractions: clamp below the 1st and above the 99th
#: percentile (the standard tail-taming cut for corpus length stats).
WINSOR_LO = (1, 100)
WINSOR_HI = (99, 100)


@register(
    "quality_winsorized_stats",
    oracle=f"""
    WITH x AS (SELECT doc_id, n_chars FROM documents),
    ranked AS (
        SELECT n_chars,
               row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER () AS n
        FROM x
    ),
    lo AS (
        SELECT n_chars AS lo FROM ranked
        WHERE rn = greatest(1, (n * {WINSOR_LO[0]} + {WINSOR_LO[1] - 1})
                               // {WINSOR_LO[1]})
    ),
    hi AS (
        SELECT n_chars AS hi FROM ranked
        WHERE rn = greatest(1, (n * {WINSOR_HI[0]} + {WINSOR_HI[1] - 1})
                               // {WINSOR_HI[1]})
    ),
    clamped AS (
        SELECT least(greatest(x.n_chars, lo.lo), hi.hi) AS v,
               CASE WHEN x.n_chars < lo.lo THEN 1 ELSE 0 END AS cl,
               CASE WHEN x.n_chars > hi.hi THEN 1 ELSE 0 END AS ch,
               lo.lo AS lo, hi.hi AS hi
        FROM x, lo, hi
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(lo AS BIGINT) AS cut_lo,
           CAST(hi AS BIGINT) AS cut_hi,
           CAST(SUM(cl) AS BIGINT) AS n_clipped_lo,
           CAST(SUM(ch) AS BIGINT) AS n_clipped_hi,
           CAST(SUM(v) AS DOUBLE) / count(*) AS win_mean,
           sqrt((CAST(SUM(CAST(v AS BIGINT) * v) AS DOUBLE)
                 - CAST(SUM(v) AS DOUBLE) * SUM(v) / count(*))
                / (count(*) - 1)) AS win_std
    FROM clamped
    GROUP BY lo, hi
    """,
    tags=("quality", "robust", "statistics"),
)
def quality_winsorized_stats(
    spark: SparkSession, sf_dir: str, frontier: str = "exact"
) -> DataFrame:
    """Winsorized corpus length moments — the robust mean/std that a
    data card should quote instead of raw moments (one 10 GB
    concatenation artifact moves a raw mean; after clamping to the
    [p1, p99] band it cannot): both cut values come from the shared
    rank-frontier machinery (operators/frontier.py), every clamped
    value stays an INTEGER, and Σv / Σv² are exact bigint sums with the
    two final divisions the only IEEE steps — bit-stable cross-engine.
    Complements quality_length_outlier_mad (flags the outliers) by
    reporting the statistics with the outliers' leverage removed.

    Scale: ``frontier="exact"`` (the oracle form) pays one total-order
    sort for the two rank cuts; ``frontier="approx"`` takes both cuts
    from ONE percentile_approx aggregate (GK sketch, mergeable) — the
    100 TB path, same downstream single-pass clamp + scalar aggregate
    over a broadcast 1-row cut table."""
    from kafka_stream_processing_spark.operators.frontier import (
        quantile_cuts,
    )

    x = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cuts = quantile_cuts(
        x,
        "n_chars",
        [WINSOR_LO, WINSOR_HI],
        mode="approx" if frontier == "approx" else "exact",
        tiebreak="doc_id",
    ).select(F.col("cut_0").alias("lo"), F.col("cut_1").alias("hi"))
    v = F.least(F.greatest(F.col("n_chars"), F.col("lo")), F.col("hi"))
    clamped = x.crossJoin(F.broadcast(cuts)).select(
        v.alias("v"),
        (F.col("n_chars") < F.col("lo")).cast("bigint").alias("cl"),
        (F.col("n_chars") > F.col("hi")).cast("bigint").alias("ch"),
        "lo",
        "hi",
    )
    return clamped.groupBy("lo", "hi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.first("lo").cast("bigint").alias("cut_lo"),
        F.first("hi").cast("bigint").alias("cut_hi"),
        F.sum("cl").cast("bigint").alias("n_clipped_lo"),
        F.sum("ch").cast("bigint").alias("n_clipped_hi"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("win_mean"),
        F.sqrt(
            (
                F.sum(F.col("v").cast("bigint") * F.col("v")).cast("double")
                - F.sum("v").cast("double")
                * F.sum("v")
                / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("win_std"),
    ).drop("lo", "hi")


# ---------------------------------------------------------------------------
# Simpson diversity / effective counts
# ---------------------------------------------------------------------------

@register(
    "quality_simpson_diversity",
    oracle="""
    WITH src AS (
        SELECT 'source' AS dimension, source AS g, count(*) AS c
        FROM documents GROUP BY 2
    ),
    lng AS (
        SELECT 'lang' AS dimension, lang AS g, count(*) AS c
        FROM documents GROUP BY 2
    ),
    wrd AS (
        SELECT 'word' AS dimension, w AS g, count(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY 2
    ),
    allg AS (
        SELECT * FROM src UNION ALL SELECT * FROM lng
        UNION ALL SELECT * FROM wrd
    )
    SELECT dimension,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(SUM(c) AS BIGINT) AS n_total,
           CAST(SUM(c * c) AS DOUBLE) / (CAST(SUM(c) AS DOUBLE) * SUM(c))
               AS simpson,
           (CAST(SUM(c) AS DOUBLE) * SUM(c)) / CAST(SUM(c * c) AS DOUBLE)
               AS effective_n
    FROM allg
    GROUP BY 1
    """,
    tags=("quality", "statistics", "diversity"),
)
def quality_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration and effective counts per corpus dimension
    — the data-card numbers that say HOW concentrated a mixture really
    is (5 sources at 96/1/1/1/1 is "5 sources" on paper but an
    effective 1.09): λ = Σ(cᵢ/N)² computed as exact bigint Σc²/ N²
    (one IEEE division at the end — bit-stable cross-engine), and its
    inverse-Simpson effective group count, over source, language, and
    the word distribution (the vocabulary's effective size pairs with
    Zipf/Heaps as a third generated-content tripwire: templated text
    collapses effective vocabulary long before it moves raw counts).
    The mixture-weight operators (sample_mixture_weights, DoReMi)
    consume exactly these concentrations as their diagnostics.

    Scale: three groupBys (two domain-bounded, one vocab-sized and
    Heaps-sublinear, all map-side combined) each reduced to ONE
    (Σc, Σc²) scalar pair — histogram-sized state, single pass each."""
    d = table(spark, sf_dir, "documents")

    def dim(df: DataFrame, name: str, col) -> DataFrame:
        return (
            df.select(col.alias("g"))
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.lit(name).alias("dimension"), "g", "c")
        )

    allg = (
        dim(d, "source", F.col("source"))
        .unionByName(dim(d, "lang", F.col("lang")))
        .unionByName(
            dim(
                d.select(F.explode(F.split("text", " ")).alias("w")),
                "word",
                F.col("w"),
            )
        )
    )
    sc = F.sum("c").cast("double")
    sc2 = F.sum(F.col("c") * F.col("c")).cast("double")
    return allg.groupBy("dimension").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("c").cast("bigint").alias("n_total"),
        (sc2 / (sc * F.sum("c"))).alias("simpson"),
        ((sc * F.sum("c")) / sc2).alias("effective_n"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U location-drift gate
# ---------------------------------------------------------------------------

#: Two-sided normal critical value at α = 0.05, written as an exact
#: double literal (the Φ⁻¹(0.975) convention of the z-approximation).
MWU_Z_CRIT_005 = 1.959963984540054


@register(
    "quality_mannwhitney_drift",
    oracle=f"""
    WITH x AS (SELECT source, n_chars AS v FROM documents),
    srcs AS (SELECT DISTINCT source AS s FROM x WHERE source <> 'src0'),
    ref_hist AS (
        SELECT v, count(*) AS a FROM x WHERE source = 'src0' GROUP BY v
    ),
    src_hist AS (
        SELECT source AS s, v, count(*) AS b
        FROM x WHERE source <> 'src0' GROUP BY 1, 2
    ),
    merged AS (
        SELECT s, v, SUM(a) AS a, SUM(b) AS b FROM (
            SELECT s, v, 0 AS a, b FROM src_hist
            UNION ALL
            SELECT srcs.s, r.v, r.a, 0 AS b FROM srcs CROSS JOIN ref_hist r
        ) GROUP BY 1, 2
    ),
    ranked AS (
        SELECT s, v, a, b, a + b AS m,
               COALESCE(SUM(a + b) OVER (
                   PARTITION BY s ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS sb
        FROM merged
    ),
    stats AS (
        SELECT s,
               SUM(a) AS na, SUM(b) AS nb,
               SUM(b * (2 * sb + m + 1)) AS r2,
               SUM(m * m * m - m) AS tie
        FROM ranked GROUP BY s
    ),
    scored AS (
        SELECT s, na, nb,
               r2 - nb * (nb + 1) AS u2,
               na * nb AS mu2,
               na + nb AS n,
               tie
        FROM stats
    )
    SELECT s AS source,
           CAST(na AS BIGINT) AS n_ref,
           CAST(nb AS BIGINT) AS n_src,
           CAST(u2 AS BIGINT) AS u2,
           (CAST(u2 AS DOUBLE) - CAST(mu2 AS DOUBLE))
               / (2.0 * sqrt((CAST(na AS DOUBLE) * nb / 12.0)
                             * ((n + 1.0)
                                - CAST(tie AS DOUBLE)
                                  / (CAST(n AS DOUBLE) * (n - 1.0)))))
               AS z,
           abs((CAST(u2 AS DOUBLE) - CAST(mu2 AS DOUBLE))
               / (2.0 * sqrt((CAST(na AS DOUBLE) * nb / 12.0)
                             * ((n + 1.0)
                                - CAST(tie AS DOUBLE)
                                  / (CAST(n AS DOUBLE) * (n - 1.0))))))
               > {MWU_Z_CRIT_005} AS drift
    FROM scored
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_mannwhitney_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Whitney U location-drift gate — the nonparametric
    complement of the KS gate (KS sees SHAPE changes; rank-sum U sees
    location shifts with far more power when the change is a median
    drift, e.g. a source quietly switching to longer documents): each
    non-reference source's length distribution is rank-sum tested
    against src0 with EXACT midrank tie handling, computed entirely
    from the per-value count-of-counts histogram — doubled midranks
    (2·S_before + m + 1) keep every rank sum an INTEGER (the ×2 trick;
    U₂ = 2U is exact bigint), ties enter through the standard
    Σ(m³−m) variance correction, and the final z is one fixed IEEE
    chain over exact integers, mirrored textually in the oracle.

    Scale: one groupBy to the per-(source, value) histogram (map-side
    combined); the cumulative window runs over DISTINCT VALUES per
    source — histogram-sized, the same bound as the KS/chi²/Benford
    gates — and the verdict is a 1-row-per-source aggregate.  No
    corpus-scale sort: ranks come from cumulative counts, not
    row_number (the count-of-counts technique quality_key_skew_gini's
    histogram frontier uses)."""
    from pyspark.sql import Window

    x = table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("v")
    )
    srcs = (
        x.filter(F.col("source") != "src0")
        .select(F.col("source").alias("s"))
        .distinct()
    )
    ref_hist = (
        x.filter(F.col("source") == "src0")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    src_hist = (
        x.filter(F.col("source") != "src0")
        .groupBy(F.col("source").alias("s"), "v")
        .agg(F.count(F.lit(1)).alias("b"))
    )
    merged = (
        src_hist.select("s", "v", F.lit(0).cast("bigint").alias("a"), "b")
        .unionByName(
            srcs.crossJoin(F.broadcast(ref_hist)).select(
                "s", "v", "a", F.lit(0).cast("bigint").alias("b")
            )
        )
        .groupBy("s", "v")
        .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
    )
    w_cum = (
        Window.partitionBy("s")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = F.col("a") + F.col("b")
    ranked = merged.select(
        "s",
        "a",
        "b",
        m.alias("m"),
        F.coalesce(F.sum(m).over(w_cum), F.lit(0)).alias("sb"),
    )
    stats = ranked.groupBy("s").agg(
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
        F.sum(
            F.col("b") * (2 * F.col("sb") + F.col("m") + 1)
        ).alias("r2"),
        F.sum(
            F.col("m") * F.col("m") * F.col("m") - F.col("m")
        ).alias("tie"),
    )
    scored = stats.select(
        "s",
        "na",
        "nb",
        (F.col("r2") - F.col("nb") * (F.col("nb") + 1)).alias("u2"),
        (F.col("na") * F.col("nb")).alias("mu2"),
        (F.col("na") + F.col("nb")).alias("n"),
        "tie",
    )
    z = (F.col("u2").cast("double") - F.col("mu2").cast("double")) / (
        F.lit(2.0)
        * F.sqrt(
            (F.col("na").cast("double") * F.col("nb") / F.lit(12.0))
            * (
                (F.col("n") + F.lit(1.0))
                - F.col("tie").cast("double")
                / (F.col("n").cast("double") * (F.col("n") - F.lit(1.0)))
            )
        )
    )
    return scored.select(
        F.col("s").alias("source"),
        F.col("na").cast("bigint").alias("n_ref"),
        F.col("nb").cast("bigint").alias("n_src"),
        F.col("u2").cast("bigint").alias("u2"),
        z.alias("z"),
        (F.abs(z) > MWU_Z_CRIT_005).alias("drift"),
    )


# ---------------------------------------------------------------------------
# OOV rate vs reference vocabulary
# ---------------------------------------------------------------------------

@register(
    "quality_oov_rate_by_source",
    oracle="""
    WITH vocab AS (
        SELECT DISTINCT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE source = 'src0'
    ),
    words AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE source <> 'src0'
    ),
    flagged AS (
        SELECT words.source, words.w,
               (vocab.w IS NULL) AS oov
        FROM words LEFT JOIN vocab ON vocab.w = words.w
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov_tokens,
           CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS oov_rate,
           CAST(count(DISTINCT w) AS BIGINT) AS n_types,
           CAST(count(DISTINCT CASE WHEN oov THEN w END) AS BIGINT)
               AS n_oov_types
    FROM flagged
    GROUP BY source
    """,
    tags=("quality", "coverage"),
)
def quality_oov_rate_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Out-of-vocabulary rate per source against the trusted src0
    vocabulary — the coverage number that decides whether a fixed
    tokenizer/LM artifact transfers to a new ingest source (the batch
    counterpart of stream_lm_surprisal_scores' OOV accounting, and the
    quantity the BPE fertility audit implicitly depends on): token- and
    type-level OOV counts with one exact rate division.  A source whose
    type-OOV is high but token-OOV is low brings a long tail of rare
    novelty; the reverse signals a systematically different register —
    the two columns separate the cases.

    Scale: the reference vocabulary is Heaps-sublinear and BROADCAST
    (the stream LM's deployment shape); the token stream never
    shuffles for the flag — one narrow left join + one
    groupBy(source) with map-side combine."""
    d = table(spark, sf_dir, "documents")
    vocab = (
        d.filter(F.col("source") == "src0")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .withColumn("in_vocab", F.lit(True))
    )
    words = d.filter(F.col("source") != "src0").select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    flagged = words.join(F.broadcast(vocab), "w", "left").select(
        "source", "w", F.col("in_vocab").isNull().alias("oov")
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.col("oov").cast("int")).cast("bigint").alias(
            "n_oov_tokens"
        ),
        (
            F.sum(F.col("oov").cast("int")).cast("double")
            / F.count(F.lit(1))
        ).alias("oov_rate"),
        F.countDistinct("w").cast("bigint").alias("n_types"),
        F.countDistinct(
            F.when(F.col("oov"), F.col("w"))
        ).cast("bigint").alias("n_oov_types"),
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe variance-drift gate
# ---------------------------------------------------------------------------

@register(
    "quality_brown_forsythe_drift",
    oracle=f"""
    WITH x AS (SELECT source, doc_id, n_chars FROM documents),
    med AS (
        SELECT source, n_chars AS m FROM (
            SELECT source, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars, doc_id) AS rn,
                   count(*) OVER (PARTITION BY source) AS n
            FROM x
        ) WHERE rn = (n + 1) // 2
    ),
    z AS (
        SELECT x.source, abs(x.n_chars - med.m) AS z
        FROM x JOIN med ON med.source = x.source
    ),
    grp AS (
        SELECT source, count(*) AS nj, SUM(z) AS sj,
               SUM(CAST(z AS BIGINT) * z) AS sj2
        FROM z GROUP BY source
    ),
    tot AS (
        SELECT count(*) AS k, SUM(nj) AS n, SUM(sj) AS s,
               SUM(sj2) AS sz2,
               SUM(CAST(sj AS DOUBLE) * sj / nj) AS sq
        FROM grp
    ),
    stat AS (
        SELECT k, n,
               (sq - CAST(s AS DOUBLE) * s / n) / (k - 1) AS msb,
               (CAST(sz2 AS DOUBLE) - sq) / (n - k) AS msw
        FROM tot
    ),
    scored AS (
        SELECT CAST(k AS BIGINT) AS k_groups,
               CAST(n AS BIGINT) AS n_total,
               msb / msw AS bf_f,
               k - 1 AS dof
        FROM stat
    )
    SELECT k_groups, n_total, bf_f,
           {_CHI2_CRIT_SQL} / dof AS critical_005,
           bf_f > {_CHI2_CRIT_SQL} / dof AS drift
    FROM scored
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_brown_forsythe_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brown-Forsythe variance-drift gate — the SPREAD member of the
    drift family (KS: shape, Mann-Whitney: location, chi²: category
    mix, Benford: digit law; this one fires when a source's length
    VARIANCE changes while its median holds — a template getting
    injected into otherwise-normal documents): one-way ANOVA on
    z_ij = |x_ij − median_j| with GROUP MEDIANS (the Brown-Forsythe
    robustification of Levene — medians are integers here, so every
    z is an integer and all sums are exact bigints), F = MSB/MSW as
    one textually-mirrored IEEE chain.  The α=0.05 threshold uses the
    dof₂→∞ form F ≈ χ²(k−1)/(k−1) via the shared literal-table +
    Wilson-Hilferty machinery — slightly anti-conservative at finite
    dof₂ (F(19, 480) ≈ 1.61 vs 1.587), documented rather than
    libm-dependent.

    Scale: per-source medians are PARTITIONED rank windows (the
    per-group analogue of the MAD gate's frontier; swap to
    percentile_approx per group at billions of rows — same statistic
    shape); everything after the |x−med| map is two levels of
    map-side-combined aggregation to a k-row then 1-row table."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    w_rank = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    w_n = Window.partitionBy("source")
    med = (
        d.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n", F.count(F.lit(1)).over(w_n))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("source", F.col("n_chars").alias("m"))
    )
    z = d.join(F.broadcast(med), "source").select(
        "source", F.abs(F.col("n_chars") - F.col("m")).alias("z")
    )
    grp = z.groupBy("source").agg(
        F.count(F.lit(1)).alias("nj"),
        F.sum("z").alias("sj"),
        F.sum(F.col("z").cast("bigint") * F.col("z")).alias("sj2"),
    )
    tot = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("nj").alias("n"),
        F.sum("sj").alias("s"),
        F.sum("sj2").alias("sz2"),
        F.sum(
            F.col("sj").cast("double") * F.col("sj") / F.col("nj")
        ).alias("sq"),
    )
    msb = (
        F.col("sq") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("k") - 1)
    msw = (F.col("sz2").cast("double") - F.col("sq")) / (
        F.col("n") - F.col("k")
    )
    stat = tot.select(
        F.col("k").cast("bigint").alias("k_groups"),
        F.col("n").cast("bigint").alias("n_total"),
        (msb / msw).alias("bf_f"),
        (F.col("k") - 1).alias("dof"),
    )
    dof_d = F.col("dof").cast("double")
    wh_b = (
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * dof_d)
        + F.lit(_WH_Z095) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof_d))
    )
    crit_chi2 = dof_d * wh_b * wh_b * wh_b
    for kk, vv in CHI2_CRIT_005.items():
        crit_chi2 = F.when(F.col("dof") == kk, F.lit(vv)).otherwise(
            crit_chi2
        )
    crit = crit_chi2 / F.col("dof")
    return stat.select(
        "k_groups",
        "n_total",
        "bf_f",
        crit.alias("critical_005"),
        (F.col("bf_f") > crit).alias("drift"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index
# ---------------------------------------------------------------------------

#: Fixed-width character-count bucket used by the PSI gate (same width as
#: the k-anonymity audit's quasi-identifier bucket).
PSI_BUCKET_CHARS = 100
#: Laplace-style smoothing mass added per bucket so empty buckets stay
#: finite (the industry-standard PSI fix for zero cells).
PSI_SMOOTH = 0.5
#: The conventional "significant population shift" PSI threshold.
PSI_DRIFT_THRESHOLD = 0.2


@register(
    "quality_psi_drift",
    oracle=f"""
    WITH rows_t AS (
        SELECT n_chars // {PSI_BUCKET_CHARS} AS bucket,
               CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_a,
               CASE WHEN source = 'src0' THEN 0 ELSE 1 END AS is_b
        FROM documents
    ),
    hist AS (
        SELECT bucket, SUM(is_a) AS ca, SUM(is_b) AS cb
        FROM rows_t GROUP BY bucket
    ),
    tot AS (
        SELECT SUM(ca) AS na, SUM(cb) AS nb, COUNT(*) AS k FROM hist
    ),
    terms AS (
        SELECT h.bucket, h.ca, h.cb,
               (CAST(h.ca AS DOUBLE) + {PSI_SMOOTH})
                   / (CAST(t.na AS DOUBLE) + {PSI_SMOOTH} * t.k) AS p_ref,
               (CAST(h.cb AS DOUBLE) + {PSI_SMOOTH})
                   / (CAST(t.nb AS DOUBLE) + {PSI_SMOOTH} * t.k) AS p_cur
        FROM hist h, tot t
    ),
    terms2 AS (
        SELECT *,
               CAST(round((p_ref - p_cur) * ln(p_ref / p_cur), 6)
                    AS DECIMAL(18,6)) AS term
        FROM terms
    ),
    s AS (SELECT CAST(SUM(term) AS DOUBLE) AS psi FROM terms2)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(ca AS BIGINT) AS n_ref,
           CAST(cb AS BIGINT) AS n_cur,
           p_ref,
           p_cur,
           CAST(term AS DOUBLE) AS psi_term,
           s.psi AS psi,
           s.psi > {PSI_DRIFT_THRESHOLD} AS drift
    FROM terms2, s
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index over fixed-width n_chars buckets,
    reference slice source='src0' vs the rest — the scorecard-world
    drift gate that complements KS (which compares CDFs; PSI compares
    binned masses and is the number risk teams actually monitor):
    PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) with 0.5-per-bucket Laplace
    smoothing so a bucket present on one side only contributes a
    finite term instead of ±∞.  Both proportions are exact-integer
    ratios; each per-bucket term is one double multiply + one libm ln
    rounded to 6 decimals then summed as exact decimals (the engine's
    iterative-float rule), so the gate is bit-stable cross-engine.
    Fires at PSI > 0.2 (the conventional "significant shift" bar;
    0.1-0.2 is "monitor").

    Scale: one corpus scan → bucket histogram with map-side combine
    (state = n_buckets ≈ max(n_chars)/100 rows); everything after runs
    on the histogram.  Pairs with quality_ks_drift_nchars (same split,
    rank-based) and quality_chi2_categorical_drift (categorical) as
    the binned-mass member of the drift-gate family."""
    from pyspark.sql import Window

    rows = table(spark, sf_dir, "documents").select(
        F.expr(f"n_chars div {PSI_BUCKET_CHARS}").alias("bucket"),
        F.when(F.col("source") == "src0", F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_a"),
        F.when(F.col("source") == "src0", F.lit(0))
        .otherwise(F.lit(1))
        .alias("is_b"),
    )
    hist = rows.groupBy("bucket").agg(
        F.sum("is_a").alias("ca"), F.sum("is_b").alias("cb")
    )
    w = Window.partitionBy()
    t = hist.select(
        "bucket",
        "ca",
        "cb",
        F.sum("ca").over(w).alias("na"),
        F.sum("cb").over(w).alias("nb"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    p_ref = (F.col("ca").cast("double") + F.lit(PSI_SMOOTH)) / (
        F.col("na").cast("double") + F.lit(PSI_SMOOTH) * F.col("k")
    )
    p_cur = (F.col("cb").cast("double") + F.lit(PSI_SMOOTH)) / (
        F.col("nb").cast("double") + F.lit(PSI_SMOOTH) * F.col("k")
    )
    terms = t.select(
        "bucket",
        "ca",
        "cb",
        p_ref.alias("p_ref"),
        p_cur.alias("p_cur"),
    ).withColumn(
        "term",
        F.round(
            (F.col("p_ref") - F.col("p_cur"))
            * F.log(F.col("p_ref") / F.col("p_cur")),
            6,
        ).cast("decimal(18,6)"),
    )
    psi = F.sum("term").over(w).cast("double")
    return terms.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("ca").cast("bigint").alias("n_ref"),
        F.col("cb").cast("bigint").alias("n_cur"),
        "p_ref",
        "p_cur",
        F.col("term").cast("double").alias("psi_term"),
        psi.alias("psi"),
        (psi > F.lit(PSI_DRIFT_THRESHOLD)).alias("drift"),
    )


# ---------------------------------------------------------------------------
# Cramér's V association
# ---------------------------------------------------------------------------


@register(
    "quality_cramers_v_assoc",
    oracle="""
    WITH c AS (
        SELECT lang, source, count(*) AS n_obs
        FROM documents GROUP BY 1, 2
    ),
    langs AS (SELECT DISTINCT lang FROM documents),
    sources AS (SELECT DISTINCT source FROM documents),
    cells AS (
        SELECT l.lang, s.source, COALESCE(c.n_obs, 0) AS n_obs
        FROM langs l CROSS JOIN sources s
        LEFT JOIN c ON c.lang = l.lang AND c.source = s.source
    ),
    m AS (
        SELECT lang, source, n_obs,
               SUM(n_obs) OVER (PARTITION BY lang) AS rl,
               SUM(n_obs) OVER (PARTITION BY source) AS cs,
               SUM(n_obs) OVER () AS n,
               COUNT(*) OVER (PARTITION BY source) AS n_lang,
               COUNT(*) OVER (PARTITION BY lang) AS n_source
        FROM cells
    ),
    t AS (
        SELECT *, CAST(rl AS DOUBLE) * cs / n AS expected FROM m
    ),
    t2 AS (
        SELECT *,
               CAST(round((CAST(n_obs AS DOUBLE) - expected)
                          * (CAST(n_obs AS DOUBLE) - expected)
                          / expected, 6) AS DECIMAL(18,6)) AS term
        FROM t
    ),
    s AS (SELECT CAST(SUM(term) AS DOUBLE) AS chi2 FROM t2)
    SELECT lang, source,
           CAST(n_obs AS BIGINT) AS n_obs,
           expected,
           s.chi2 AS chi2,
           sqrt(s.chi2 / (CAST(n AS DOUBLE)
                          * (least(n_lang, n_source) - 1))) AS cramers_v
    FROM t2, s
    """,
    tags=("quality", "statistics", "association"),
)
def quality_cramers_v_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between the lang and source categorical
    columns — the effect-size companion to the chi² drift gate (chi²
    says "dependent or not at this n"; V ∈ [0,1] says HOW dependent,
    comparable across corpus sizes): build the COMPLETE r×c contingency
    table (distinct-lang × distinct-source cross join, left-joined
    counts — a structurally-zero cell still owes its full (0−e)²/e
    term, the same absent-category rule the Benford gate applies),
    expected counts e = row_tot·col_tot/n, per-cell terms rounded to 6
    decimals and summed exactly, then V = √(χ²/(n·(min(r,c)−1))).
    The window trick for the dimensions: in a complete cross join the
    per-lang cell count IS n_source and vice versa, so both dof inputs
    fall out of the same window pass that computes the margins — no
    second scan, no countDistinct.

    Scale: one corpus scan → r×c cell counts (map-side combined);
    margins and totals are window sums over the cell table (r·c rows —
    sketch-sized for any real categorical pair).  The distinct-value
    frames are the same histogram's projections, so the whole statistic
    is one aggregation plus arithmetic on its result."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    langs = docs.select("lang").distinct()
    sources = docs.select("source").distinct()
    cells = (
        langs.crossJoin(sources)
        .join(c, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        )
    )
    wl = Window.partitionBy("lang")
    ws = Window.partitionBy("source")
    w = Window.partitionBy()
    m = cells.select(
        "lang",
        "source",
        "n_obs",
        F.sum("n_obs").over(wl).alias("rl"),
        F.sum("n_obs").over(ws).alias("cs"),
        F.sum("n_obs").over(w).alias("n"),
        F.count(F.lit(1)).over(ws).alias("n_lang"),
        F.count(F.lit(1)).over(wl).alias("n_source"),
    )
    expected = F.col("rl").cast("double") * F.col("cs") / F.col("n")
    t2 = m.withColumn("expected", expected).withColumn(
        "term",
        F.round(
            (F.col("n_obs").cast("double") - F.col("expected"))
            * (F.col("n_obs").cast("double") - F.col("expected"))
            / F.col("expected"),
            6,
        ).cast("decimal(18,6)"),
    )
    chi2 = F.sum("term").over(w).cast("double")
    return t2.select(
        "lang",
        "source",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        "expected",
        chi2.alias("chi2"),
        F.sqrt(
            chi2
            / (
                F.col("n").cast("double")
                * (F.least("n_lang", "n_source") - 1)
            )
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test (A/B experiment readout)
# ---------------------------------------------------------------------------

#: Two-sided z critical value at alpha = 0.05.
Z_CRIT_005 = 1.959963984540054


@register(
    "quality_two_proportion_ztest",
    oracle=f"""
    WITH e AS (
        SELECT user_id % 2 AS variant,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        FROM events
    ),
    agg AS (
        SELECT
            SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
            SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS conv_a,
            SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
            SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS conv_b
        FROM e
    ),
    p AS (
        SELECT *,
               CAST(conv_a AS DOUBLE) / n_a AS p_a,
               CAST(conv_b AS DOUBLE) / n_b AS p_b,
               CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS p_pool
        FROM agg
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(conv_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(conv_b AS BIGINT) AS conv_b,
           p_a, p_b,
           CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                ELSE (p_a - p_b) / sqrt(p_pool * (1.0 - p_pool)
                                        * (1.0 / n_a + 1.0 / n_b))
           END AS z_stat,
           CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                ELSE abs((p_a - p_b) / sqrt(p_pool * (1.0 - p_pool)
                                            * (1.0 / n_a + 1.0 / n_b)))
                     > {Z_CRIT_005}
           END AS significant_005
    FROM p
    """,
    tags=("quality", "statistics", "abtest"),
)
def quality_two_proportion_ztest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-proportion pooled z-test on purchase conversion, variants
    assigned by user_id parity — the A/B-experiment readout an
    analytics engine owes its users (the Mann-Whitney and
    Brown-Forsythe gates cover ordinal and variance shifts; this is
    the binary-outcome member): conversion counts are exact integer
    conditional sums from ONE scan, and every downstream step
    (p̂_a, p̂_b, pooled p̂, z = (p̂_a−p̂_b)/√(p̂(1−p̂)(1/n_a+1/n_b)))
    is IEEE-exact division/sqrt on those integers, written with
    identical operator structure on both engines, so the statistic is
    bit-identical cross-engine with no rounding discipline needed.
    Fires two-sided at |z| > 1.96.  user_id parity is the textbook
    deterministic hash-split (sample_hash_split generalizes it).

    Scale: one scan, four conditional-sum cells with map-side combine
    (constant state), then scalar arithmetic — the cheapest possible
    drift/test shape; valid at any SF because the z-test's n appears
    only inside the exact integer cells."""
    ev = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("variant"),
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(0))
        .alias("conv"),
    )
    agg = ev.agg(
        F.sum(
            F.when(F.col("variant") == 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_a"),
        F.sum(
            F.when(F.col("variant") == 0, F.col("conv")).otherwise(
                F.lit(0)
            )
        ).alias("conv_a"),
        F.sum(
            F.when(F.col("variant") == 1, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_b"),
        F.sum(
            F.when(F.col("variant") == 1, F.col("conv")).otherwise(
                F.lit(0)
            )
        ).alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    p = agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("conv_a").cast("bigint").alias("conv_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("conv_b").cast("bigint").alias("conv_b"),
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        p_pool.alias("p_pool"),
    )
    z = (F.col("p_a") - F.col("p_b")) / F.sqrt(
        F.col("p_pool")
        * (F.lit(1.0) - F.col("p_pool"))
        * (
            F.lit(1.0) / F.col("n_a")
            + F.lit(1.0) / F.col("n_b")
        )
    )
    # An empty variant would otherwise emit inf/NULL division noise
    # dressed as a z-test; unreachable under user_id-parity assignment
    # on this data, but the guard keeps the contract honest for any
    # filtered deployment (HANDOFF r07 soft-spot).
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return p.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        "p_a",
        "p_b",
        F.when(both, z).alias("z_stat"),
        F.when(both, F.abs(z) > F.lit(Z_CRIT_005)).alias(
            "significant_005"
        ),
    )


# ---------------------------------------------------------------------------
# Mutual information / normalized MI
# ---------------------------------------------------------------------------


@register(
    "quality_mutual_information",
    oracle="""
    WITH c AS (
        SELECT lang, source, count(*) AS n_obs
        FROM documents GROUP BY 1, 2
    ),
    m AS (
        SELECT lang, source, n_obs,
               SUM(n_obs) OVER (PARTITION BY lang) AS rl,
               SUM(n_obs) OVER (PARTITION BY source) AS cs,
               SUM(n_obs) OVER () AS n
        FROM c
    ),
    mi_t AS (
        SELECT CAST(round((CAST(n_obs AS DOUBLE) / n)
                          * ln(CAST(n_obs AS DOUBLE) * n
                               / (CAST(rl AS DOUBLE) * cs)), 6)
                    AS DECIMAL(18,6)) AS term,
               n
        FROM m
    ),
    hl_t AS (
        SELECT CAST(round((CAST(rl AS DOUBLE) / n)
                          * ln(CAST(rl AS DOUBLE) / n), 6)
                    AS DECIMAL(18,6)) AS term
        FROM (SELECT lang, count(*) AS rl,
                     SUM(count(*)) OVER () AS n
              FROM documents GROUP BY lang)
    ),
    hs_t AS (
        SELECT CAST(round((CAST(cs AS DOUBLE) / n)
                          * ln(CAST(cs AS DOUBLE) / n), 6)
                    AS DECIMAL(18,6)) AS term
        FROM (SELECT source, count(*) AS cs,
                     SUM(count(*)) OVER () AS n
              FROM documents GROUP BY source)
    ),
    s AS (
        SELECT (SELECT CAST(max(n) AS BIGINT) FROM mi_t) AS n,
               (SELECT CAST(SUM(term) AS DOUBLE) FROM mi_t) AS mi,
               -(SELECT CAST(SUM(term) AS DOUBLE) FROM hl_t) AS h_lang,
               -(SELECT CAST(SUM(term) AS DOUBLE) FROM hs_t) AS h_source
    )
    SELECT n, mi, h_lang, h_source,
           mi / sqrt(h_lang * h_source) AS nmi
    FROM s
    """,
    tags=("quality", "statistics", "association"),
)
def quality_mutual_information(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mutual information I(lang; source) with both marginal entropies
    and the sqrt-normalized NMI — the information-theoretic companion
    to Cramér's V (V says how far from independence in χ² units; MI
    says how many NATS one label reveals about the other, the quantity
    cluster-evaluation and feature-selection pipelines actually
    compare): I = Σ p_ls·ln(p_ls/(p_l·p_s)) over OBSERVED cells only
    (lim p→0 of p·ln p is 0, so structural zeros contribute nothing —
    the complete-table rule applies to χ², not MI), entropies from the
    marginal histograms, every libm term rounded to 6 decimals and
    summed exactly, NMI = I/√(H_l·H_s) ∈ [0,1].

    Scale: one r×c cell aggregation (map-side combined) + window
    margins — the Cramér kernel's shape; the two entropy scans are
    marginal-histogram-sized aggregates of the same pass's
    projections."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    w = Window.partitionBy()
    m = c.select(
        "n_obs",
        F.sum("n_obs").over(Window.partitionBy("lang")).alias("rl"),
        F.sum("n_obs").over(Window.partitionBy("source")).alias("cs"),
        F.sum("n_obs").over(w).alias("n"),
    )
    mi_t = m.select(
        F.round(
            (F.col("n_obs").cast("double") / F.col("n"))
            * F.log(
                F.col("n_obs").cast("double")
                * F.col("n")
                / (F.col("rl").cast("double") * F.col("cs"))
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("term"),
        "n",
    )
    mi_row = mi_t.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum("term").cast("double").alias("mi"),
    )

    def entropy(col: str, alias: str) -> DataFrame:
        marg = docs.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        t = marg.select(
            F.round(
                (
                    F.col("cnt").cast("double")
                    / F.sum("cnt").over(w)
                )
                * F.log(
                    F.col("cnt").cast("double") / F.sum("cnt").over(w)
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("term")
        )
        return t.agg((-F.sum("term").cast("double")).alias(alias))

    out = (
        mi_row.crossJoin(entropy("lang", "h_lang"))
        .crossJoin(entropy("source", "h_source"))
    )
    return out.select(
        "n",
        "mi",
        "h_lang",
        "h_source",
        (
            F.col("mi")
            / F.sqrt(F.col("h_lang") * F.col("h_source"))
        ).alias("nmi"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation
# ---------------------------------------------------------------------------


@register(
    "quality_spearman_corr",
    oracle="""
    WITH x AS (
        SELECT doc_id, n_chars AS xv,
               len(string_split(text, ' ')) AS yv
        FROM documents
    ),
    rx AS (
        SELECT xv,
               2 * (SUM(count(*)) OVER (ORDER BY xv) - count(*))
                   + count(*) + 1 AS r2
        FROM x GROUP BY xv
    ),
    ry AS (
        SELECT yv,
               2 * (SUM(count(*)) OVER (ORDER BY yv) - count(*))
                   + count(*) + 1 AS r2
        FROM x GROUP BY yv
    ),
    ranked AS (
        SELECT rx.r2 AS a, ry.r2 AS b
        FROM x JOIN rx ON rx.xv = x.xv JOIN ry ON ry.yv = x.yv
    ),
    s AS (
        SELECT count(*) AS n,
               CAST(SUM(a) AS BIGINT) AS sa,
               CAST(SUM(b) AS BIGINT) AS sb,
               CAST(SUM(a * a) AS BIGINT) AS saa,
               CAST(SUM(b * b) AS BIGINT) AS sbb,
               CAST(SUM(a * b) AS BIGINT) AS sab
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n,
           (CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
               / (sqrt(CAST(n AS DOUBLE) * saa
                       - CAST(sa AS DOUBLE) * sa)
                  * sqrt(CAST(n AS DOUBLE) * sbb
                         - CAST(sb AS DOUBLE) * sb)) AS rho
    FROM s
    """,
    tags=("quality", "statistics", "robust"),
)
def quality_spearman_corr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spearman rank correlation between document length (n_chars) and
    whitespace token count — the robust monotone-association number a
    data card should quote beside any Pearson value (rank-based, so one
    concatenation artifact can't drag it): midranks come from the
    count-of-counts cumulative trick shared with the Mann-Whitney gate
    (rank of a tied value = cum_before + (c+1)/2; DOUBLING makes every
    midrank the integer 2·cum_before + c + 1, so all five moment sums
    are exact integers — Pearson on ranks is scale-invariant, hence
    ρ on doubled ranks IS Spearman's ρ), and the final formula is pure
    IEEE arithmetic on those integers, bit-identical cross-engine.

    Scale: two value-histogram aggregations (map-side combined,
    distinct-value-sized) + two narrow rank joins back + one 5-sum
    scalar aggregate; no global row sort — ranks never materialize an
    ordering, they come from cumulative counts over the value
    histogram.  Doubled-rank moment sums stay under 4n³ — switch the
    two square sums to DECIMAL(38,0) past ~10⁹ rows."""
    from pyspark.sql import Window

    x = table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("xv"),
        F.size(F.split(F.col("text"), " ")).alias("yv"),
    )

    def rank2(col: str) -> DataFrame:
        h = x.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        wcum = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return h.select(
            col,
            (
                2 * (F.sum("c").over(wcum) - F.col("c"))
                + F.col("c")
                + 1
            ).alias("r2"),
        )

    ranked = (
        x.join(rank2("xv").withColumnRenamed("r2", "a"), "xv")
        .join(rank2("yv").withColumnRenamed("r2", "b"), "yv")
        .select("a", "b")
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum(F.col("a") * F.col("a")).cast("bigint").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("bigint").alias("sbb"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("sab"),
    )
    rho = (
        F.col("n").cast("double") * F.col("sab")
        - F.col("sa").cast("double") * F.col("sb")
    ) / (
        F.sqrt(
            F.col("n").cast("double") * F.col("saa")
            - F.col("sa").cast("double") * F.col("sa")
        )
        * F.sqrt(
            F.col("n").cast("double") * F.col("sbb")
            - F.col("sb").cast("double") * F.col("sb")
        )
    )
    return s.select(
        F.col("n").cast("bigint").alias("n"), rho.alias("rho")
    )


# ---------------------------------------------------------------------------
# Pearson correlation matrix
# ---------------------------------------------------------------------------

#: The lineitem numeric columns the correlation matrix covers.
PEARSON_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _pearson_oracle() -> str:
    sums = ["count(*) AS n"]
    for c in PEARSON_COLS:
        sums.append(f"SUM(CAST({c} AS DECIMAL(19,6))) AS s_{c}")
        sums.append(
            f"SUM(CAST({c} AS DECIMAL(19,6))"
            f" * CAST({c} AS DECIMAL(19,6))) AS ss_{c}"
        )
    pair_rows = []
    for i, a in enumerate(PEARSON_COLS):
        for b in PEARSON_COLS[i + 1:]:
            sums.append(
                f"SUM(CAST({a} AS DECIMAL(19,6))"
                f" * CAST({b} AS DECIMAL(19,6))) AS sp_{a}_{b}"
            )
            pair_rows.append(f"""
    SELECT '{a}' AS col_x, '{b}' AS col_y, CAST(n AS BIGINT) AS n,
           (CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)
            - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)
                   - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)
                     - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))
               AS corr
    FROM s""")
    return (
        "WITH s AS (SELECT " + ", ".join(sums) + " FROM lineitem)"
        + " UNION ALL ".join(pair_rows)
    )


@register(
    "quality_pearson_corr_lineitem",
    oracle=_pearson_oracle(),
    tags=("quality", "statistics"),
)
def quality_pearson_corr_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pearson correlation matrix over the four lineitem measures
    (quantity, price, discount, tax) — the first page of any numeric
    data profile, computed the only way that is deterministic AND
    single-pass at 100 TB: ONE aggregate produces every moment
    (n, Σx, Σx², Σxy for all 6 pairs = 15 sums) as EXACT decimal sums
    of per-row decimal(18,6)-quantized values (products carry 12 exact
    fraction digits — associative, partitioning-independent), and each
    pairwise r = (nΣxy−ΣxΣy)/(√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) is final
    IEEE arithmetic on those exact sums.  Never corr() per pair —
    that is 6 passes and order-dependent float accumulation.

    Scale: one map-side-combined scan, 15-cell state, 6-row output;
    the widest sum (price²) holds 26 integer digits of headroom in
    decimal(38,12)."""
    li = table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in PEARSON_COLS:
        aggs.append(F.sum(dec(c)).alias(f"s_{c}"))
        aggs.append(F.sum(dec(c) * dec(c)).alias(f"ss_{c}"))
    pairs = []
    for i, a in enumerate(PEARSON_COLS):
        for b in PEARSON_COLS[i + 1:]:
            aggs.append(F.sum(dec(a) * dec(b)).alias(f"sp_{a}_{b}"))
            pairs.append((a, b))
    s = li.agg(*aggs)
    corr_cols = []
    for i, (a, b) in enumerate(pairs):
        corr = (
            F.col("n").cast("double") * F.col(f"sp_{a}_{b}").cast("double")
            - F.col(f"s_{a}").cast("double") * F.col(f"s_{b}").cast("double")
        ) / (
            F.sqrt(
                F.col("n").cast("double") * F.col(f"ss_{a}").cast("double")
                - F.col(f"s_{a}").cast("double")
                * F.col(f"s_{a}").cast("double")
            )
            * F.sqrt(
                F.col("n").cast("double") * F.col(f"ss_{b}").cast("double")
                - F.col(f"s_{b}").cast("double")
                * F.col(f"s_{b}").cast("double")
            )
        )
        corr_cols.append(corr.alias(f"c{i}"))
    one = s.select(F.col("n").cast("bigint").alias("n"), *corr_cols)
    # stack() fans the single moment row out to 6 pair rows WITHOUT
    # re-reading the input — a union of per-pair selects would replay
    # the scan+aggregate once per pair (test_plans pins 1 scan).
    stack_expr = (
        f"stack({len(pairs)}, "
        + ", ".join(
            f"'{a}', '{b}', c{i}" for i, (a, b) in enumerate(pairs)
        )
        + ") as (col_x, col_y, corr)"
    )
    return one.select(F.expr(stack_expr), "n").select(
        "col_x", "col_y", "n", "corr"
    )


# ---------------------------------------------------------------------------
# Isotonic calibration (PAVA via the minimax formula)
# ---------------------------------------------------------------------------

#: Character-bucket width for the isotonic calibration curve's bins.
ISO_BIN_CHARS = 25
#: Threshold defining the binary outcome being calibrated ("long doc"
#: = more than this many whitespace tokens).
ISO_TOKEN_THRESHOLD = 40


@register(
    "quality_isotonic_calibration",
    oracle=f"""
    WITH bins AS (
        SELECT n_chars // {ISO_BIN_CHARS} AS b,
               count(*) AS nb,
               SUM(CASE WHEN len(string_split(text, ' '))
                            > {ISO_TOKEN_THRESHOLD}
                        THEN 1 ELSE 0 END) AS yb
        FROM documents GROUP BY 1
    ),
    cum AS (
        SELECT b, nb, yb,
               SUM(nb) OVER (ORDER BY b) AS cn,
               SUM(yb) OVER (ORDER BY b) AS cy
        FROM bins
    ),
    rng AS (
        SELECT j.b AS jb, k.b AS kb,
               CAST(k.cy - j.cy + j.yb AS DOUBLE)
                   / (k.cn - j.cn + j.nb) AS avg_jk
        FROM cum j JOIN cum k ON j.b <= k.b
    ),
    m AS (
        SELECT i.b, r.jb, min(r.avg_jk) AS mn
        FROM cum i JOIN rng r ON r.jb <= i.b AND r.kb >= i.b
        GROUP BY i.b, r.jb
    ),
    fit AS (SELECT b, max(mn) AS fitted FROM m GROUP BY b)
    SELECT c.b AS bin,
           CAST(c.nb AS BIGINT) AS n,
           CAST(c.yb AS BIGINT) AS n_pos,
           CAST(c.yb AS DOUBLE) / c.nb AS rate_raw,
           f.fitted AS rate_isotonic
    FROM cum c JOIN fit f ON f.b = c.b
    """,
    tags=("quality", "calibration", "statistics"),
)
def quality_isotonic_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Isotonic (PAVA) calibration curve of P(long doc | length bin) —
    the monotone regression every score-calibration pipeline runs
    (Platt's logistic alternative assumes a shape; isotonic only
    assumes monotone), expressed DECLARATIVELY via the minimax
    characterization ŷᵢ = max_{j≤i} min_{k≥i} avg(y[j..k]) instead of
    the sequential pool-adjacent-violators loop: every range average
    is ONE double division of exact cumulative integer sums (identical
    operand bits ⇒ identical quotient bits cross-engine), and min/max
    never accumulate floats — so the fit is bit-stable with no
    rounding discipline, and the whole algorithm is three joins over
    the BIN table.  The sequential PAVA recursion is the python replay
    in tests; at bin granularity the two are provably equal.

    Scale: one corpus scan collapses to B bins (map-side combine); the
    minimax joins are O(B³) rows on the bin table (B ≤ a few hundred
    for any sane calibration curve — 10⁶ rows of join at B=100, still
    sketch-sized).  For B beyond that, run the classic O(B) PAVA
    driver-side on the collected bins, exactly as k-means collects
    centroids; the corpus-side cost is identical."""
    docs = table(spark, sf_dir, "documents")
    bins = docs.groupBy(
        F.expr(f"n_chars div {ISO_BIN_CHARS}").alias("b")
    ).agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(
            (
                F.size(F.split(F.col("text"), " "))
                > ISO_TOKEN_THRESHOLD
            ).cast("bigint")
        ).alias("yb"),
    )
    return isotonic_minimax_fit(bins).select(
        F.col("b").alias("bin"),
        F.col("nb").cast("bigint").alias("n"),
        F.col("yb").cast("bigint").alias("n_pos"),
        (F.col("yb").cast("double") / F.col("nb")).alias("rate_raw"),
        F.col("fitted").alias("rate_isotonic"),
    )


def isotonic_minimax_fit(bins: DataFrame, part=None) -> DataFrame:
    """Shared minimax-PAVA kernel: given a bin table (columns ``part``*,
    ``b`` bin key, ``nb`` weight, ``yb`` positive count), return it with
    the isotonic ``fitted`` column — ŷᵢ = max_{j≤i} min_{k≥i}
    avg(y[j..k]) computed per ``part`` partition.  Every range average
    is ONE exact integer division; min/max never accumulate floats.
    Shared by the batch calibration gate and the streaming
    recalibration monitor (kernel reuse guard-tested)."""
    import functools as _ft

    from pyspark.sql import Window

    part = list(part or [])
    wcum = (
        Window.partitionBy(*part)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bins.select(
        *part,
        "b",
        "nb",
        "yb",
        F.sum("nb").over(wcum).alias("cn"),
        F.sum("yb").over(wcum).alias("cy"),
    ).localCheckpoint(eager=True)
    j, k, i = cum.alias("j"), cum.alias("k"), cum.alias("i")
    cond_jk = _ft.reduce(
        lambda a, c: a & (F.col(f"j.{c}") == F.col(f"k.{c}")),
        part,
        F.col("j.b") <= F.col("k.b"),
    )
    rng = j.join(k, cond_jk).select(
        *[F.col(f"j.{c}").alias(c) for c in part],
        F.col("j.b").alias("jb"),
        F.col("k.b").alias("kb"),
        (
            (
                F.col("k.cy") - F.col("j.cy") + F.col("j.yb")
            ).cast("double")
            / (F.col("k.cn") - F.col("j.cn") + F.col("j.nb"))
        ).alias("avg_jk"),
    )
    cond_i = _ft.reduce(
        lambda a, c: a & (F.col(f"i.{c}") == F.col(f"rng.{c}")),
        part,
        (F.col("rng.jb") <= F.col("i.b"))
        & (F.col("rng.kb") >= F.col("i.b")),
    )
    m = (
        i.join(rng.alias("rng"), cond_i)
        .groupBy(
            *[F.col(f"i.{c}").alias(c) for c in part],
            F.col("i.b").alias("b"),
            F.col("rng.jb").alias("jb"),
        )
        .agg(F.min("avg_jk").alias("mn"))
    )
    fit = m.groupBy(*part, "b").agg(F.max("mn").alias("fitted"))
    return cum.join(fit, [*part, "b"])


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test
# ---------------------------------------------------------------------------


@register(
    "quality_runs_test_daily",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,6))) AS x
        FROM events GROUP BY 1
    ),
    diffs AS (
        SELECT day,
               CASE WHEN x > lag(x) OVER (ORDER BY day) THEN 1
                    WHEN x < lag(x) OVER (ORDER BY day) THEN -1
               END AS s
        FROM daily
    ),
    signs AS (
        SELECT day, s,
               lag(s) OVER (ORDER BY day) AS prev
        FROM diffs WHERE s IS NOT NULL
    ),
    agg AS (
        SELECT SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS n2,
               1 + SUM(CASE WHEN prev IS NOT NULL AND s <> prev
                            THEN 1 ELSE 0 END) AS r
        FROM signs
    ),
    stat AS (
        SELECT n1, n2, r,
               1.0 + 2.0 * n1 * n2 / (n1 + n2) AS er,
               (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2))
                   / ((CAST(n1 + n2 AS DOUBLE) * (n1 + n2))
                      * (n1 + n2 - 1)) AS vr
        FROM agg
    )
    SELECT CAST(n1 AS BIGINT) AS n_up,
           CAST(n2 AS BIGINT) AS n_down,
           CAST(r AS BIGINT) AS n_runs,
           er AS expected_runs,
           (r - er) / sqrt(vr) AS z_stat,
           abs((r - er) / sqrt(vr)) <= {Z_CRIT_005} AS random_005
    FROM stat
    """,
    tags=("quality", "statistics", "randomness"),
)
def quality_runs_test_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily revenue series' up/down
    moves — the randomness gate that catches AUTOCORRELATION the
    distribution tests can't see (a perfectly normal-looking series
    that always rises then always falls fails the runs count; the ACF
    op quantifies the structure, this one delivers the verdict): day
    signs from exact-decimal differences (ties dropped, the standard
    convention), runs counted as 1 + sign changes via one lag window
    over the filtered sign sequence, then z against the exact null
    moments E[R] = 1 + 2n₁n₂/n and the classical variance — all IEEE
    arithmetic on the three integers (n₁, n₂, R), bit-identical
    cross-engine, no rounding discipline.

    Scale: the series collapse is one map-side-combined groupBy(day);
    both lag windows run over the calendar-sized table.  At 100 TB
    per-key series partition the windows by key."""
    from pyspark.sql import Window

    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.sum(dec("value")).alias("x"))
    )
    wd = Window.orderBy("day")
    diffs = daily.select(
        "day",
        F.when(F.col("x") > F.lag("x").over(wd), F.lit(1))
        .when(F.col("x") < F.lag("x").over(wd), F.lit(-1))
        .alias("s"),
    )
    signs = diffs.filter(F.col("s").isNotNull()).select(
        "day", "s", F.lag("s").over(wd).alias("prev")
    )
    agg = signs.agg(
        F.sum(
            F.when(F.col("s") == 1, F.lit(1)).otherwise(F.lit(0))
        ).alias("n1"),
        F.sum(
            F.when(F.col("s") == -1, F.lit(1)).otherwise(F.lit(0))
        ).alias("n2"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("s") != F.col("prev")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
        ).alias("r"),
    )
    er = F.lit(1.0) + F.lit(2.0) * F.col("n1") * F.col("n2") / (
        F.col("n1") + F.col("n2")
    )
    vr = (
        F.lit(2.0)
        * F.col("n1")
        * F.col("n2")
        * (
            F.lit(2.0) * F.col("n1") * F.col("n2")
            - F.col("n1")
            - F.col("n2")
        )
    ) / (
        (
            (F.col("n1") + F.col("n2")).cast("double")
            * (F.col("n1") + F.col("n2"))
        )
        * (F.col("n1") + F.col("n2") - 1)
    )
    stat = agg.select(
        F.col("n1").cast("bigint").alias("n_up"),
        F.col("n2").cast("bigint").alias("n_down"),
        F.col("r").cast("bigint").alias("n_runs"),
        er.alias("expected_runs"),
        ((F.col("r") - er) / F.sqrt(vr)).alias("z_stat"),
    )
    return stat.select(
        "n_up",
        "n_down",
        "n_runs",
        "expected_runs",
        "z_stat",
        (F.abs(F.col("z_stat")) <= F.lit(Z_CRIT_005)).alias(
            "random_005"
        ),
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality gate
# ---------------------------------------------------------------------------


@register(
    "quality_jarque_bera_nchars",
    oracle=f"""
    WITH s AS (
        SELECT count(*) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS sx,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx,
               CAST(SUM(n_chars * n_chars * n_chars) AS BIGINT) AS sxxx,
               CAST(SUM(n_chars * n_chars * n_chars * n_chars)
                    AS BIGINT) AS sxxxx
        FROM documents
    ),
    m AS (
        SELECT n, sx, sxx, sxxx, sxxxx,
               CAST(sx AS DOUBLE) / n AS mu
        FROM s
    ),
    cm AS (
        SELECT n, mu,
               CAST(sxx AS DOUBLE) / n - mu * mu AS m2,
               CAST(sxxx AS DOUBLE) / n
                   - 3.0 * mu * (CAST(sxx AS DOUBLE) / n)
                   + 2.0 * mu * mu * mu AS m3,
               CAST(sxxxx AS DOUBLE) / n
                   - 4.0 * mu * (CAST(sxxx AS DOUBLE) / n)
                   + 6.0 * mu * mu * (CAST(sxx AS DOUBLE) / n)
                   - 3.0 * mu * mu * mu * mu AS m4
        FROM m
    ),
    sk AS (
        SELECT n, mu, m2,
               m3 / (m2 * sqrt(m2)) AS skewness,
               m4 / (m2 * m2) AS kurtosis
        FROM cm
    )
    SELECT CAST(n AS BIGINT) AS n,
           mu AS mean,
           skewness,
           kurtosis,
           CAST(n AS DOUBLE) / 6.0
               * (skewness * skewness
                  + (kurtosis - 3.0) * (kurtosis - 3.0) / 4.0) AS jb,
           CAST(n AS DOUBLE) / 6.0
               * (skewness * skewness
                  + (kurtosis - 3.0) * (kurtosis - 3.0) / 4.0)
               > {CHI2_CRIT_005[2]} AS non_normal
    FROM sk
    """,
    tags=("quality", "statistics", "drift"),
)
def quality_jarque_bera_nchars(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Jarque-Bera normality gate on document length — the
    moment-based test that says WHETHER a Gaussian assumption is even
    admissible before anyone z-scores the column (the rolling-z and
    MAD ops assume rough symmetry; JB is the admission check): sample
    skewness and excess kurtosis derive from the four raw power sums —
    exact BIGINTs from ONE map-side-combined scan — via the standard
    central-moment expansions written with identical operator
    structure on both engines, so every IEEE step is bit-identical;
    JB = n/6·(S² + (K−3)²/4) against the χ²(2) critical value from
    the shared CHI2_CRIT_005 table.

    Scale: one scan, four integer cells.  The quartic power sum
    overflows BIGINT past ~10⁶ average-length docs per 2⁶³ — switch
    sxxxx to DECIMAL(38,0) there (same plan, still map-side
    combined)."""
    docs = table(spark, sf_dir, "documents")
    x = F.col("n_chars")
    s = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("bigint").alias("sx"),
        F.sum(x * x).cast("bigint").alias("sxx"),
        F.sum(x * x * x).cast("bigint").alias("sxxx"),
        F.sum(x * x * x * x).cast("bigint").alias("sxxxx"),
    )
    mu = F.col("sx").cast("double") / F.col("n")
    m = s.withColumn("mu", mu)
    m2 = F.col("sxx").cast("double") / F.col("n") - F.col("mu") * F.col(
        "mu"
    )
    m3 = (
        F.col("sxxx").cast("double") / F.col("n")
        - F.lit(3.0)
        * F.col("mu")
        * (F.col("sxx").cast("double") / F.col("n"))
        + F.lit(2.0) * F.col("mu") * F.col("mu") * F.col("mu")
    )
    m4 = (
        F.col("sxxxx").cast("double") / F.col("n")
        - F.lit(4.0)
        * F.col("mu")
        * (F.col("sxxx").cast("double") / F.col("n"))
        + F.lit(6.0)
        * F.col("mu")
        * F.col("mu")
        * (F.col("sxx").cast("double") / F.col("n"))
        - F.lit(3.0)
        * F.col("mu")
        * F.col("mu")
        * F.col("mu")
        * F.col("mu")
    )
    cm = m.withColumn("m2", m2).withColumn("m3", m3).withColumn(
        "m4", m4
    )
    sk = cm.withColumn(
        "skewness", F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))
    ).withColumn("kurtosis", F.col("m4") / (F.col("m2") * F.col("m2")))
    jb = (
        F.col("n").cast("double")
        / F.lit(6.0)
        * (
            F.col("skewness") * F.col("skewness")
            + (F.col("kurtosis") - F.lit(3.0))
            * (F.col("kurtosis") - F.lit(3.0))
            / F.lit(4.0)
        )
    )
    return sk.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("mu").alias("mean"),
        "skewness",
        "kurtosis",
        jb.alias("jb"),
        (jb > F.lit(CHI2_CRIT_005[2])).alias("non_normal"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b
# ---------------------------------------------------------------------------


@register(
    "quality_kendall_tau_corr",
    oracle="""
    WITH obs AS (
        SELECT n_chars AS x,
               len(string_split(text, ' ')) AS y
        FROM documents
    ),
    cells AS (
        SELECT x, y, count(*) AS nc FROM obs GROUP BY 1, 2
    ),
    tot AS (SELECT count(*) AS n FROM obs),
    pairs AS (
        SELECT
            CAST(SUM(CASE WHEN b.y > a.y
                          THEN a.nc * b.nc ELSE 0 END) AS BIGINT) AS c,
            CAST(SUM(CASE WHEN b.y < a.y
                          THEN a.nc * b.nc ELSE 0 END) AS BIGINT) AS d
        FROM cells a JOIN cells b ON b.x > a.x
    ),
    tx AS (
        SELECT CAST(COALESCE(SUM(t * (t - 1) // 2), 0) AS BIGINT) AS n1
        FROM (SELECT count(*) AS t FROM obs GROUP BY x) WHERE t > 1
    ),
    ty AS (
        SELECT CAST(COALESCE(SUM(t * (t - 1) // 2), 0) AS BIGINT) AS n2
        FROM (SELECT count(*) AS t FROM obs GROUP BY y) WHERE t > 1
    ),
    s AS (
        SELECT tot.n, tot.n * (tot.n - 1) // 2 AS n0,
               pairs.c, pairs.d, tx.n1, ty.n2
        FROM tot, pairs, tx, ty
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n0 AS BIGINT) AS n0_pairs,
           c AS concordant,
           d AS discordant,
           n1 AS ties_x,
           n2 AS ties_y,
           CAST(c - d AS DOUBLE)
               / sqrt(CAST(n0 - n1 AS DOUBLE) * (n0 - n2)) AS tau_b
    FROM s
    """,
    tags=("quality", "statistics", "robust"),
)
def quality_kendall_tau_corr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kendall τ-b between document length and whitespace token count —
    the third rank-association number beside Spearman's ρ (τ has the
    cleaner probabilistic reading: P(concordant) − P(discordant)) and
    the one with the textbook O(n²) trap, avoided here by counting
    dominance over the JOINT VALUE HISTOGRAM instead of observation
    pairs: concordant/discordant mass is Σ n_c·n_c' over cell pairs
    with x strictly greater and y strictly greater/smaller — a
    cell-table self-join whose cost is (distinct value pairs)², bounded
    by the VALUE DOMAIN product, never by row count.  Tie corrections
    n₁/n₂ come from the marginal histograms; everything is exact
    integer until the single final IEEE division — bit-identical
    cross-engine, no rounding discipline.

    Scale: one scan → cell histogram (map-side combined); the
    dominance join runs on cells (≤ |dom(x)|·|dom(y)| rows whatever
    the corpus size).  For genuinely continuous columns, quantize to
    the engine's 6-decimal grid first (τ on the quantized values) or
    range-band the join on x-buckets; the classic alternative is the
    O(n log n) Knight/BIT merge — a different kernel, not needed while
    domains stay histogram-sized."""
    obs = table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("x"),
        F.size(F.split(F.col("text"), " ")).alias("y"),
    )
    cells = obs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("nc"))
    tot = obs.agg(F.count(F.lit(1)).alias("n"))
    a, b = cells.alias("a"), cells.alias("b")
    pairs = a.join(b, F.col("b.x") > F.col("a.x")).agg(
        F.sum(
            F.when(
                F.col("b.y") > F.col("a.y"),
                F.col("a.nc") * F.col("b.nc"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("c"),
        F.sum(
            F.when(
                F.col("b.y") < F.col("a.y"),
                F.col("a.nc") * F.col("b.nc"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("d"),
    )

    def tie_sum(col: str, alias: str) -> DataFrame:
        return (
            obs.groupBy(col)
            .agg(F.count(F.lit(1)).alias("t"))
            .filter(F.col("t") > 1)
            .agg(
                F.coalesce(
                    F.sum(F.expr("t * (t - 1) div 2")), F.lit(0)
                )
                .cast("bigint")
                .alias(alias)
            )
        )

    s = (
        tot.crossJoin(pairs)
        .crossJoin(tie_sum("x", "n1"))
        .crossJoin(tie_sum("y", "n2"))
        .withColumn("n0", F.expr("n * (n - 1) div 2"))
    )
    tau = (F.col("c") - F.col("d")).cast("double") / F.sqrt(
        (F.col("n0") - F.col("n1")).cast("double")
        * (F.col("n0") - F.col("n2"))
    )
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n0").cast("bigint").alias("n0_pairs"),
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.col("n1").alias("ties_x"),
        F.col("n2").alias("ties_y"),
        tau.alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Cramér-von Mises two-sample drift (rank form, exact integers)
# ---------------------------------------------------------------------------

#: Asymptotic 5% critical value of the two-sample CvM T statistic.
CVM_CRIT_005 = 0.461


@register(
    "quality_cvm_drift",
    oracle=f"""
    WITH rows_t AS (
        SELECT n_chars AS v,
               CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_a,
               CASE WHEN source = 'src0' THEN 0 ELSE 1 END AS is_b
        FROM documents
    ),
    hist AS (
        SELECT v, SUM(is_a) AS ca, SUM(is_b) AS cb
        FROM rows_t GROUP BY v
    ),
    tot AS (SELECT SUM(is_a) AS na, SUM(is_b) AS nb FROM rows_t),
    cum AS (
        SELECT v, ca, cb,
               coalesce(SUM(ca + cb) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS lt_comb,
               coalesce(SUM(ca) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS lt_a,
               coalesce(SUM(cb) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS lt_b
        FROM hist
    ),
    terms AS (
        SELECT
            CASE WHEN ca > 0 THEN
                ca * (2 * lt_comb + ca + cb + 1 - 2 * lt_a)
                   * (2 * lt_comb + ca + cb + 1 - 2 * lt_a)
                - 4 * (2 * lt_comb + ca + cb + 1 - 2 * lt_a)
                    * (ca * (ca + 1) // 2)
                + 4 * (ca * (ca + 1) * (2 * ca + 1) // 6)
            ELSE 0 END AS qa,
            CASE WHEN cb > 0 THEN
                cb * (2 * lt_comb + ca + cb + 1 - 2 * lt_b)
                   * (2 * lt_comb + ca + cb + 1 - 2 * lt_b)
                - 4 * (2 * lt_comb + ca + cb + 1 - 2 * lt_b)
                    * (cb * (cb + 1) // 2)
                + 4 * (cb * (cb + 1) * (2 * cb + 1) // 6)
            ELSE 0 END AS qb
        FROM cum
    ),
    u4 AS (
        SELECT t.na, t.nb,
               t.na * SUM(qa) + t.nb * SUM(qb) AS u4
        FROM terms, tot t GROUP BY t.na, t.nb
    )
    SELECT CAST(na AS BIGINT) AS na,
           CAST(nb AS BIGINT) AS nb,
           CAST(u4 AS DOUBLE) AS u4,
           CAST(u4 AS DOUBLE)
               / (4.0 * CAST(na AS DOUBLE) * nb * (na + nb))
             - (4.0 * CAST(na AS DOUBLE) * nb - 1.0)
               / (6.0 * (na + nb)) AS t_stat,
           CAST(u4 AS DOUBLE)
               / (4.0 * CAST(na AS DOUBLE) * nb * (na + nb))
             - (4.0 * CAST(na AS DOUBLE) * nb - 1.0)
               / (6.0 * (na + nb)) > {CVM_CRIT_005} AS drift
    FROM u4
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_cvm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises drift test on document length
    (src0 vs rest) — the INTEGRATED companion of the KS gate: KS reads
    only the single worst ECDF gap, CvM sums the squared gap over the
    whole distribution, so it catches the diffuse many-small-
    differences drift KS under-weights.  Anderson's rank form
    T = U/(n·m·(n+m)) − (4nm−1)/(6(n+m)) with
    U = n·Σ(r_i − i)² + m·Σ(s_j − j)² is computed EXACTLY: with
    doubled midranks (ties → 2r = 2·#less + #eq + 1, an integer) every
    per-value tie block contributes the closed form
    c·a₀² − 4a₀·Σk + 4·Σk² (a₀ = 2R − 2·base; Σk, Σk² the triangular
    and square-pyramidal numbers), so 4U is ONE exact integer and T a
    single double expression — no per-element rank sort, just the
    value-distinct histogram with three exclusive cumulative windows.
    Fires at T > {CVM_CRIT_005} (asymptotic 5% point).

    Scale: state is the value-distinct length histogram (the KS
    monitor's bounded-state argument); the per-value closed form makes
    cost O(distinct values), never O(corpus).  Beyond ~1e8 docs the
    integer 4U term needs DECIMAL(38,0) — documented swap, same
    shape."""
    docs = table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("v"),
        F.when(F.col("source") == "src0", F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_a"),
        F.when(F.col("source") == "src0", F.lit(0))
        .otherwise(F.lit(1))
        .alias("is_b"),
    )
    # The value-distinct histogram is materialized once (it is
    # histogram-sized) so the terms branch and the totals branch share
    # ONE corpus scan — the plan pin
    # test_cvm_terms_stay_histogram_sized enforces it.
    hist = (
        docs.groupBy("v")
        .agg(F.sum("is_a").alias("ca"), F.sum("is_b").alias("cb"))
        .localCheckpoint(eager=True)
    )
    tot = hist.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    from pyspark.sql import Window

    prev = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        "ca",
        "cb",
        F.coalesce(
            F.sum(F.col("ca") + F.col("cb")).over(prev), F.lit(0)
        ).alias("lt_comb"),
        F.coalesce(F.sum("ca").over(prev), F.lit(0)).alias("lt_a"),
        F.coalesce(F.sum("cb").over(prev), F.lit(0)).alias("lt_b"),
    )

    def tie_block(c, lt_own):
        a0 = (
            F.lit(2) * F.col("lt_comb")
            + F.col("ca")
            + F.col("cb")
            + F.lit(1)
            - F.lit(2) * lt_own
        )
        t1 = F.expr(f"{c} * ({c} + 1) div 2")
        t2 = F.expr(f"{c} * ({c} + 1) * (2 * {c} + 1) div 6")
        return F.when(
            F.col(c) > 0,
            F.col(c) * a0 * a0 - F.lit(4) * a0 * t1 + F.lit(4) * t2,
        ).otherwise(F.lit(0))

    terms = cum.select(
        tie_block("ca", F.col("lt_a")).alias("qa"),
        tie_block("cb", F.col("lt_b")).alias("qb"),
    )
    u4 = (
        terms.agg(F.sum("qa").alias("sqa"), F.sum("qb").alias("sqb"))
        .crossJoin(F.broadcast(tot))
        .select(
            "na",
            "nb",
            (
                F.col("na") * F.col("sqa") + F.col("nb") * F.col("sqb")
            ).alias("u4"),
        )
    )
    t_stat = F.col("u4").cast("double") / (
        F.lit(4.0)
        * F.col("na").cast("double")
        * F.col("nb")
        * (F.col("na") + F.col("nb"))
    ) - (
        F.lit(4.0) * F.col("na").cast("double") * F.col("nb")
        - F.lit(1.0)
    ) / (
        F.lit(6.0) * (F.col("na") + F.col("nb"))
    )
    return u4.select(
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
        F.col("u4").cast("double").alias("u4"),
        t_stat.alias("t_stat"),
        (t_stat > F.lit(CVM_CRIT_005)).alias("drift"),
    )


# ---------------------------------------------------------------------------
# Hodges-Lehmann location shift (histogram-pair weighted median)
# ---------------------------------------------------------------------------


@register(
    "quality_hodges_lehmann_shift",
    oracle="""
    WITH ha AS (
        SELECT n_chars AS v, count(*) AS ca
        FROM documents WHERE source = 'src0' GROUP BY 1
    ),
    hb AS (
        SELECT n_chars AS v, count(*) AS cb
        FROM documents WHERE source <> 'src0' GROUP BY 1
    ),
    tot AS (
        SELECT (SELECT SUM(ca) FROM ha) AS na,
               (SELECT SUM(cb) FROM hb) AS nb
    ),
    diffs AS (
        SELECT hb.v - ha.v AS d, SUM(ha.ca * hb.cb) AS w
        FROM ha, hb GROUP BY 1
    ),
    cum AS (
        SELECT d, SUM(w) OVER (ORDER BY d) AS cw FROM diffs
    ),
    ks AS (
        SELECT na, nb, na * nb AS wtot,
               (na * nb + 1) // 2 AS k1,
               (na * nb + 2) // 2 AS k2
        FROM tot
    ),
    v1 AS (SELECT min(d) AS d1 FROM cum, ks WHERE cw >= k1),
    v2 AS (SELECT min(d) AS d2 FROM cum, ks WHERE cw >= k2)
    SELECT CAST(ks.na AS BIGINT) AS na,
           CAST(ks.nb AS BIGINT) AS nb,
           CAST(ks.wtot AS BIGINT) AS n_pairs,
           (CAST(v1.d1 AS DOUBLE) + v2.d2) / 2.0 AS hl_shift
    FROM ks, v1, v2
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_hodges_lehmann_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hodges-Lehmann location-shift estimate between src0 and the
    rest of the corpus (document length): the median of ALL n_a·n_b
    pairwise differences — the robust EFFECT-SIZE companion to the
    Mann-Whitney gate (MW says whether the distributions differ; HL
    says by HOW MUCH, in the data's own units, immune to outliers).
    The quadratic pair set is never materialized per-document: both
    samples collapse to value-distinct histograms, each DISTINCT
    difference d carries weight ca·cb, and the weighted median reads
    off one cumulative window — the (W+1)//2 and (W+2)//2 order
    statistics averaged, all in exact integers until the final
    halving.

    Scale: cost is |V_a|·|V_b| distinct-value pairs (document lengths
    are domain-bounded), not n_a·n_b document pairs — the same
    histogram collapse that makes the KS/CvM family corpus-scale.
    The cumulative window runs over the difference-distinct table."""
    docs = table(spark, sf_dir, "documents")
    ha = (
        docs.filter(F.col("source") == "src0")
        .groupBy(F.col("n_chars").alias("va"))
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    hb = (
        docs.filter(F.col("source") != "src0")
        .groupBy(F.col("n_chars").alias("vb"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    diffs = (
        F.broadcast(ha)
        .crossJoin(hb)
        .groupBy((F.col("vb") - F.col("va")).alias("d"))
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("w"))
    )
    from pyspark.sql import Window

    cum = diffs.select(
        "d",
        F.sum("w")
        .over(
            Window.orderBy("d").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cw"),
    )
    tot = ha.agg(F.sum("ca").alias("na")).crossJoin(
        hb.agg(F.sum("cb").alias("nb"))
    )
    ks = tot.select(
        "na",
        "nb",
        (F.col("na") * F.col("nb")).alias("wtot"),
        F.expr("(na * nb + 1) div 2").alias("k1"),
        F.expr("(na * nb + 2) div 2").alias("k2"),
    )
    with_k = cum.crossJoin(F.broadcast(ks))
    v1 = with_k.filter(F.col("cw") >= F.col("k1")).agg(
        F.min("d").alias("d1")
    )
    v2 = with_k.filter(F.col("cw") >= F.col("k2")).agg(
        F.min("d").alias("d2")
    )
    return (
        ks.crossJoin(F.broadcast(v1))
        .crossJoin(F.broadcast(v2))
        .select(
            F.col("na").cast("bigint").alias("na"),
            F.col("nb").cast("bigint").alias("nb"),
            F.col("wtot").cast("bigint").alias("n_pairs"),
            (
                (F.col("d1").cast("double") + F.col("d2"))
                / F.lit(2.0)
            ).alias("hl_shift"),
        )
    )


# ---------------------------------------------------------------------------
# QQ deciles: per-source quantiles against the src0 reference
# ---------------------------------------------------------------------------


@register(
    "quality_qq_deciles_sources",
    oracle="""
    WITH refl AS (
        SELECT quantile_cont(n_chars,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS ps
        FROM documents WHERE source = 'src0'
    ),
    ref AS (
        SELECT t.i AS q, round(refl.ps[t.i], 6) AS rv
        FROM refl, unnest(generate_series(1, 9)) AS t(i)
    ),
    curl AS (
        SELECT source, quantile_cont(n_chars,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS ps
        FROM documents WHERE source <> 'src0' GROUP BY source
    ),
    cur AS (
        SELECT source, t.i AS q, round(curl.ps[t.i], 6) AS cv
        FROM curl, unnest(generate_series(1, 9)) AS t(i)
    )
    SELECT cur.source,
           CAST(cur.q AS INT) AS q,
           ref.rv AS ref_value,
           cur.cv AS cur_value,
           round(cur.cv - ref.rv, 6) AS gap
    FROM cur JOIN ref ON ref.q = cur.q
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_qq_deciles_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """QQ diagnostic: deciles (q10..q90) of document length for every
    non-reference source plotted against the src0 reference deciles —
    the quantile-by-quantile view that LOCALIZES drift the scalar
    gates only detect (a KS/CvM alarm says "different"; the QQ gaps
    say "the upper tail is 40 chars longer").  Exact
    linear-interpolation quantiles on both engines (the
    quality_exact_percentiles convention — round(6) absorbs the
    interpolation's last ulp), one row per (source, decile) with the
    signed gap.

    Scale: exact per-group quantiles buffer each group (documented
    cost of exactness; sources are few) — unbounded group counts swap
    to approx_percentile, same table shape.  One scan for all sources
    via grouped aggregation; the 9-decile frame is a constant."""
    docs = table(spark, sf_dir, "documents")
    probs = "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)"
    ref = (
        docs.filter(F.col("source") == "src0")
        .agg(F.expr(f"percentile(n_chars, {probs})").alias("ps"))
        .select(F.posexplode("ps").alias("qi", "rv0"))
        .select(
            (F.col("qi") + 1).cast("int").alias("q"),
            F.round(F.col("rv0"), 6).alias("rv"),
        )
    )
    cur = (
        docs.filter(F.col("source") != "src0")
        .groupBy("source")
        .agg(F.expr(f"percentile(n_chars, {probs})").alias("ps"))
        .select("source", F.posexplode("ps").alias("qi", "cv0"))
        .select(
            "source",
            (F.col("qi") + 1).cast("int").alias("q"),
            F.round(F.col("cv0"), 6).alias("cv"),
        )
    )
    return cur.join(F.broadcast(ref), "q").select(
        "source",
        F.col("q").cast("int").alias("q"),
        F.col("rv").alias("ref_value"),
        F.col("cv").alias("cur_value"),
        F.round(F.col("cv") - F.col("rv"), 6).alias("gap"),
    )


# ---------------------------------------------------------------------------
# Brier score with Murphy decomposition (train/test calibration split)
# ---------------------------------------------------------------------------


@register(
    "quality_brier_calibration_split",
    oracle=f"""
    WITH labeled AS (
        SELECT n_chars // {ISO_BIN_CHARS} AS b,
               CASE WHEN len(string_split(text, ' '))
                        > {ISO_TOKEN_THRESHOLD} THEN 1 ELSE 0 END AS y,
               CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_test
        FROM documents
    ),
    train AS (
        SELECT b, count(*) AS nt, SUM(y) AS yt
        FROM labeled WHERE is_test = 0 GROUP BY b
    ),
    test AS (
        SELECT b, count(*) AS n_test, SUM(y) AS y_test
        FROM labeled WHERE is_test = 1 GROUP BY b
    ),
    bins AS (
        SELECT test.b,
               test.n_test, test.y_test,
               CAST(train.yt AS DOUBLE) / train.nt AS f_pred,
               CAST(test.y_test AS DOUBLE) / test.n_test AS obs_rate
        FROM test JOIN train ON train.b = test.b
    ),
    tot AS (
        SELECT SUM(n_test) AS n,
               CAST(SUM(y_test) AS DOUBLE) / SUM(n_test) AS obar
        FROM bins
    ),
    parts AS (
        SELECT
            CAST(SUM(CAST(round(
                n_test * (f_pred - obs_rate) * (f_pred - obs_rate),
                12) AS DECIMAL(28,12))) AS DOUBLE) / t.n AS rel,
            CAST(SUM(CAST(round(
                n_test * (obs_rate - t.obar) * (obs_rate - t.obar),
                12) AS DECIMAL(28,12))) AS DOUBLE) / t.n AS res,
            t.obar * (1.0 - t.obar) AS unc
        FROM bins, tot t GROUP BY t.n, t.obar
    )
    SELECT CAST(bins.b AS BIGINT) AS bin,
           CAST(bins.n_test AS BIGINT) AS n_test,
           bins.f_pred, bins.obs_rate,
           p.rel AS reliability,
           p.res AS resolution,
           p.unc AS uncertainty,
           p.rel - p.res + p.unc AS brier
    FROM bins, parts p
    """,
    tags=("quality", "calibration", "statistics"),
)
def quality_brier_calibration_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brier score with the MURPHY DECOMPOSITION on a train/test
    split: per-bin forecasts f_k are the TRAINING pool's empirical
    rates (the reliability-diagram table — the same length-bin →
    long-document outcome the isotonic op calibrates), evaluated on
    the held-out src0 slice, decomposed as Brier = REL − RES + UNC
    (reliability: how far forecasts sit from observed test rates;
    resolution: how much the bins separate outcomes; uncertainty:
    the base-rate floor ō(1−ō)) — the calibration EVALUATION the
    isotonic op's fit deserves, and exact: every rate is an integer
    ratio, every weighted square is rounded to 12 decimals and
    summed as exact decimals, and the decomposition identity holds
    exactly because forecasts are constant within bins.

    Scale: two conditional-sum groupBys to bin-sized tables (the
    histogram-state convention); everything after runs over the bin
    domain.  Test bins unseen in training drop (no forecast exists) —
    the standard reliability-diagram convention, mirrored on both
    engines."""
    docs = table(spark, sf_dir, "documents")
    labeled = docs.select(
        F.expr(f"n_chars div {ISO_BIN_CHARS}").alias("b"),
        F.when(
            F.size(F.split("text", " ")) > ISO_TOKEN_THRESHOLD,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("y"),
        F.when(F.col("source") == "src0", F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_test"),
    )
    train = (
        labeled.filter(F.col("is_test") == 0)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("nt"), F.sum("y").alias("yt"))
    )
    test = (
        labeled.filter(F.col("is_test") == 1)
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum("y").alias("y_test"),
        )
    )
    bins = test.join(train, "b").select(
        "b",
        "n_test",
        "y_test",
        (F.col("yt").cast("double") / F.col("nt")).alias("f_pred"),
        (F.col("y_test").cast("double") / F.col("n_test")).alias(
            "obs_rate"
        ),
    )
    tot = bins.agg(
        F.sum("n_test").alias("n"),
        (
            F.sum("y_test").cast("double") / F.sum("n_test")
        ).alias("obar"),
    )
    wb = bins.crossJoin(F.broadcast(tot))
    parts = wb.groupBy("n", "obar").agg(
        (
            F.sum(
                F.round(
                    F.col("n_test")
                    * (F.col("f_pred") - F.col("obs_rate"))
                    * (F.col("f_pred") - F.col("obs_rate")),
                    12,
                ).cast("decimal(28,12)")
            ).cast("double")
            / F.col("n")
        ).alias("rel"),
        (
            F.sum(
                F.round(
                    F.col("n_test")
                    * (F.col("obs_rate") - F.col("obar"))
                    * (F.col("obs_rate") - F.col("obar")),
                    12,
                ).cast("decimal(28,12)")
            ).cast("double")
            / F.col("n")
        ).alias("res"),
    ).select(
        "rel",
        "res",
        (F.col("obar") * (F.lit(1.0) - F.col("obar"))).alias("unc"),
    )
    return bins.crossJoin(F.broadcast(parts)).select(
        F.col("b").cast("bigint").alias("bin"),
        F.col("n_test").cast("bigint").alias("n_test"),
        "f_pred",
        "obs_rate",
        F.col("rel").alias("reliability"),
        F.col("res").alias("resolution"),
        F.col("unc").alias("uncertainty"),
        (F.col("rel") - F.col("res") + F.col("unc")).alias("brier"),
    )


# ---------------------------------------------------------------------------
# Capture-recapture population estimate (Chapman)
# ---------------------------------------------------------------------------


@register(
    "quality_capture_recapture_users",
    oracle="""
    WITH w1 AS (
        SELECT DISTINCT user_id FROM events
        WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
    ),
    w2 AS (
        SELECT DISTINCT user_id FROM events
        WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
    ),
    m AS (
        SELECT count(*) AS n_both
        FROM w1 JOIN w2 USING (user_id)
    ),
    c AS (
        SELECT (SELECT count(*) FROM w1) AS n1,
               (SELECT count(*) FROM w2) AS n2,
               (SELECT n_both FROM m) AS m12,
               (SELECT count(DISTINCT user_id) FROM events)
                   AS n_observed
    )
    SELECT CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           CAST(m12 AS BIGINT) AS n_both,
           CAST(n_observed AS BIGINT) AS n_observed,
           (CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m12 + 1) - 1.0
               AS chapman_estimate,
           ((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m12 + 1) - 1.0)
               - n_observed AS est_unseen
    FROM c
    """,
    tags=("quality", "statistics", "population"),
)
def quality_capture_recapture_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Capture-recapture estimate of the TOTAL user population from
    two observation windows (first vs second half of the month) via
    the bias-corrected Chapman estimator
    N̂ = (n₁+1)(n₂+1)/(m+1) − 1 — the mark-recapture method ecology
    uses for fish and an analytics engine uses to answer "how many
    users exist that we have NOT yet seen" (dark-traffic sizing, QA
    of tracking coverage; the Good-Turing unseen-species idea applied
    to identities instead of words).  All four inputs are exact
    distinct-counts; the estimate is one double expression on them,
    identical cross-engine.

    Scale: three distinct aggregations over user_id (map-side partial
    distinct) — the same cost class as the flagship's exact
    countDistinct; windows with many captures generalize to the
    Schnabel multi-sample form, same table shape per sample."""
    ev = table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    w1 = ev.filter(F.col("ts") < cut).select("user_id").distinct()
    w2 = ev.filter(F.col("ts") >= cut).select("user_id").distinct()
    m = w1.join(w2, "user_id").agg(
        F.count(F.lit(1)).alias("m12")
    )
    c = (
        w1.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(w2.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(m)
        .crossJoin(
            ev.agg(
                F.countDistinct("user_id").alias("n_observed")
            )
        )
    )
    chapman = (
        (F.col("n1") + F.lit(1)).cast("double")
        * (F.col("n2") + F.lit(1))
    ) / (F.col("m12") + F.lit(1)) - F.lit(1.0)
    return c.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.col("m12").cast("bigint").alias("n_both"),
        F.col("n_observed").cast("bigint").alias("n_observed"),
        chapman.alias("chapman_estimate"),
        (chapman - F.col("n_observed")).alias("est_unseen"),
    )


# ---------------------------------------------------------------------------
# Exact ROC-AUC via the Mann-Whitney identity
# ---------------------------------------------------------------------------


@register(
    "quality_roc_auc_length_classifier",
    oracle=f"""
    WITH labeled AS (
        SELECT n_chars AS score,
               CASE WHEN len(string_split(text, ' '))
                        > {ISO_TOKEN_THRESHOLD} THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    hist AS (
        SELECT score, SUM(y) AS pos, count(*) - SUM(y) AS neg
        FROM labeled GROUP BY score
    ),
    cum AS (
        SELECT score, pos, neg,
               coalesce(SUM(pos + neg) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS lt_comb
        FROM hist
    ),
    tot AS (
        SELECT SUM(pos) AS n1, SUM(neg) AS n0 FROM hist
    ),
    ranksum AS (
        SELECT SUM(pos * (2 * lt_comb + pos + neg + 1)) AS s2
        FROM cum
    )
    SELECT CAST(t.n1 AS BIGINT) AS n_pos,
           CAST(t.n0 AS BIGINT) AS n_neg,
           CAST(r.s2 AS BIGINT) AS rank_sum_x2,
           CAST(r.s2 - t.n1 * (t.n1 + 1) AS DOUBLE)
               / (2.0 * t.n1 * t.n0) AS auc
    FROM ranksum r, tot t
    """,
    tags=("quality", "calibration", "statistics"),
)
def quality_roc_auc_length_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT ROC-AUC of document length as a classifier for the
    long-document outcome, via the Mann-Whitney identity
    AUC = (R₊ − n₊(n₊+1)/2)/(n₊·n₋) with R₊ the positive class's
    midrank sum — completing the ML-evaluation family (the Brier op
    scores probability CALIBRATION; AUC scores pure RANKING, and the
    identity makes it a rank statistic, not a threshold sweep): using
    DOUBLED midranks (2R = 2·#less + #eq + 1, an integer — the
    Spearman/CvM convention) the whole computation is integer
    arithmetic on the score-distinct histogram with one exclusive
    cumulative window, ties handled exactly, and the final AUC is a
    single division.  No sorted threshold sweep, no trapezoid — the
    rank identity IS the area.

    Scale: histogram-sized state (score-distinct), one cumulative
    window over the score domain — the KS/CvM cost class.  Grouped
    AUCs (per source/model) partition the window by group."""
    docs = table(spark, sf_dir, "documents")
    labeled = docs.select(
        F.col("n_chars").alias("score"),
        F.when(
            F.size(F.split("text", " ")) > ISO_TOKEN_THRESHOLD,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("y"),
    )
    hist = labeled.groupBy("score").agg(
        F.sum("y").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("neg"),
    )
    from pyspark.sql import Window

    prev = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        "pos",
        "neg",
        F.coalesce(
            F.sum(F.col("pos") + F.col("neg")).over(prev), F.lit(0)
        ).alias("lt_comb"),
    )
    tot = hist.agg(
        F.sum("pos").alias("n1"), F.sum("neg").alias("n0")
    )
    ranksum = cum.agg(
        F.sum(
            F.col("pos")
            * (
                F.lit(2) * F.col("lt_comb")
                + F.col("pos")
                + F.col("neg")
                + F.lit(1)
            )
        ).alias("s2")
    )
    return ranksum.crossJoin(F.broadcast(tot)).select(
        F.col("n1").cast("bigint").alias("n_pos"),
        F.col("n0").cast("bigint").alias("n_neg"),
        F.col("s2").cast("bigint").alias("rank_sum_x2"),
        (
            (
                F.col("s2") - F.col("n1") * (F.col("n1") + F.lit(1))
            ).cast("double")
            / (F.lit(2.0) * F.col("n1") * F.col("n0"))
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# K-sample / effect-size completion of the drift family
# ---------------------------------------------------------------------------

#: Shared two-sample (src0 vs each other source) value histogram — the
#: kernel under quality_mannwhitney_drift, quality_cliffs_delta_effect
#: and quality_hodges_lehmann_shift's pair weighting: one row per
#: (source s, distinct value v) with the reference count `a` and the
#: source count `b`.  Histogram-sized, never corpus-sized.
def _ref_vs_source_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("v")
    )
    srcs = (
        x.filter(F.col("source") != "src0")
        .select(F.col("source").alias("s"))
        .distinct()
    )
    ref_hist = (
        x.filter(F.col("source") == "src0")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    src_hist = (
        x.filter(F.col("source") != "src0")
        .groupBy(F.col("source").alias("s"), "v")
        .agg(F.count(F.lit(1)).alias("b"))
    )
    return (
        src_hist.select("s", "v", F.lit(0).cast("bigint").alias("a"), "b")
        .unionByName(
            srcs.crossJoin(F.broadcast(ref_hist)).select(
                "s", "v", "a", F.lit(0).cast("bigint").alias("b")
            )
        )
        .groupBy("s", "v")
        .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
    )


#: Romano et al. magnitude thresholds for |Cliff's delta|.
CLIFFS_NEGLIGIBLE = 0.147
CLIFFS_SMALL = 0.33
CLIFFS_MEDIUM = 0.474


@register(
    "quality_cliffs_delta_effect",
    oracle=f"""
    WITH x AS (SELECT source, n_chars AS v FROM documents),
    srcs AS (SELECT DISTINCT source AS s FROM x WHERE source <> 'src0'),
    ref_hist AS (
        SELECT v, count(*) AS a FROM x WHERE source = 'src0' GROUP BY v
    ),
    src_hist AS (
        SELECT source AS s, v, count(*) AS b
        FROM x WHERE source <> 'src0' GROUP BY 1, 2
    ),
    merged AS (
        SELECT s, v, SUM(a) AS a, SUM(b) AS b FROM (
            SELECT s, v, 0 AS a, b FROM src_hist
            UNION ALL
            SELECT srcs.s, r.v, r.a, 0 AS b FROM srcs CROSS JOIN ref_hist r
        ) GROUP BY 1, 2
    ),
    walked AS (
        SELECT s, a, b,
               COALESCE(SUM(a) OVER (
                   PARTITION BY s ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS a_below,
               COALESCE(SUM(a) OVER (
                   PARTITION BY s ORDER BY v
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
               ), 0) AS a_above
        FROM merged
    ),
    agg AS (
        SELECT s,
               SUM(a) AS na, SUM(b) AS nb,
               SUM(b * a_below) AS n_gt,
               SUM(b * a_above) AS n_lt
        FROM walked GROUP BY s
    )
    SELECT s AS source,
           CAST(na AS BIGINT) AS n_ref,
           CAST(nb AS BIGINT) AS n_src,
           CAST(n_gt AS BIGINT) AS n_gt,
           CAST(n_lt AS BIGINT) AS n_lt,
           (CAST(n_gt AS DOUBLE) - CAST(n_lt AS DOUBLE))
               / (CAST(na AS DOUBLE) * nb) AS delta,
           CASE
               WHEN abs((CAST(n_gt AS DOUBLE) - CAST(n_lt AS DOUBLE))
                        / (CAST(na AS DOUBLE) * nb))
                    < {CLIFFS_NEGLIGIBLE} THEN 'negligible'
               WHEN abs((CAST(n_gt AS DOUBLE) - CAST(n_lt AS DOUBLE))
                        / (CAST(na AS DOUBLE) * nb))
                    < {CLIFFS_SMALL} THEN 'small'
               WHEN abs((CAST(n_gt AS DOUBLE) - CAST(n_lt AS DOUBLE))
                        / (CAST(na AS DOUBLE) * nb))
                    < {CLIFFS_MEDIUM} THEN 'medium'
               ELSE 'large'
           END AS magnitude
    FROM agg
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_cliffs_delta_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cliff's delta effect size per source vs src0 — the companion the
    Mann-Whitney gate needs at corpus scale: with millions of documents
    the U test flags ANY shift as significant, so the pipeline decision
    ("is this source's length distribution PRACTICALLY different?")
    needs a sample-size-free magnitude, delta = (#(x>y) - #(x<y)) /
    (n_a*n_b) in [-1, 1], labeled with the standard Romano thresholds.

    Counting dominant pairs never materializes the n_a*n_b pairs: from
    the shared ref-vs-source value histogram (`_ref_vs_source_hist` —
    the same kernel as the U test), two cumulative windows give, per
    distinct value, how many reference rows sit strictly below and
    strictly above; weighting by the source-side count `b` yields exact
    BIGINT pair counts, and delta is one double division.

    Scale: histogram-sized throughout — groupBy to per-(source, value)
    counts (map-side combined), windows over distinct values per
    source, a per-source scalar aggregate out.  Same bound as the
    KS/U/chi-squared gates."""
    from pyspark.sql import Window

    merged = _ref_vs_source_hist(spark, sf_dir)
    w_below = (
        Window.partitionBy("s")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_above = (
        Window.partitionBy("s")
        .orderBy("v")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    walked = merged.select(
        "s",
        "a",
        "b",
        F.coalesce(F.sum("a").over(w_below), F.lit(0)).alias("a_below"),
        F.coalesce(F.sum("a").over(w_above), F.lit(0)).alias("a_above"),
    )
    agg = walked.groupBy("s").agg(
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
        F.sum(F.col("b") * F.col("a_below")).alias("n_gt"),
        F.sum(F.col("b") * F.col("a_above")).alias("n_lt"),
    )
    delta = (
        F.col("n_gt").cast("double") - F.col("n_lt").cast("double")
    ) / (F.col("na").cast("double") * F.col("nb"))
    magnitude = (
        F.when(F.abs(delta) < CLIFFS_NEGLIGIBLE, F.lit("negligible"))
        .when(F.abs(delta) < CLIFFS_SMALL, F.lit("small"))
        .when(F.abs(delta) < CLIFFS_MEDIUM, F.lit("medium"))
        .otherwise(F.lit("large"))
    )
    return agg.select(
        F.col("s").alias("source"),
        F.col("na").cast("bigint").alias("n_ref"),
        F.col("nb").cast("bigint").alias("n_src"),
        F.col("n_gt").cast("bigint").alias("n_gt"),
        F.col("n_lt").cast("bigint").alias("n_lt"),
        delta.alias("delta"),
        magnitude.alias("magnitude"),
    )


@register(
    "quality_kruskal_wallis_drift",
    oracle=f"""
    WITH hist AS (
        SELECT source, n_chars AS v, count(*) AS c
        FROM documents GROUP BY 1, 2
    ),
    mv AS (SELECT v, SUM(c) AS m FROM hist GROUP BY v),
    cum AS (
        SELECT v, m,
               COALESCE(SUM(m) OVER (
                   ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS sb
        FROM mv
    ),
    per_src AS (
        SELECT h.source,
               SUM(h.c) AS n,
               SUM(h.c * (2 * cum.sb + cum.m + 1)) AS r2
        FROM hist h JOIN cum ON cum.v = h.v
        GROUP BY h.source
    ),
    tie AS (SELECT SUM(m * m * m - m) AS t FROM mv),
    tot AS (
        SELECT SUM(n) AS n,
               count(*) AS k,
               SUM(CAST(round(
                   CAST(r2 AS DOUBLE) * r2 / (4.0 * n), 6
               ) AS DECIMAL(38,6))) AS s
        FROM per_src
    ),
    stat AS (
        SELECT CAST(tot.k AS INT) AS k,
               CAST(tot.n AS BIGINT) AS n,
               12.0 * CAST(tot.s AS DOUBLE)
                   / (CAST(tot.n AS DOUBLE) * (tot.n + 1.0))
                   - 3.0 * (tot.n + 1.0) AS h,
               1.0 - CAST(tie.t AS DOUBLE)
                   / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n)
                   AS tie_c,
               CAST(tot.k - 1 AS INT) AS dof
        FROM tot, tie
    )
    SELECT k, n, h,
           h / tie_c AS h_tie_corrected,
           dof,
           {{crit}} AS critical_005,
           h / tie_c > {{crit}} AS drift
    FROM stat
    """.replace("{crit}", _CHI2_CRIT_SQL),
    tags=("quality", "drift", "statistics"),
)
def quality_kruskal_wallis_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kruskal-Wallis K-sample rank test — the omnibus completion of
    the pairwise Mann-Whitney gate: does ANY of the k sources' length
    distribution sit at a different location, in one test, without k-1
    separate comparisons (and their multiplicity problem)?  H compares
    per-group rank sums against their pooled expectation; under H0 it
    is chi-squared with k-1 dof, so the verdict reuses the literal
    CHI2_CRIT_005 table (+ Wilson-Hilferty beyond dof 30) the
    chi-squared gate established.

    Exactness discipline: doubled midranks (2*below + m + 1) off the
    pooled count-of-counts histogram keep every per-group rank sum an
    exact BIGINT (no corpus sort, no float ranks); each group's
    R2^2/(4n_j) term is rounded to 6 decimals and summed as
    DECIMAL(38,6) so the k-term sum is order-independent; the final
    H chain is one fixed IEEE expression mirrored textually in the
    oracle, tie-corrected by the standard 1 - sum(m^3-m)/(N^3-N).

    Scale: one groupBy to the (source, value) histogram (map-side
    combined), one histogram-sized groupBy(v) for pooled counts, a
    cumulative window over DISTINCT VALUES only, then k-row algebra.
    The pooled-value window is single-partition but value-domain-sized
    (same bound as the KS/ROC-AUC gates), never corpus-sized."""
    from pyspark.sql import Window

    hist = (
        table(spark, sf_dir, "documents")
        .groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    mv = hist.groupBy("v").agg(F.sum("c").alias("m"))
    w_prev = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = mv.select(
        "v",
        "m",
        F.coalesce(F.sum("m").over(w_prev), F.lit(0)).alias("sb"),
    )
    per_src = (
        hist.join(cum, "v")
        .groupBy("source")
        .agg(
            F.sum("c").alias("n"),
            F.sum(
                F.col("c")
                * (2 * F.col("sb") + F.col("m") + 1)
            ).alias("r2"),
        )
    )
    tie = mv.agg(
        F.sum(
            F.col("m") * F.col("m") * F.col("m") - F.col("m")
        ).alias("t")
    )
    tot = per_src.agg(
        F.sum("n").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.round(
                F.col("r2").cast("double") * F.col("r2")
                / (F.lit(4.0) * F.col("n")),
                6,
            ).cast("decimal(38,6)")
        ).alias("s"),
    )
    st = tot.crossJoin(F.broadcast(tie))
    n_d = F.col("n").cast("double")
    h = (
        F.lit(12.0) * F.col("s").cast("double")
        / (n_d * (F.col("n") + F.lit(1.0)))
        - F.lit(3.0) * (F.col("n") + F.lit(1.0))
    )
    tie_c = F.lit(1.0) - F.col("t").cast("double") / (
        n_d * F.col("n") * F.col("n") - F.col("n")
    )
    stat = st.select(
        F.col("k").cast("int").alias("k"),
        F.col("n").cast("bigint").alias("n"),
        h.alias("h"),
        (h / tie_c).alias("h_tie_corrected"),
        (F.col("k") - 1).cast("int").alias("dof"),
    )
    dof_d = F.col("dof").cast("double")
    wh_b = (
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * dof_d)
        + F.lit(_WH_Z095) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof_d))
    )
    crit = dof_d * wh_b * wh_b * wh_b
    for kk, vv in CHI2_CRIT_005.items():
        crit = F.when(F.col("dof") == kk, F.lit(vv)).otherwise(crit)
    return stat.select(
        "k",
        "n",
        "h",
        "h_tie_corrected",
        "dof",
        crit.alias("critical_005"),
        (F.col("h_tie_corrected") > crit).alias("drift"),
    )


@register(
    "quality_welch_ttest_drift",
    oracle=f"""
    WITH moms AS (
        SELECT source,
               count(*) AS n,
               SUM(n_chars) AS s1,
               SUM(n_chars * n_chars) AS s2
        FROM documents GROUP BY source
    ),
    ref AS (SELECT n, s1, s2 FROM moms WHERE source = 'src0'),
    sides AS (
        SELECT m.source,
               ref.n AS na, m.n AS nb,
               CAST(ref.s1 AS DOUBLE) / ref.n AS ma,
               CAST(m.s1 AS DOUBLE) / m.n AS mb,
               (CAST(ref.s2 AS DOUBLE)
                   - CAST(ref.s1 AS DOUBLE) * ref.s1 / ref.n)
                   / (ref.n - 1.0) AS va,
               (CAST(m.s2 AS DOUBLE)
                   - CAST(m.s1 AS DOUBLE) * m.s1 / m.n)
                   / (m.n - 1.0) AS vb
        FROM moms m CROSS JOIN ref
        WHERE m.source <> 'src0'
    ),
    scored AS (
        SELECT source,
               CAST(na AS BIGINT) AS n_ref,
               CAST(nb AS BIGINT) AS n_src,
               ma AS mean_ref, mb AS mean_src,
               (mb - ma) / sqrt(va / na + vb / nb) AS t,
               (va / na + vb / nb) * (va / na + vb / nb)
                   / ((va / na) * (va / na) / (na - 1.0)
                      + (vb / nb) * (vb / nb) / (nb - 1.0)) AS dof_welch
        FROM sides
    )
    SELECT source, n_ref, n_src, mean_ref, mean_src, t, dof_welch,
           abs(t) > {MWU_Z_CRIT_005} AS drift
    FROM scored
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_welch_ttest_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Welch's unequal-variance t-test per source vs src0 — the
    parametric member of the location-drift trio (U test: rank-robust;
    Cliff's delta: magnitude; Welch: the classic mean comparison that
    does NOT assume equal variances, the failure mode of the pooled
    t-test when one source is much noisier than the reference).
    Welch-Satterthwaite approximates the dof; at corpus sample sizes
    the t is effectively normal, so the verdict uses the same z
    critical value as the U gate (documented large-sample reading).

    Exactness: n_chars is integral, so each side reduces to three
    exact BIGINT moments (n, sum, sum of squares) in ONE map-side
    combined groupBy; every downstream quantity is a fixed IEEE chain
    over those integers, mirrored textually in the oracle.

    Scale: one scan -> per-source moment rows (k rows), broadcast the
    1-row reference, k-row algebra out.  Nothing corpus-sized leaves
    the first aggregate."""
    moms = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("s1"),
            F.sum(F.col("n_chars") * F.col("n_chars")).alias("s2"),
        )
    )
    ref = (
        moms.filter(F.col("source") == "src0")
        .select(
            F.col("n").alias("na_"),
            F.col("s1").alias("ra1"),
            F.col("s2").alias("ra2"),
        )
    )
    sides = (
        moms.filter(F.col("source") != "src0")
        .crossJoin(F.broadcast(ref))
        .select(
            "source",
            F.col("na_").alias("na"),
            F.col("n").alias("nb"),
            (F.col("ra1").cast("double") / F.col("na_")).alias("ma"),
            (F.col("s1").cast("double") / F.col("n")).alias("mb"),
            (
                (
                    F.col("ra2").cast("double")
                    - F.col("ra1").cast("double")
                    * F.col("ra1")
                    / F.col("na_")
                )
                / (F.col("na_") - F.lit(1.0))
            ).alias("va"),
            (
                (
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double") * F.col("s1") / F.col("n")
                )
                / (F.col("n") - F.lit(1.0))
            ).alias("vb"),
        )
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    t = (F.col("mb") - F.col("ma")) / F.sqrt(se2)
    dof_w = (se2 * se2) / (
        (F.col("va") / F.col("na"))
        * (F.col("va") / F.col("na"))
        / (F.col("na") - F.lit(1.0))
        + (F.col("vb") / F.col("nb"))
        * (F.col("vb") / F.col("nb"))
        / (F.col("nb") - F.lit(1.0))
    )
    return sides.select(
        "source",
        F.col("na").cast("bigint").alias("n_ref"),
        F.col("nb").cast("bigint").alias("n_src"),
        F.col("ma").alias("mean_ref"),
        F.col("mb").alias("mean_src"),
        t.alias("t"),
        dof_w.alias("dof_welch"),
        (F.abs(t) > MWU_Z_CRIT_005).alias("drift"),
    )


@register(
    "quality_expected_calibration_error",
    oracle=f"""
    WITH labeled AS (
        SELECT n_chars // {ISO_BIN_CHARS} AS b,
               CASE WHEN len(string_split(text, ' '))
                        > {ISO_TOKEN_THRESHOLD} THEN 1 ELSE 0 END AS y,
               CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_test
        FROM documents
    ),
    train AS (
        SELECT b, count(*) AS nt, SUM(y) AS yt
        FROM labeled WHERE is_test = 0 GROUP BY b
    ),
    test AS (
        SELECT b, count(*) AS n_test, SUM(y) AS y_test
        FROM labeled WHERE is_test = 1 GROUP BY b
    ),
    bins AS (
        SELECT test.b,
               test.n_test,
               CAST(train.yt AS DOUBLE) / train.nt AS f_pred,
               CAST(test.y_test AS DOUBLE) / test.n_test AS obs_rate
        FROM test JOIN train ON train.b = test.b
    ),
    tot AS (SELECT SUM(n_test) AS n FROM bins),
    g AS (
        SELECT CAST(SUM(CAST(round(
                   n_test * abs(f_pred - obs_rate), 12)
               AS DECIMAL(28,12))) AS DOUBLE) / t.n AS ece,
               max(abs(f_pred - obs_rate)) AS mce
        FROM bins, tot t GROUP BY t.n
    )
    SELECT CAST(bins.b AS BIGINT) AS bin,
           CAST(bins.n_test AS BIGINT) AS n_test,
           bins.f_pred, bins.obs_rate,
           abs(bins.f_pred - bins.obs_rate) AS abs_gap,
           g.ece, g.mce
    FROM bins, g
    """,
    tags=("quality", "calibration", "statistics"),
)
def quality_expected_calibration_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Expected / maximum calibration error on the same train/test
    reliability table as the Brier decomposition: ECE is the
    bin-weighted mean |forecast - observed| (the single calibration
    number model cards quote), MCE the worst bin — together the
    L1/L-inf companions to Brier's quadratic view, and the gate a
    quality-classifier pipeline alarms on when its score drifts from
    reality.  Same forecasts (training pool's empirical rates per
    ISO_BIN_CHARS length bin), same held-out src0 evaluation, so the
    three calibration ops triangulate one reliability diagram.

    Exactness: every rate is an integer ratio; per-bin weighted gaps
    quantize to round-12 DECIMAL before the order-independent sum;
    MCE is a max over exact doubles — no float accumulation anywhere.

    Scale: identical to the Brier op — two conditional-sum groupBys
    to bin-sized tables, then bin-domain algebra only."""
    docs = table(spark, sf_dir, "documents")
    labeled = docs.select(
        F.expr(f"n_chars div {ISO_BIN_CHARS}").alias("b"),
        F.when(
            F.size(F.split("text", " ")) > ISO_TOKEN_THRESHOLD,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("y"),
        F.when(F.col("source") == "src0", F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_test"),
    )
    train = (
        labeled.filter(F.col("is_test") == 0)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("nt"), F.sum("y").alias("yt"))
    )
    test = (
        labeled.filter(F.col("is_test") == 1)
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum("y").alias("y_test"),
        )
    )
    bins = test.join(train, "b").select(
        "b",
        "n_test",
        (F.col("yt").cast("double") / F.col("nt")).alias("f_pred"),
        (F.col("y_test").cast("double") / F.col("n_test")).alias(
            "obs_rate"
        ),
    )
    gap = F.abs(F.col("f_pred") - F.col("obs_rate"))
    g = bins.agg(
        (
            F.sum(
                F.round(F.col("n_test") * gap, 12).cast(
                    "decimal(28,12)"
                )
            ).cast("double")
            / F.sum("n_test")
        ).alias("ece"),
        F.max(gap).alias("mce"),
    )
    return bins.crossJoin(F.broadcast(g)).select(
        F.col("b").cast("bigint").alias("bin"),
        F.col("n_test").cast("bigint").alias("n_test"),
        "f_pred",
        "obs_rate",
        gap.alias("abs_gap"),
        "ece",
        "mce",
    )


#: Asymptotic 5% upper-tail point of the two-sample Anderson-Darling
#: null distribution (Pettitt 1976, Table 1).  A literal, like the
#: KS/CvM gates, so both engines compare against the identical double.
AD2_CRIT_005 = 2.492


@register(
    "quality_anderson_darling_drift",
    oracle=f"""
    WITH x AS (SELECT source, n_chars AS v FROM documents),
    srcs AS (SELECT DISTINCT source AS s FROM x WHERE source <> 'src0'),
    ref_hist AS (
        SELECT v, count(*) AS a FROM x WHERE source = 'src0' GROUP BY v
    ),
    src_hist AS (
        SELECT source AS s, v, count(*) AS b
        FROM x WHERE source <> 'src0' GROUP BY 1, 2
    ),
    merged AS (
        SELECT s, v, SUM(a) AS a, SUM(b) AS b FROM (
            SELECT s, v, 0 AS a, b FROM src_hist
            UNION ALL
            SELECT srcs.s, r.v, r.a, 0 AS b FROM srcs CROSS JOIN ref_hist r
        ) GROUP BY 1, 2
    ),
    tot AS (SELECT s, SUM(a) AS na, SUM(b) AS nb FROM merged GROUP BY s),
    walked AS (
        SELECT m.s, m.a, m.b, t.na, t.nb, t.na + t.nb AS nn,
               m.a + m.b AS l,
               SUM(m.a) OVER (PARTITION BY m.s ORDER BY m.v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS ca,
               SUM(m.a + m.b) OVER (PARTITION BY m.s ORDER BY m.v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS cc
        FROM merged m JOIN tot t ON t.s = m.s
    ),
    terms AS (
        SELECT s, na, nb,
               round(CAST(l AS DOUBLE)
                     * (ca * nn - cc * na) * (ca * nn - cc * na)
                     / (CAST(cc AS DOUBLE) * (nn - cc)), 6) AS term
        FROM walked WHERE cc < nn
    ),
    agg AS (
        SELECT s, CAST(any_value(na) AS BIGINT) AS n_ref,
               CAST(any_value(nb) AS BIGINT) AS n_src,
               SUM(CAST(term AS DECIMAL(38,6))) AS num
        FROM terms GROUP BY s
    )
    SELECT s AS source, n_ref, n_src,
           CAST(num AS DOUBLE)
               / (CAST(n_ref AS DOUBLE) * n_src) AS a2,
           CAST(num AS DOUBLE)
               / (CAST(n_ref AS DOUBLE) * n_src) > {AD2_CRIT_005} AS drift
    FROM agg
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_anderson_darling_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-sample Anderson-Darling drift gate per source vs src0 — the
    tail-sensitive completion of the quadratic-EDF family: KS reads the
    single largest ECDF gap, CvM integrates the squared gap uniformly,
    and AD re-weights the same integral by 1/(H(1-H)) so discrepancies
    in the distribution TAILS (exactly where corpus length pathologies
    live — truncation, boilerplate floods) count most.  Pettitt's
    two-sample form A2 = (1/(na*nb)) * sum_i (MA_i*N - i*na)^2/(i*(N-i))
    evaluated over pooled DISTINCT values with tie weight l_j (each
    distinct value contributes its pooled multiplicity at the
    right-continuous ECDF step), gated at the asymptotic 5% point
    {AD2_CRIT_005}.

    Exactness: MA, C, l and the inner difference (CA*N - C*na) are
    exact BIGINTs off the shared ref-vs-source histogram
    (`_ref_vs_source_hist`); each value's term is ONE fixed IEEE
    double chain (l * diff * diff / (C * (N - C))) mirrored textually
    in the oracle, rounded to 6 decimals and summed as DECIMAL(38,6)
    so the sum is order-independent; the final /(na*nb) is one more
    mirrored division.

    Scale: identical bound to the KS/CvM/U gates — one groupBy to the
    per-(source, value) histogram with map-side combine, cumulative
    windows over distinct values per source, a per-source scalar
    aggregate out.  Nothing corpus-sized ever sorts or shuffles."""
    from pyspark.sql import Window

    merged = _ref_vs_source_hist(spark, sf_dir)
    tot = merged.groupBy("s").agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    w_cum = (
        Window.partitionBy("s")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = (
        merged.join(tot, "s")
        .select(
            "s",
            "na",
            "nb",
            (F.col("na") + F.col("nb")).alias("nn"),
            (F.col("a") + F.col("b")).alias("l"),
            F.sum("a").over(w_cum).alias("ca"),
            F.sum(F.col("a") + F.col("b")).over(w_cum).alias("cc"),
        )
    )
    diff = F.col("ca") * F.col("nn") - F.col("cc") * F.col("na")
    term = F.round(
        F.col("l").cast("double")
        * diff
        * diff
        / (F.col("cc").cast("double") * (F.col("nn") - F.col("cc"))),
        6,
    )
    agg = (
        walked.filter(F.col("cc") < F.col("nn"))
        .select("s", "na", "nb", term.alias("term"))
        .groupBy("s")
        .agg(
            F.any_value("na").cast("bigint").alias("n_ref"),
            F.any_value("nb").cast("bigint").alias("n_src"),
            F.sum(F.col("term").cast("decimal(38,6)")).alias("num"),
        )
    )
    a2 = F.col("num").cast("double") / (
        F.col("n_ref").cast("double") * F.col("n_src")
    )
    return agg.select(
        F.col("s").alias("source"),
        "n_ref",
        "n_src",
        a2.alias("a2"),
        (a2 > F.lit(AD2_CRIT_005)).alias("drift"),
    )


@register(
    "quality_hellinger_tv_drift",
    oracle="""
    WITH x AS (SELECT source, n_chars AS v FROM documents),
    srcs AS (SELECT DISTINCT source AS s FROM x WHERE source <> 'src0'),
    ref_hist AS (
        SELECT v, count(*) AS a FROM x WHERE source = 'src0' GROUP BY v
    ),
    src_hist AS (
        SELECT source AS s, v, count(*) AS b
        FROM x WHERE source <> 'src0' GROUP BY 1, 2
    ),
    merged AS (
        SELECT s, v, SUM(a) AS a, SUM(b) AS b FROM (
            SELECT s, v, 0 AS a, b FROM src_hist
            UNION ALL
            SELECT srcs.s, r.v, r.a, 0 AS b FROM srcs CROSS JOIN ref_hist r
        ) GROUP BY 1, 2
    ),
    tot AS (SELECT s, SUM(a) AS na, SUM(b) AS nb FROM merged GROUP BY s),
    terms AS (
        SELECT m.s, t.na, t.nb,
               round(sqrt((CAST(m.a AS DOUBLE) / t.na)
                          * (CAST(m.b AS DOUBLE) / t.nb)), 6) AS bc_term,
               round(abs(CAST(m.a AS DOUBLE) / t.na
                         - CAST(m.b AS DOUBLE) / t.nb), 6) AS tv_term
        FROM merged m JOIN tot t ON t.s = m.s
    ),
    agg AS (
        SELECT s, CAST(any_value(na) AS BIGINT) AS n_ref,
               CAST(any_value(nb) AS BIGINT) AS n_src,
               SUM(CAST(bc_term AS DECIMAL(38,6))) AS bc,
               SUM(CAST(tv_term AS DECIMAL(38,6))) AS tv2
        FROM terms GROUP BY s
    )
    SELECT s AS source, n_ref, n_src,
           CAST(bc AS DOUBLE) AS bhattacharyya,
           sqrt(greatest(0.0, 1.0 - CAST(bc AS DOUBLE))) AS hellinger,
           CAST(tv2 AS DOUBLE) / 2.0 AS tv_distance
    FROM agg
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_hellinger_tv_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hellinger distance + total-variation distance per source vs
    src0 over the document-length histogram — the bounded METRIC
    companions of the hypothesis-test gates: KS/CvM/AD answer "is this
    shift statistically real?", these answer "how FAR apart are the
    distributions on a [0,1] scale that doesn't grow with sample
    size", which is what a pipeline dashboard trends over time.
    Bhattacharyya coefficient BC = sum_v sqrt(p_v*q_v), Hellinger
    H = sqrt(1-BC), TV = (1/2) sum_v |p_v - q_v| (the largest possible
    probability disagreement over any event).

    Exactness: p and q are single double divisions off exact BIGINT
    histogram counts; sqrt and abs are IEEE correctly-rounded, so each
    term is deterministic; terms are rounded to 6 decimals and summed
    as DECIMAL(38,6) (order-independent); `greatest(0, 1-BC)` guards
    the one place accumulated upward rounding could push BC past 1 on
    identical distributions before the final sqrt.

    Scale: the shared ref-vs-source histogram kernel — one map-side
    combined groupBy, histogram-sized algebra, a per-source scalar row
    out."""
    merged = _ref_vs_source_hist(spark, sf_dir)
    tot = merged.groupBy("s").agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    t = merged.join(tot, "s")
    p = F.col("a").cast("double") / F.col("na")
    q = F.col("b").cast("double") / F.col("nb")
    terms = t.select(
        "s",
        "na",
        "nb",
        F.round(F.sqrt(p * q), 6).alias("bc_term"),
        F.round(F.abs(p - q), 6).alias("tv_term"),
    )
    agg = terms.groupBy("s").agg(
        F.any_value("na").cast("bigint").alias("n_ref"),
        F.any_value("nb").cast("bigint").alias("n_src"),
        F.sum(F.col("bc_term").cast("decimal(38,6)")).alias("bc"),
        F.sum(F.col("tv_term").cast("decimal(38,6)")).alias("tv2"),
    )
    bc_d = F.col("bc").cast("double")
    return agg.select(
        F.col("s").alias("source"),
        "n_ref",
        "n_src",
        bc_d.alias("bhattacharyya"),
        F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - bc_d)).alias(
            "hellinger"
        ),
        (F.col("tv2").cast("double") / F.lit(2.0)).alias("tv_distance"),
    )


@register(
    "quality_friedman_daily_mix",
    oracle=f"""
    WITH counted AS (
        SELECT CAST(ts AS DATE) AS d, event_type AS t, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT d FROM counted),
    types AS (SELECT DISTINCT t FROM counted),
    grid AS (
        SELECT days.d, types.t, COALESCE(c.c, 0) AS c
        FROM days CROSS JOIN types
        LEFT JOIN counted c ON c.d = days.d AND c.t = types.t
    ),
    ranked AS (
        SELECT d, t, c,
               2 * (RANK() OVER (PARTITION BY d ORDER BY c) - 1)
               + COUNT(*) OVER (PARTITION BY d, c) + 1 AS r2
        FROM grid
    ),
    per_t AS (SELECT t, SUM(r2) AS r2sum FROM ranked GROUP BY t),
    consts AS (
        SELECT COUNT(DISTINCT d) AS b, COUNT(DISTINCT t) AS k,
               SUM(r2 * r2) AS a4
        FROM ranked
    ),
    stat AS (
        SELECT c.b, c.k,
               SUM((p.r2sum - c.b * (c.k + 1))
                   * (p.r2sum - c.b * (c.k + 1))) AS num,
               any_value(c.a4) - c.b * c.k * (c.k + 1) * (c.k + 1)
                   AS den
        FROM per_t p CROSS JOIN consts c
        GROUP BY c.b, c.k
    ),
    q AS (
        SELECT CAST(b AS BIGINT) AS n_blocks, CAST(k AS INT) AS k,
               (k - 1) * CAST(num AS DOUBLE) / NULLIF(den, 0) AS q_stat,
               CAST(k - 1 AS INT) AS dof
        FROM stat
    )
    SELECT n_blocks, k, q_stat, dof,
           {{crit}} AS critical_005,
           q_stat > {{crit}} AS drift
    FROM q
    """.replace("{crit}", _CHI2_CRIT_SQL),
    tags=("quality", "drift", "statistics"),
)
def quality_friedman_daily_mix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Friedman test on the daily event-type mix — the BLOCKED
    k-sample rank test the Kruskal-Wallis gate cannot replace: KW
    pools all rows and asks whether any group's location differs
    overall, while Friedman ranks the k event types WITHIN each day
    (each day is a block, removing day-to-day volume swings entirely)
    and asks whether the daily ordering of types is stable.  A type
    that quietly climbs the within-day ranking — even while total
    volume doubles — fires here and nowhere else.

    Statistic (tie-corrected, doubled-rank form): with r2 = 2*rank
    midranks (2*(rank-1) + #tied + 1, exact BIGINT per cell on the
    zero-filled day x type grid), Q = (k-1) * sum_j (R2_j - b(k+1))^2
    / (sum r2^2 - b*k*(k+1)^2).  Numerator and denominator are exact
    BIGINTs — the ONLY float operation is the final division — and
    under H0 Q is chi-squared with k-1 dof, so the verdict reuses the
    literal CHI2_CRIT_005 table + Wilson-Hilferty fallback.

    Scale: one groupBy(day, type) with map-side combine to a
    b*k-cell grid (days x types — calendar-sized, never event-sized),
    rank windows over k-row blocks, then k-row algebra."""
    from pyspark.sql import Window

    counted = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.col("ts").cast("date").alias("d"),
            F.col("event_type").alias("t"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    days = counted.select("d").distinct()
    types = counted.select("t").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(counted, ["d", "t"], "left")
        .select("d", "t", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    w_rank = Window.partitionBy("d").orderBy("c")
    w_eq = Window.partitionBy("d", "c")
    ranked = grid.select(
        "d",
        "t",
        (
            2 * (F.rank().over(w_rank) - 1)
            + F.count(F.lit(1)).over(w_eq)
            + 1
        ).alias("r2"),
    )
    per_t = ranked.groupBy("t").agg(F.sum("r2").alias("r2sum"))
    consts = ranked.agg(
        F.count_distinct(F.col("d")).alias("b"),
        F.count_distinct(F.col("t")).alias("k"),
        F.sum(F.col("r2") * F.col("r2")).alias("a4"),
    )
    joined = per_t.crossJoin(F.broadcast(consts))
    dev = F.col("r2sum") - F.col("b") * (F.col("k") + 1)
    stat = joined.groupBy("b", "k").agg(
        F.sum(dev * dev).alias("num"),
        (
            F.any_value("a4")
            - F.col("b") * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1)
        ).alias("den"),
    )
    q_stat = (
        (F.col("k") - 1)
        * F.col("num").cast("double")
        / F.nullif(F.col("den"), F.lit(0))
    )
    q = stat.select(
        F.col("b").cast("bigint").alias("n_blocks"),
        F.col("k").cast("int").alias("k"),
        q_stat.alias("q_stat"),
        (F.col("k") - 1).cast("int").alias("dof"),
    )
    dof_d = F.col("dof").cast("double")
    wh_b = (
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * dof_d)
        + F.lit(_WH_Z095) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof_d))
    )
    crit = dof_d * wh_b * wh_b * wh_b
    for kk, vv in CHI2_CRIT_005.items():
        crit = F.when(F.col("dof") == kk, F.lit(vv)).otherwise(crit)
    return q.select(
        "n_blocks",
        "k",
        "q_stat",
        "dof",
        crit.alias("critical_005"),
        (F.col("q_stat") > crit).alias("drift"),
    )


@register(
    "quality_cochran_armitage_trend",
    oracle=f"""
    WITH rows_t AS (
        SELECT n_chars // {KANON_BUCKET_CHARS} AS w,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    bins AS (
        SELECT w, count(*) AS n, SUM(y) AS r
        FROM rows_t GROUP BY w
    ),
    s AS (
        SELECT SUM(n) AS nn, SUM(r) AS rr, count(*) AS n_bins,
               SUM(w * r) AS a, SUM(w * n) AS b,
               SUM(w * w * n) AS c
        FROM bins
    ),
    stat AS (
        SELECT CAST(nn AS BIGINT) AS n,
               CAST(rr AS BIGINT) AS n_positive,
               CAST(n_bins AS BIGINT) AS n_bins,
               CAST(nn * a - rr * b AS BIGINT) AS t_prime,
               CAST(nn * a - rr * b AS DOUBLE)
                   / sqrt(CAST(rr * (nn - rr) AS DOUBLE)
                          * (nn * c - b * b) / nn) AS z
        FROM s
    )
    SELECT n, n_positive, n_bins, t_prime, z,
           abs(z) > {Z_CRIT_005} AS trend_005
    FROM stat
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_cochran_armitage_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cochran-Armitage trend test: does the proportion of English
    documents drift MONOTONICALLY across ordered length bins?  The
    chi-squared gate treats categories as unordered and needs a large
    scattered deviation to fire; Cochran-Armitage weights each bin by
    its ordinal score, so a steady composition SLOPE across document
    sizes — the classic symptom of one crawler feeding long docs from
    a different language mix — is detected with full power in one
    statistic.  Scores w = the bin index itself (n_chars div
    {KANON_BUCKET_CHARS}, the k-anonymity op's bucket convention).

    Statistic (integer-exact form): with per-bin (n_i, r_i) and
    A = sum w r, B = sum w n, C = sum w^2 n, the centered numerator
    T' = N*A - R*B is an exact BIGINT; Var(T') = R(N-R)(N*C - B^2)/N
    where N*C - B^2 is an exact BIGINT and the product/final divide
    are one mirrored IEEE chain; z = T'/sqrt(Var) is asymptotically
    standard normal (two-sided gate at the shared Z_CRIT literal).

    Scale: one map-side-combined groupBy to the length-bin table,
    then ONE aggregate of five integer moments — the chi-squared
    gate's cost class exactly."""
    rows_t = table(spark, sf_dir, "documents").select(
        F.expr(f"n_chars div {KANON_BUCKET_CHARS}").alias("w"),
        (F.col("lang") == "en").cast("bigint").alias("y"),
    )
    bins = rows_t.groupBy("w").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("r")
    )
    s = bins.agg(
        F.sum("n").alias("nn"),
        F.sum("r").alias("rr"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(F.col("w") * F.col("r")).alias("a"),
        F.sum(F.col("w") * F.col("n")).alias("b"),
        F.sum(F.col("w") * F.col("w") * F.col("n")).alias("c"),
    )
    t_prime = F.col("nn") * F.col("a") - F.col("rr") * F.col("b")
    z = t_prime.cast("double") / F.sqrt(
        (F.col("rr") * (F.col("nn") - F.col("rr"))).cast("double")
        * (F.col("nn") * F.col("c") - F.col("b") * F.col("b"))
        / F.col("nn")
    )
    return s.select(
        F.col("nn").cast("bigint").alias("n"),
        F.col("rr").cast("bigint").alias("n_positive"),
        F.col("n_bins").cast("bigint").alias("n_bins"),
        t_prime.cast("bigint").alias("t_prime"),
        z.alias("z"),
        (F.abs(z) > F.lit(Z_CRIT_005)).alias("trend_005"),
    )


@register(
    "quality_anova_f_drift",
    oracle=f"""
    WITH g AS (
        SELECT source, count(*) AS n,
               SUM(n_chars) AS s, SUM(n_chars * n_chars) AS s2
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT SUM(n) AS nn, SUM(s) AS ss, SUM(s2) AS ss2,
               count(*) AS k,
               SUM(CAST(round(CAST(s AS DOUBLE) * s / n, 6)
                   AS DECIMAL(38,6))) AS sgs
        FROM g
    ),
    stat AS (
        SELECT CAST(nn AS BIGINT) AS n,
               CAST(k AS INT) AS k,
               CAST(sgs AS DOUBLE)
                   - CAST(ss AS DOUBLE) * ss / nn AS ssb,
               CAST(ss2 AS DOUBLE) - CAST(sgs AS DOUBLE) AS ssw,
               CAST(k - 1 AS INT) AS dof_between,
               CAST(nn - k AS BIGINT) AS dof_within
        FROM tot
    ),
    f AS (
        SELECT n, k, ssb, ssw, dof_between, dof_within,
               (ssb / dof_between) / (ssw / dof_within) AS f_stat
        FROM stat
    ),
    q AS (
        SELECT *, CAST(dof_between AS INT) AS dof,
               dof_between * f_stat AS chi2_approx
        FROM f
    )
    SELECT n, k, ssb, ssw, dof_between, dof_within, f_stat,
           chi2_approx,
           {{crit}} AS critical_005,
           chi2_approx > {{crit}} AS drift
    FROM q
    """.replace("{crit}", _CHI2_CRIT_SQL),
    tags=("quality", "drift", "statistics"),
)
def quality_anova_f_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-way ANOVA F omnibus on document length across sources —
    the MEANS companion of the rank-based Kruskal-Wallis gate (KW
    detects any location shift distribution-free; F is the classical
    equal-means test whose between/within sum-of-squares decomposition
    also READS as 'how much of the length variance is explained by
    source' — eta^2 = SSB/(SSB+SSW) falls straight out of the output).
    Verdict via the large-N chi-squared limit (k-1)*F -> chi2_(k-1)
    (with dof_within in the hundreds of thousands the F and chi2
    critical points agree to three decimals), reusing the literal
    CHI2_CRIT_005 table + Wilson-Hilferty fallback — the same
    asymptotic convention as every other gate.

    Exactness: per-group (n, sum x, sum x^2) are exact BIGINTs
    (n_chars is integer); each group's S^2/n term rounds to 6
    decimals into a DECIMAL(38,6) sum (order-independent); SSB, SSW,
    and F are one mirrored IEEE chain.

    Scale: ONE map-side-combined groupBy(source) to a k-row moment
    table, then k-row algebra — the cheapest possible omnibus; the
    KW gate costs a value-histogram more."""
    g = table(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("s2"),
    )
    tot = g.agg(
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("s2").alias("ss2"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.round(
                F.col("s").cast("double") * F.col("s") / F.col("n"), 6
            ).cast("decimal(38,6)")
        ).alias("sgs"),
    )
    ssb = F.col("sgs").cast("double") - F.col("ss").cast(
        "double"
    ) * F.col("ss") / F.col("nn")
    ssw = F.col("ss2").cast("double") - F.col("sgs").cast("double")
    stat = tot.select(
        F.col("nn").cast("bigint").alias("n"),
        F.col("k").cast("int").alias("k"),
        ssb.alias("ssb"),
        ssw.alias("ssw"),
        (F.col("k") - 1).cast("int").alias("dof_between"),
        (F.col("nn") - F.col("k")).cast("bigint").alias("dof_within"),
    )
    f_stat = (F.col("ssb") / F.col("dof_between")) / (
        F.col("ssw") / F.col("dof_within")
    )
    q = stat.select(
        "*",
        f_stat.alias("f_stat"),
        F.col("dof_between").alias("dof"),
        (F.col("dof_between") * f_stat).alias("chi2_approx"),
    )
    dof_d = F.col("dof").cast("double")
    wh_b = (
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * dof_d)
        + F.lit(_WH_Z095) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof_d))
    )
    crit = dof_d * wh_b * wh_b * wh_b
    for kk, vv in CHI2_CRIT_005.items():
        crit = F.when(F.col("dof") == kk, F.lit(vv)).otherwise(crit)
    return q.select(
        "n",
        "k",
        "ssb",
        "ssw",
        "dof_between",
        "dof_within",
        "f_stat",
        "chi2_approx",
        crit.alias("critical_005"),
        (F.col("chi2_approx") > crit).alias("drift"),
    )


#: ln(2) literal — the entropy-l-diversity gate at l = 2, read in log
#: space so neither engine calls exp (the round-ln convention).
LN2_LITERAL = 0.6931471805599453


@register(
    "quality_l_diversity_audit",
    oracle=f"""
    WITH cells AS (
        SELECT lang, n_chars // {KANON_BUCKET_CHARS} AS len_bucket,
               source, count(*) AS c
        FROM documents GROUP BY 1, 2, 3
    ),
    groups AS (
        SELECT lang, len_bucket,
               SUM(c) AS k,
               count(*) AS l_distinct,
               SUM(CAST(round(c * ln(c), 12) AS DECIMAL(38,12))) AS s
        FROM cells GROUP BY 1, 2
    ),
    scored AS (
        SELECT *,
               round(ln(CAST(k AS DOUBLE)), 12)
                   - CAST(s AS DOUBLE) / k AS h
        FROM groups
    )
    SELECT CASE WHEN l_distinct = 1 THEN 'l=1 leak'
                WHEN l_distinct = 2 THEN 'l=2'
                ELSE 'l>=3' END AS band,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           CAST(min(l_distinct) AS BIGINT) AS min_l,
           CAST(SUM(CASE WHEN h < {LN2_LITERAL} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_entropy_below_l2
    FROM scored
    GROUP BY 1
    """,
    tags=("quality", "privacy"),
)
def quality_l_diversity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """l-diversity audit — the attribute-disclosure half of the
    privacy pair (the k-anonymity op bounds RE-IDENTIFICATION; this
    bounds what an attacker LEARNS once they pin the group: a QI group
    that is 50-anonymous but single-source still discloses everyone's
    source).  Quasi-identifiers (lang, length bucket — same
    {KANON_BUCKET_CHARS}-char convention), sensitive attribute =
    source.  Per group: distinct-l (how many sensitive values appear)
    and entropy l-diversity, read in LOG space — H >= ln(l) iff
    entropy-l >= l — against the ln(2) literal, so no engine calls
    exp (Machanavajjhala et al. 2007's both definitions).  Output is
    the release-gate band histogram: every group in the 'l=1 leak'
    band discloses its members' source outright.

    Exactness: H = ln(k) - (1/k) sum c ln c with every ln rounded to
    12 decimals before use and the c*ln(c) terms summed as
    DECIMAL(38,12) — the round-ln convention; all counts are exact
    BIGINTs off one groupBy.

    Scale: one map-side-combined groupBy over (QI, sensitive) cells
    (bounded by the attribute-domain product), one groupBy to QI
    groups, a 3-row band aggregate — corpus-size-independent state."""
    d = table(spark, sf_dir, "documents")
    cells = d.groupBy(
        "lang",
        F.expr(f"n_chars div {KANON_BUCKET_CHARS}").alias("len_bucket"),
        "source",
    ).agg(F.count(F.lit(1)).alias("c"))
    groups = cells.groupBy("lang", "len_bucket").agg(
        F.sum("c").alias("k"),
        F.count(F.lit(1)).alias("l_distinct"),
        F.sum(
            F.round(F.col("c") * F.log(F.col("c")), 12).cast(
                "decimal(38,12)"
            )
        ).alias("s"),
    )
    h = F.round(F.log(F.col("k").cast("double")), 12) - F.col(
        "s"
    ).cast("double") / F.col("k")
    scored = groups.select("k", "l_distinct", h.alias("h"))
    band = (
        F.when(F.col("l_distinct") == 1, F.lit("l=1 leak"))
        .when(F.col("l_distinct") == 2, F.lit("l=2"))
        .otherwise(F.lit("l>=3"))
    )
    return scored.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("k").cast("bigint").alias("n_rows"),
        F.min("l_distinct").cast("bigint").alias("min_l"),
        F.sum((F.col("h") < F.lit(LN2_LITERAL)).cast("int"))
        .cast("bigint")
        .alias("n_entropy_below_l2"),
    )


#: z_{0.80} — the 80%-power point of the standard normal (literal, so
#: both engines compute the identical MDE).
Z_POWER_080 = 0.8416212335729143


@register(
    "quality_ab_minimum_detectable_effect",
    oracle=f"""
    WITH e AS (
        SELECT user_id % 2 AS variant,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        FROM events
    ),
    agg AS (
        SELECT
            SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
            SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS conv_a,
            SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
            SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS conv_b
        FROM e
    ),
    p AS (
        SELECT *,
               CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS p_pool
        FROM agg
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           p_pool,
           CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                ELSE ({Z_CRIT_005} + {Z_POWER_080})
                     * sqrt(p_pool * (1.0 - p_pool)
                            * (1.0 / n_a + 1.0 / n_b))
           END AS mde_abs,
           CASE WHEN n_a = 0 OR n_b = 0 OR p_pool = 0 THEN NULL
                ELSE ({Z_CRIT_005} + {Z_POWER_080})
                     * sqrt(p_pool * (1.0 - p_pool)
                            * (1.0 / n_a + 1.0 / n_b)) / p_pool
           END AS mde_rel
    FROM p
    """,
    tags=("quality", "statistics", "abtest"),
)
def quality_ab_minimum_detectable_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Minimum detectable effect for the A/B conversion test — the
    POWER half the z-test family is incomplete without: a
    non-significant quality_two_proportion_ztest result means nothing
    until you know what effect the sample COULD have detected.  MDE
    at alpha = 0.05 (two-sided) and 80% power is
    (z_alpha/2 + z_0.80) * sqrt(p(1-p)(1/n_a + 1/n_b)) on the pooled
    rate — the number an experimentation pipeline compares against
    the business-relevant effect size before declaring 'no
    difference', and the sizing rule for how long to keep the
    experiment running.  Same variant/conversion cells as the z-test
    op (user_id parity, purchase conversion), both z points literals,
    NULL-guarded for empty variants (the z-test ops' convention).

    Exactness: four integer cells from one conditional-sum aggregate;
    the MDE is one mirrored IEEE chain (sqrt correctly rounded).

    Scale: one map-side-combined aggregate over the scan — the
    cheapest cost class in the registry."""
    e = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("variant"),
        (F.col("event_type") == "purchase").cast("int").alias("conv"),
    )
    agg = e.agg(
        F.sum((F.col("variant") == 0).cast("int")).alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum((F.col("variant") == 1).cast("int")).alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    pp = agg.select("n_a", "n_b", p_pool.alias("p_pool"))
    mde = (
        F.lit(Z_CRIT_005) + F.lit(Z_POWER_080)
    ) * F.sqrt(
        F.col("p_pool")
        * (F.lit(1.0) - F.col("p_pool"))
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return pp.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        "p_pool",
        F.when(ok, mde).alias("mde_abs"),
        F.when(ok & (F.col("p_pool") != 0), mde / F.col("p_pool")).alias(
            "mde_rel"
        ),
    )


@register(
    "quality_welch_anova_drift",
    oracle=f"""
    WITH g AS (
        SELECT source, count(*) AS n,
               SUM(n_chars) AS s, SUM(n_chars * n_chars) AS s2
        FROM documents GROUP BY source HAVING count(*) >= 2
    ),
    w AS (
        SELECT source, n,
               CAST(s AS DOUBLE) / n AS xbar,
               CAST(n AS DOUBLE)
                   / ((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                      / (n - 1)) AS wj
        FROM g
    ),
    tot AS (
        SELECT count(*) AS k,
               CAST(SUM(n) AS BIGINT) AS n_total,
               CAST(SUM(CAST(round(wj, 12) AS DECIMAL(38,12)))
                    AS DOUBLE) AS wtot,
               CAST(SUM(CAST(round(wj * xbar, 12) AS DECIMAL(38,12)))
                    AS DOUBLE) AS m
        FROM w
    ),
    dev AS (
        SELECT t.k, t.n_total, t.wtot,
               CAST(SUM(CAST(round(
                   w.wj * (w.xbar - t.m / t.wtot)
                        * (w.xbar - t.m / t.wtot), 12)
               AS DECIMAL(38,12))) AS DOUBLE) AS num,
               CAST(SUM(CAST(round(
                   (1.0 - w.wj / t.wtot) * (1.0 - w.wj / t.wtot)
                       / (w.n - 1), 12)
               AS DECIMAL(38,12))) AS DOUBLE) AS lam
        FROM w CROSS JOIN tot t
        GROUP BY t.k, t.n_total, t.wtot
    ),
    stat AS (
        SELECT CAST(k AS INT) AS k, n_total,
               (num / (k - 1))
                   / (1.0 + (2.0 * (k - 2) / (CAST(k AS DOUBLE) * k - 1))
                            * lam) AS w_stat,
               CAST(k - 1 AS INT) AS dof
        FROM dev
    )
    SELECT k, n_total, w_stat, dof,
           (k - 1) * w_stat AS chi2_approx,
           {{crit}} AS critical_005,
           (k - 1) * w_stat > {{crit}} AS drift
    FROM stat
    """.replace("{crit}", _CHI2_CRIT_SQL),
    tags=("quality", "drift", "statistics"),
)
def quality_welch_anova_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Welch's heteroscedastic ANOVA on document length across
    sources — the omnibus the classical F test (quality_anova_f_drift)
    gets WRONG when group variances differ (its pooled SSW assumes
    homoscedasticity; with unequal n and unequal variance its size is
    badly off): Welch weights each group by w_j = n_j/s_j², centers at
    the weighted grand mean, and corrects the denominator by the
    Λ = Σ(1-w_j/W)²/(n_j-1) imbalance term (the k-sample extension of
    the registered pairwise Welch t).  Verdict via the same large-N
    (k-1)·W → chi²_(k-1) convention as the F gate, on the shared
    literal table.  Groups need n ≥ 2 (s² undefined below — mirrored
    HAVING).

    Exactness: per-group (n, Σx, Σx²) exact BIGINTs; x̄, s², w_j are
    fixed mirrored IEEE chains; the four cross-group sums (W, Σw x̄,
    numerator deviations, Λ) each quantize to round-12 DECIMAL(38,12)
    so they are order-independent.

    Scale: one map-side-combined groupBy(source) + k-row algebra with
    a broadcast totals row — the F gate's exact cost class."""
    g = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("s"),
            F.sum(F.col("n_chars") * F.col("n_chars")).alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    xbar = F.col("s").cast("double") / F.col("n")
    s2 = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    w = g.select(
        "source",
        "n",
        xbar.alias("xbar"),
        (F.col("n").cast("double") / s2).alias("wj"),
    )
    tot = w.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum(F.round(F.col("wj"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("wtot"),
        F.sum(
            F.round(F.col("wj") * F.col("xbar"), 12).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("m"),
    )
    j = w.crossJoin(F.broadcast(tot))
    ctr = F.col("xbar") - F.col("m") / F.col("wtot")
    dev = j.groupBy("k", "n_total", "wtot").agg(
        F.sum(
            F.round(F.col("wj") * ctr * ctr, 12).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("num"),
        F.sum(
            F.round(
                (F.lit(1.0) - F.col("wj") / F.col("wtot"))
                * (F.lit(1.0) - F.col("wj") / F.col("wtot"))
                / (F.col("n") - 1),
                12,
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("lam"),
    )
    k_d = F.col("k").cast("double")
    w_stat = (F.col("num") / (F.col("k") - 1)) / (
        F.lit(1.0)
        + (F.lit(2.0) * (F.col("k") - 2) / (k_d * F.col("k") - 1))
        * F.col("lam")
    )
    stat = dev.select(
        F.col("k").cast("int").alias("k"),
        "n_total",
        w_stat.alias("w_stat"),
        (F.col("k") - 1).cast("int").alias("dof"),
    )
    dof_d = F.col("dof").cast("double")
    wh_b = (
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * dof_d)
        + F.lit(_WH_Z095) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof_d))
    )
    crit = dof_d * wh_b * wh_b * wh_b
    for kk, vv in CHI2_CRIT_005.items():
        crit = F.when(F.col("dof") == kk, F.lit(vv)).otherwise(crit)
    return stat.select(
        "k",
        "n_total",
        "w_stat",
        "dof",
        ((F.col("k") - 1) * F.col("w_stat")).alias("chi2_approx"),
        crit.alias("critical_005"),
        ((F.col("k") - 1) * F.col("w_stat") > crit).alias("drift"),
    )


@register(
    "quality_bartlett_homoscedasticity",
    oracle=f"""
    WITH g AS (
        SELECT source, count(*) AS n,
               SUM(n_chars) AS s, SUM(n_chars * n_chars) AS s2
        FROM documents GROUP BY source HAVING count(*) >= 2
    ),
    v AS (
        SELECT source, n,
               (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                   / (n - 1) AS var_j
        FROM g
    ),
    tot AS (
        SELECT count(*) AS k,
               CAST(SUM(n) AS BIGINT) AS n_total,
               CAST(SUM(CAST(round((n - 1) * var_j, 6)
                    AS DECIMAL(38,6))) AS DOUBLE) AS ssw,
               CAST(SUM(CAST(round((n - 1) * ln(var_j), 12)
                    AS DECIMAL(38,12))) AS DOUBLE) AS sum_ln,
               CAST(SUM(CAST(round(1.0 / (n - 1), 12)
                    AS DECIMAL(38,12))) AS DOUBLE) AS sum_inv
        FROM v
    ),
    stat AS (
        SELECT CAST(k AS INT) AS k, n_total,
               ((n_total - k)
                    * round(ln(ssw / (n_total - k)), 12)
                - sum_ln)
               / (1.0 + (sum_inv - 1.0 / (n_total - k))
                        / (3.0 * (k - 1))) AS k2,
               CAST(k - 1 AS INT) AS dof
        FROM tot
    )
    SELECT k, n_total, k2, dof,
           {{crit}} AS critical_005,
           k2 > {{crit}} AS heteroscedastic
    FROM stat
    """.replace("{crit}", _CHI2_CRIT_SQL),
    tags=("quality", "statistics"),
)
def quality_bartlett_homoscedasticity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bartlett's test for equal variances across sources — the
    PRECONDITION check for the classical ANOVA F gate (its pooled SSW
    assumes homoscedasticity) and the classical twin of the robust
    Brown-Forsythe op: K² = [(N-k)ln(s_p²) - Σ(n_j-1)ln(s_j²)] / C
    with the standard C = 1 + (Σ1/(n_j-1) - 1/(N-k))/(3(k-1)), χ²_(k-1)
    under H0 on the shared literal table.  The decision tree this
    completes: Bartlett fires → trust Welch ANOVA / Brown-Forsythe;
    quiet → the F gate's pooled variance is safe.

    Exactness: per-group (n, Σx, Σx²) exact BIGINTs; s_j² one
    mirrored chain; every ln is round-12 before use and every
    cross-group sum quantizes to DECIMAL (the pooled SSW at round-6
    DECIMAL(38,6), the ln and 1/(n-1) sums at round-12) so all three
    sums are order-independent; the final K² is one mirrored chain.
    Groups need n ≥ 2 (mirrored HAVING).

    Scale: the F/Welch gates' exact cost class — one
    map-side-combined groupBy(source), k-row algebra."""
    g = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("s"),
            F.sum(F.col("n_chars") * F.col("n_chars")).alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    var_j = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    v = g.select("source", "n", var_j.alias("var_j"))
    tot = v.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum(
            F.round((F.col("n") - 1) * F.col("var_j"), 6).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("ssw"),
        F.sum(
            F.round(
                (F.col("n") - 1) * F.log(F.col("var_j")), 12
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("sum_ln"),
        F.sum(
            F.round(F.lit(1.0) / (F.col("n") - 1), 12).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("sum_inv"),
    )
    nk = F.col("n_total") - F.col("k")
    k2 = (
        nk * F.round(F.log(F.col("ssw") / nk), 12) - F.col("sum_ln")
    ) / (
        F.lit(1.0)
        + (F.col("sum_inv") - F.lit(1.0) / nk)
        / (F.lit(3.0) * (F.col("k") - 1))
    )
    stat = tot.select(
        F.col("k").cast("int").alias("k"),
        "n_total",
        k2.alias("k2"),
        (F.col("k") - 1).cast("int").alias("dof"),
    )
    dof_d = F.col("dof").cast("double")
    wh_b = (
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * dof_d)
        + F.lit(_WH_Z095) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dof_d))
    )
    crit = dof_d * wh_b * wh_b * wh_b
    for kk, vv in CHI2_CRIT_005.items():
        crit = F.when(F.col("dof") == kk, F.lit(vv)).otherwise(crit)
    return stat.select(
        "k",
        "n_total",
        "k2",
        "dof",
        crit.alias("critical_005"),
        (F.col("k2") > crit).alias("heteroscedastic"),
    )


#: Benjamini-Hochberg two-sided z thresholds for m = 19 simultaneous
#: tests at FDR alpha = 0.05: entry i is Phi^{-1}(1 - (0.05*i/19)/2).
#: Computed offline by tools/gen_bh_z_table.py (Acklam inverse-normal
#: + Newton refinement on math.erfc; round-trip error < 2e-16, and
#: entry 19 equals the plain Z_CRIT_005 literal by construction since
#: alpha_19 = 0.05) and pinned here as literals so both engines
#: compare against identical doubles — the chi2-table convention.
BH_Z_CRIT_M19 = {
    1: 3.0077865564732678, 2: 2.7904699910890725, 3: 2.6565387878196844,
    4: 2.55804272698677, 5: 2.479466885301666, 6: 2.413745803735221,
    7: 2.357044229768459, 8: 2.3070392593928246, 9: 2.262213582661452,
    10: 2.2215195883378365, 11: 2.1842025393757645, 12: 2.149700064344467,
    13: 2.1175815000165485, 14: 2.0875094772894127, 15: 2.0592146098716695,
    16: 2.032478253088416, 17: 2.0071204231255324, 18: 1.9829911235270514,
    19: 1.9599639845400538,
}

_BH_Z_SQL = "CASE " + " ".join(
    f"WHEN rank = {i} THEN {v!r}" for i, v in BH_Z_CRIT_M19.items()
) + " END"


@register(
    "quality_mw_drift_fdr",
    oracle=f"""
    WITH x AS (SELECT source, n_chars AS v FROM documents),
    srcs AS (SELECT DISTINCT source AS s FROM x WHERE source <> 'src0'),
    ref_hist AS (
        SELECT v, count(*) AS a FROM x WHERE source = 'src0' GROUP BY v
    ),
    src_hist AS (
        SELECT source AS s, v, count(*) AS b
        FROM x WHERE source <> 'src0' GROUP BY 1, 2
    ),
    merged AS (
        SELECT s, v, SUM(a) AS a, SUM(b) AS b FROM (
            SELECT s, v, 0 AS a, b FROM src_hist
            UNION ALL
            SELECT srcs.s, r.v, r.a, 0 AS b FROM srcs CROSS JOIN ref_hist r
        ) GROUP BY 1, 2
    ),
    ranked_v AS (
        SELECT s, a, b, a + b AS m,
               COALESCE(SUM(a + b) OVER (PARTITION BY s ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS sb
        FROM merged
    ),
    stats AS (
        SELECT s, SUM(a) AS na, SUM(b) AS nb,
               SUM(b * (2 * sb + m + 1)) AS r2,
               SUM(m * m * m - m) AS tie
        FROM ranked_v GROUP BY s
    ),
    zs AS (
        SELECT s,
               (CAST(r2 - nb * (nb + 1) AS DOUBLE)
                    - CAST(na * nb AS DOUBLE))
               / (2.0 * sqrt((CAST(na AS DOUBLE) * nb / 12.0)
                   * ((na + nb + 1.0)
                      - CAST(tie AS DOUBLE)
                        / (CAST(na + nb AS DOUBLE) * (na + nb - 1.0)))))
                   AS z
        FROM stats
    ),
    ordered AS (
        SELECT s, z,
               row_number() OVER (ORDER BY abs(z) DESC, s) AS rank,
               count(*) OVER () AS m_tests
        FROM zs
    ),
    crits AS (
        SELECT *,
               CASE WHEN m_tests = 19 THEN {_BH_Z_SQL} END AS z_crit
        FROM ordered
    ),
    cut AS (
        SELECT *,
               max(CASE WHEN abs(z) >= z_crit THEN rank END)
                   OVER () AS i_star
        FROM crits
    )
    SELECT s AS source, z,
           CAST(rank AS INT) AS rank,
           z_crit,
           abs(z) > {Z_CRIT_005} AS raw_reject,
           CASE WHEN z_crit IS NULL THEN NULL
                ELSE i_star IS NOT NULL AND rank <= i_star
           END AS fdr_reject
    FROM cut
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_mw_drift_fdr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benjamini-Hochberg FDR control across the per-source
    Mann-Whitney drift tests — the MULTIPLICITY fix the per-source
    gates are incomplete without: at alpha = 0.05 a 19-source
    dashboard expects ~1 false drift alarm per refresh, so acting on
    raw per-test verdicts means chasing ghosts.  BH's step-up rule
    (reject ranks 1..i*, i* = max i with p_(i) <= alpha*i/m) bounds
    the EXPECTED FALSE-DISCOVERY FRACTION at 5% while keeping far
    more power than Bonferroni.  Both verdicts are emitted per
    source (raw_reject vs fdr_reject) so the dashboard can show what
    multiplicity control changed.

    No p-values needed: BH on two-sided z-tests is equivalent to
    comparing |z|_(i) against Phi^{{-1}}(1 - (alpha*i/m)/2), and for
    the fixed m = 19 sources those thresholds are LITERALS
    (BH_Z_CRIT_M19, generated offline with an erfc-verified inverse
    normal — the chi2-critical-table convention extended to a rank
    table; entry 19 is the plain two-sided 5% point, one ulp from the
    quoted Z_CRIT literal, since alpha_m = alpha).  If a future corpus changes the source count the verdict
    degrades to NULL rather than silently using wrong thresholds
    (mirrored CASE in both engines).

    Scale: the MW kernel's histogram cost (shared shape with
    quality_mannwhitney_drift) plus windows over the m-row z table —
    the multiplicity layer is free."""
    from pyspark.sql import Window

    merged = _ref_vs_source_hist(spark, sf_dir)
    w_cum = (
        Window.partitionBy("s")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = F.col("a") + F.col("b")
    ranked_v = merged.select(
        "s",
        "a",
        "b",
        m.alias("m"),
        F.coalesce(F.sum(m).over(w_cum), F.lit(0)).alias("sb"),
    )
    stats = ranked_v.groupBy("s").agg(
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
        F.sum(F.col("b") * (2 * F.col("sb") + F.col("m") + 1)).alias(
            "r2"
        ),
        F.sum(
            F.col("m") * F.col("m") * F.col("m") - F.col("m")
        ).alias("tie"),
    )
    nn = F.col("na") + F.col("nb")
    z = (
        (F.col("r2") - F.col("nb") * (F.col("nb") + 1)).cast("double")
        - (F.col("na") * F.col("nb")).cast("double")
    ) / (
        F.lit(2.0)
        * F.sqrt(
            (F.col("na").cast("double") * F.col("nb") / F.lit(12.0))
            * (
                (nn + F.lit(1.0))
                - F.col("tie").cast("double")
                / (nn.cast("double") * (nn - F.lit(1.0)))
            )
        )
    )
    zs = stats.select("s", z.alias("z"))
    w_rank = Window.orderBy(F.abs(F.col("z")).desc(), "s")
    ordered = zs.select(
        "s",
        "z",
        F.row_number().over(w_rank).alias("rank"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m_tests"),
    )
    z_crit = F.lit(None).cast("double")
    for i, v in BH_Z_CRIT_M19.items():
        z_crit = F.when(F.col("rank") == i, F.lit(v)).otherwise(z_crit)
    crits = ordered.select(
        "*",
        F.when(F.col("m_tests") == 19, z_crit).alias("z_crit"),
    )
    i_star = F.max(
        F.when(F.abs(F.col("z")) >= F.col("z_crit"), F.col("rank"))
    ).over(Window.partitionBy())
    cut = crits.select("*", i_star.alias("i_star"))
    return cut.select(
        F.col("s").alias("source"),
        "z",
        F.col("rank").cast("int").alias("rank"),
        "z_crit",
        (F.abs(F.col("z")) > F.lit(Z_CRIT_005)).alias("raw_reject"),
        F.when(
            F.col("z_crit").isNull(), F.lit(None).cast("boolean")
        ).otherwise(
            F.col("i_star").isNotNull()
            & (F.col("rank") <= F.col("i_star"))
        ).alias("fdr_reject"),
    )


@register(
    "quality_tukey_fences_outliers",
    oracle="""
    WITH fences AS (
        SELECT event_type,
               count(*) AS n,
               round(quantile_cont(value, 0.25), 6) AS q1,
               round(quantile_cont(value, 0.75), 6) AS q3
        FROM events GROUP BY event_type
    ),
    lims AS (
        SELECT event_type, n, q1, q3,
               q1 - 1.5 * (q3 - q1) AS lo,
               q3 + 1.5 * (q3 - q1) AS hi
        FROM fences
    ),
    flagged AS (
        SELECT l.event_type, l.n, l.q1, l.q3, l.lo, l.hi,
               CAST(SUM(CASE WHEN e.value < l.lo OR e.value > l.hi
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events e JOIN lims l USING (event_type)
        GROUP BY 1, 2, 3, 4, 5, 6
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           q1, q3, lo, hi, n_outliers,
           CAST(n_outliers AS DOUBLE) / n AS outlier_rate
    FROM flagged
    """,
    tags=("quality", "statistics"),
)
def quality_tukey_fences_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tukey boxplot fences per event type — the IQR outlier gate
    that completes the robust-outlier pair (the MAD op fences around
    the MEDIAN with a scale constant; Tukey fences at Q1/Q3 ±
    1.5*IQR are the boxplot convention every reviewer already reads,
    asymmetric when the distribution is): per type the quartiles,
    fences, and the exact count/rate of values outside them.  An
    outlier rate far above the ~0.7% a normal distribution implies
    flags heavy tails; one near zero flags clipped/synthetic data.

    Exactness: exact linear-interpolated quartiles (Spark percentile
    == DuckDB quantile_cont — the QQ op's convention), round-6 to
    absorb the interpolation's last ulp; fences one mirrored chain;
    outlier counting is integer conditional summing against those
    exact fence doubles.

    Scale: exact per-group quantiles buffer each group (documented
    cost of exactness; event types are few — the approx_percentile
    swap keeps the table shape for unbounded groups); the counting
    pass is one scan joined against the broadcast type-sized fence
    table."""
    ev = table(spark, sf_dir, "events")
    fences = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.expr("percentile(value, 0.25)"), 6
        ).alias("q1"),
        F.round(
            F.expr("percentile(value, 0.75)"), 6
        ).alias("q3"),
    )
    lims = fences.select(
        "event_type",
        "n",
        "q1",
        "q3",
        (F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias(
            "lo"
        ),
        (F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias(
            "hi"
        ),
    )
    flagged = (
        ev.join(F.broadcast(lims), "event_type")
        .groupBy("event_type", "n", "q1", "q3", "lo", "hi")
        .agg(
            F.sum(
                (
                    (F.col("value") < F.col("lo"))
                    | (F.col("value") > F.col("hi"))
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers")
        )
    )
    return flagged.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        "q1",
        "q3",
        "lo",
        "hi",
        "n_outliers",
        (F.col("n_outliers").cast("double") / F.col("n")).alias(
            "outlier_rate"
        ),
    )


@register(
    "quality_wasserstein_drift",
    oracle="""
    WITH x AS (SELECT source, n_chars AS v FROM documents),
    srcs AS (SELECT DISTINCT source AS s FROM x WHERE source <> 'src0'),
    ref_hist AS (
        SELECT v, count(*) AS a FROM x WHERE source = 'src0' GROUP BY v
    ),
    src_hist AS (
        SELECT source AS s, v, count(*) AS b
        FROM x WHERE source <> 'src0' GROUP BY 1, 2
    ),
    merged AS (
        SELECT s, v, SUM(a) AS a, SUM(b) AS b FROM (
            SELECT s, v, 0 AS a, b FROM src_hist
            UNION ALL
            SELECT srcs.s, r.v, r.a, 0 AS b FROM srcs CROSS JOIN ref_hist r
        ) GROUP BY 1, 2
    ),
    tot AS (SELECT s, SUM(a) AS na, SUM(b) AS nb FROM merged GROUP BY s),
    walked AS (
        SELECT m.s, m.v, t.na, t.nb,
               SUM(m.a) OVER (PARTITION BY m.s ORDER BY m.v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS ca,
               SUM(m.b) OVER (PARTITION BY m.s ORDER BY m.v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS cb,
               lead(m.v) OVER (PARTITION BY m.s ORDER BY m.v)
                   AS v_next
        FROM merged m JOIN tot t ON t.s = m.s
    ),
    terms AS (
        SELECT s, na, nb,
               round(abs(CAST(ca AS DOUBLE) / na
                         - CAST(cb AS DOUBLE) / nb)
                     * (v_next - v), 6) AS term
        FROM walked WHERE v_next IS NOT NULL
    )
    SELECT s AS source,
           CAST(any_value(na) AS BIGINT) AS n_ref,
           CAST(any_value(nb) AS BIGINT) AS n_src,
           CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE)
               AS wasserstein_1
    FROM terms GROUP BY s
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_wasserstein_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """1-Wasserstein (earth-mover) distance per source vs src0 over
    document length — the HORIZONTAL drift metric the vertical family
    cannot express: TV/Hellinger/JS compare probability MASS per value
    and are blind to how FAR the mass moved (shifting every document
    by one character and by a thousand characters score identically);
    W1 = integral |F_a - F_b| dv is exactly the average number of
    characters each document must 'travel' to turn one distribution
    into the other, in the column's own units — the quantity a
    capacity planner or tokenizer-budget owner actually wants.

    Computed exactly from the shared ref-vs-source histogram: W1 =
    sum over consecutive distinct values of |ECDF gap| * value gap
    (the closed form of the integral for step ECDFs — no binning, no
    approximation).  ECDF ratios are single double divisions of exact
    BIGINT cumulatives; each term rounds to 6 decimals into an
    order-independent DECIMAL(38,6) sum.

    Scale: the KS/CvM/AD kernel cost exactly — histogram groupBys,
    cumulative + lead windows over distinct values per source, one
    scalar row out per source."""
    from pyspark.sql import Window

    merged = _ref_vs_source_hist(spark, sf_dir)
    tot = merged.groupBy("s").agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    w_cum = (
        Window.partitionBy("s")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lead = Window.partitionBy("s").orderBy("v")
    walked = merged.join(tot, "s").select(
        "s",
        "v",
        "na",
        "nb",
        F.sum("a").over(w_cum).alias("ca"),
        F.sum("b").over(w_cum).alias("cb"),
        F.lead("v").over(w_lead).alias("v_next"),
    )
    term = F.round(
        F.abs(
            F.col("ca").cast("double") / F.col("na")
            - F.col("cb").cast("double") / F.col("nb")
        )
        * (F.col("v_next") - F.col("v")),
        6,
    )
    return (
        walked.filter(F.col("v_next").isNotNull())
        .select("s", "na", "nb", term.alias("term"))
        .groupBy("s")
        .agg(
            F.any_value("na").cast("bigint").alias("n_ref"),
            F.any_value("nb").cast("bigint").alias("n_src"),
            F.sum(F.col("term").cast("decimal(38,6)"))
            .cast("double")
            .alias("wasserstein_1"),
        )
        .select(
            F.col("s").alias("source"),
            "n_ref",
            "n_src",
            "wasserstein_1",
        )
    )


@register(
    "quality_energy_distance_drift",
    oracle="""
    WITH x AS (SELECT source, n_chars AS v FROM documents),
    srcs AS (SELECT DISTINCT source AS s FROM x WHERE source <> 'src0'),
    ref_hist AS (
        SELECT v, count(*) AS a FROM x WHERE source = 'src0' GROUP BY v
    ),
    src_hist AS (
        SELECT source AS s, v, count(*) AS b
        FROM x WHERE source <> 'src0' GROUP BY 1, 2
    ),
    merged AS (
        SELECT s, v, SUM(a) AS a, SUM(b) AS b FROM (
            SELECT s, v, 0 AS a, b FROM src_hist
            UNION ALL
            SELECT srcs.s, r.v, r.a, 0 AS b FROM srcs CROSS JOIN ref_hist r
        ) GROUP BY 1, 2
    ),
    tot AS (SELECT s, SUM(a) AS na, SUM(b) AS nb FROM merged GROUP BY s),
    walked AS (
        SELECT m.s, m.v, t.na, t.nb,
               SUM(m.a) OVER (PARTITION BY m.s ORDER BY m.v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS ca,
               SUM(m.b) OVER (PARTITION BY m.s ORDER BY m.v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS cb,
               lead(m.v) OVER (PARTITION BY m.s ORDER BY m.v)
                   AS v_next
        FROM merged m JOIN tot t ON t.s = m.s
    ),
    terms AS (
        SELECT s, na, nb,
               round(CAST(v_next - v AS DOUBLE)
                     * (ca * (nb - cb) + cb * (na - ca))
                     / (CAST(na AS DOUBLE) * nb), 6) AS e_xy,
               round(CAST(v_next - v AS DOUBLE)
                     * (2.0 * ca * (na - ca))
                     / (CAST(na AS DOUBLE) * na), 6) AS e_xx,
               round(CAST(v_next - v AS DOUBLE)
                     * (2.0 * cb * (nb - cb))
                     / (CAST(nb AS DOUBLE) * nb), 6) AS e_yy
        FROM walked WHERE v_next IS NOT NULL
    ),
    agg AS (
        SELECT s, CAST(any_value(na) AS BIGINT) AS n_ref,
               CAST(any_value(nb) AS BIGINT) AS n_src,
               CAST(SUM(CAST(e_xy AS DECIMAL(38,6))) AS DOUBLE) AS exy,
               CAST(SUM(CAST(e_xx AS DECIMAL(38,6))) AS DOUBLE) AS exx,
               CAST(SUM(CAST(e_yy AS DECIMAL(38,6))) AS DOUBLE) AS eyy
        FROM terms GROUP BY s
    )
    SELECT s AS source, n_ref, n_src,
           exy AS e_cross, exx AS e_within_ref, eyy AS e_within_src,
           2.0 * exy - exx - eyy AS energy_distance
    FROM agg
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_energy_distance_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Energy distance per source vs src0 — the two-sample metric
    that is zero IFF the distributions are IDENTICAL (Székely-Rizzo):
    E = 2*E|X-Y| - E|X-X'| - E|Y-Y'|.  KS/CvM/AD read ECDF gaps, W1
    reads transport cost; energy distance is the member with a
    characteristic-function guarantee (it powers the energy
    two-sample test and distance correlation), and its three
    components are diagnostic on their own: e_cross vs the two
    within-sample mean absolute differences says whether the gap is
    location (cross up, withins flat) or dispersion (withins moved).

    The O(n^2) pair expectations collapse to O(distinct values): for
    sorted values, sum|x-y| = sum over consecutive gaps g_j of g_j *
    (#pairs straddling the gap) — CA*(nb-CB) + CB*(na-CA) for the
    cross term, 2*CA*(na-CA) within — all exact BIGINT counts from
    the SAME cumulative walk as the W1 op (one more column on one
    shared window pass at 100 TB).

    Exactness: integer straddle counts x integer gaps, one double
    division per term, round-6 DECIMAL(38,6) sums, mirrored final
    chain.

    Scale: the KS/W1 kernel class — histogram groupBys + per-source
    distinct-value windows, scalar rows out."""
    from pyspark.sql import Window

    merged = _ref_vs_source_hist(spark, sf_dir)
    tot = merged.groupBy("s").agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    w_cum = (
        Window.partitionBy("s")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lead = Window.partitionBy("s").orderBy("v")
    walked = merged.join(tot, "s").select(
        "s",
        "v",
        "na",
        "nb",
        F.sum("a").over(w_cum).alias("ca"),
        F.sum("b").over(w_cum).alias("cb"),
        F.lead("v").over(w_lead).alias("v_next"),
    )
    gap = (F.col("v_next") - F.col("v")).cast("double")
    e_xy = F.round(
        gap
        * (
            F.col("ca") * (F.col("nb") - F.col("cb"))
            + F.col("cb") * (F.col("na") - F.col("ca"))
        )
        / (F.col("na").cast("double") * F.col("nb")),
        6,
    )
    e_xx = F.round(
        gap
        * (F.lit(2.0) * F.col("ca") * (F.col("na") - F.col("ca")))
        / (F.col("na").cast("double") * F.col("na")),
        6,
    )
    e_yy = F.round(
        gap
        * (F.lit(2.0) * F.col("cb") * (F.col("nb") - F.col("cb")))
        / (F.col("nb").cast("double") * F.col("nb")),
        6,
    )
    agg = (
        walked.filter(F.col("v_next").isNotNull())
        .select(
            "s",
            "na",
            "nb",
            e_xy.alias("e_xy"),
            e_xx.alias("e_xx"),
            e_yy.alias("e_yy"),
        )
        .groupBy("s")
        .agg(
            F.any_value("na").cast("bigint").alias("n_ref"),
            F.any_value("nb").cast("bigint").alias("n_src"),
            F.sum(F.col("e_xy").cast("decimal(38,6)"))
            .cast("double")
            .alias("exy"),
            F.sum(F.col("e_xx").cast("decimal(38,6)"))
            .cast("double")
            .alias("exx"),
            F.sum(F.col("e_yy").cast("decimal(38,6)"))
            .cast("double")
            .alias("eyy"),
        )
    )
    return agg.select(
        F.col("s").alias("source"),
        "n_ref",
        "n_src",
        F.col("exy").alias("e_cross"),
        F.col("exx").alias("e_within_ref"),
        F.col("eyy").alias("e_within_src"),
        (
            F.lit(2.0) * F.col("exy") - F.col("exx") - F.col("eyy")
        ).alias("energy_distance"),
    )


# ---------------------------------------------------------------------------
# Distance correlation (Székely-Rizzo) between hourly click and
# purchase volumes — exact integer pair kernel
# ---------------------------------------------------------------------------


@register(
    "quality_distance_correlation_hourly",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(SUM(CASE WHEN event_type = 'click'
                             THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hourly),
    pair_sums AS (
        SELECT CAST(SUM(abs(a.x - b.x) * abs(a.y - b.y)) AS BIGINT) AS t1,
               CAST(SUM(abs(a.x - b.x) * abs(a.x - b.x)) AS BIGINT) AS t1x,
               CAST(SUM(abs(a.y - b.y) * abs(a.y - b.y)) AS BIGINT) AS t1y,
               CAST(SUM(abs(a.x - b.x)) AS BIGINT) AS sa,
               CAST(SUM(abs(a.y - b.y)) AS BIGINT) AS sb
        FROM hourly a, hourly b
    ),
    row_sums AS (
        SELECT a.h,
               CAST(SUM(abs(a.x - b.x)) AS BIGINT) AS r,
               CAST(SUM(abs(a.y - b.y)) AS BIGINT) AS s
        FROM hourly a, hourly b GROUP BY a.h
    ),
    cross_sums AS (
        SELECT CAST(SUM(r * s) AS BIGINT) AS tr,
               CAST(SUM(r * r) AS BIGINT) AS trx,
               CAST(SUM(s * s) AS BIGINT) AS try_
        FROM row_sums
    ),
    parts AS (
        SELECT tot.n,
               CAST(tot.n * tot.n * p.t1
                    - 2 * tot.n * c.tr + p.sa * p.sb AS BIGINT)
                   AS dcov2_num,
               CAST(tot.n * tot.n * p.t1x
                    - 2 * tot.n * c.trx + p.sa * p.sa AS BIGINT)
                   AS dvar2_x,
               CAST(tot.n * tot.n * p.t1y
                    - 2 * tot.n * c.try_ + p.sb * p.sb AS BIGINT)
                   AS dvar2_y
        FROM tot, pair_sums p, cross_sums c
    )
    SELECT n AS n_hours, dcov2_num, dvar2_x, dvar2_y,
           sqrt(CAST(dcov2_num AS DOUBLE)
                / sqrt(CAST(dvar2_x AS DOUBLE)
                       * CAST(dvar2_y AS DOUBLE))) AS dcor
    FROM parts
    """,
    tags=("quality", "statistics", "drift"),
)
def quality_distance_correlation_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distance correlation (Székely-Rizzo-Bakirov 2007) between hourly
    click volume and hourly purchase volume — the dependence number the
    Pearson/Spearman/Kendall trio cannot deliver: dCor = 0 iff the two
    series are INDEPENDENT (not merely uncorrelated), so it catches the
    nonlinear/non-monotone couplings a funnel actually produces (e.g. a
    saturating click→purchase response reads near-zero in Pearson but
    not here).  Completes the pair-kernel family beside the energy
    distance (same |a-b| walk, two-sample flavor) and 1-Wasserstein.

    All three V-statistics are computed EXACTLY in integers via the
    double-centering identity n⁴·dCov² = n²·Σᵢⱼaᵢⱼbᵢⱼ − 2n·Σᵢrᵢsᵢ +
    (Σa)(Σb) with rᵢ the distance-matrix row sums — no per-row mean
    divisions, so both engines agree bit-for-bit on the three BIGINT
    components and the final dcor is one shared IEEE sqrt/division
    chain.  dcor² = n⁴dCov² / sqrt(n⁴dVarx · n⁴dVary).

    Scale: the heavy input scan collapses to the hour grid in ONE
    map-side-combined groupBy; the O(n²) pair kernel runs on the GRID,
    whose size is the TIME SPAN (n=720 hours for this corpus, n²=518k
    pair rows — a decade is ~9e4 hours), never the corpus row count.
    For multi-decade spans, re-grid to days (same operator shape,
    n=3650) — the grid choice, not the kernel, is the scale knob; the
    O(n log n) Huo-Székely merge is the known alternative if a fine
    grid over a long span is ever required."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("y"),
    )
    a, b = hourly.alias("a"), hourly.alias("b")
    dx = F.abs(F.col("a.x") - F.col("b.x"))
    dy = F.abs(F.col("a.y") - F.col("b.y"))
    pair_sums = a.crossJoin(b).agg(
        F.sum(dx * dy).cast("bigint").alias("t1"),
        F.sum(dx * dx).cast("bigint").alias("t1x"),
        F.sum(dy * dy).cast("bigint").alias("t1y"),
        F.sum(dx).cast("bigint").alias("sa"),
        F.sum(dy).cast("bigint").alias("sb"),
    )
    row_sums = (
        a.crossJoin(b)
        .groupBy(F.col("a.h"))
        .agg(
            F.sum(dx).cast("bigint").alias("r"),
            F.sum(dy).cast("bigint").alias("s"),
        )
    )
    cross_sums = row_sums.agg(
        F.sum(F.col("r") * F.col("s")).cast("bigint").alias("tr"),
        F.sum(F.col("r") * F.col("r")).cast("bigint").alias("trx"),
        F.sum(F.col("s") * F.col("s")).cast("bigint").alias("try_"),
    )
    tot = hourly.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    parts = (
        tot.crossJoin(pair_sums)
        .crossJoin(cross_sums)
        .select(
            F.col("n"),
            (
                F.col("n") * F.col("n") * F.col("t1")
                - 2 * F.col("n") * F.col("tr")
                + F.col("sa") * F.col("sb")
            )
            .cast("bigint")
            .alias("dcov2_num"),
            (
                F.col("n") * F.col("n") * F.col("t1x")
                - 2 * F.col("n") * F.col("trx")
                + F.col("sa") * F.col("sa")
            )
            .cast("bigint")
            .alias("dvar2_x"),
            (
                F.col("n") * F.col("n") * F.col("t1y")
                - 2 * F.col("n") * F.col("try_")
                + F.col("sb") * F.col("sb")
            )
            .cast("bigint")
            .alias("dvar2_y"),
        )
    )
    return parts.select(
        F.col("n").alias("n_hours"),
        "dcov2_num",
        "dvar2_x",
        "dvar2_y",
        F.sqrt(
            F.col("dcov2_num").cast("double")
            / F.sqrt(
                F.col("dvar2_x").cast("double")
                * F.col("dvar2_y").cast("double")
            )
        ).alias("dcor"),
    )


# ---------------------------------------------------------------------------
# Hoeffding's D between hourly click and purchase volumes — exact
# dominance-histogram kernel with midrank tie credits
# ---------------------------------------------------------------------------


#: Shared final-step arithmetic for Hoeffding's D: written ONCE as SQL
#: text and executed verbatim by both engines (F.expr on the Spark
#: side), so the IEEE operation order is identical by construction.
_HOEFFDING_D_EXPR = (
    "30.0 * (CAST((n_hours - 2) * (n_hours - 3) AS DOUBLE)"
    " * CAST(d1_16 AS DOUBLE)"
    " + CAST(d2_16 AS DOUBLE)"
    " - 2.0 * CAST(n_hours - 2 AS DOUBLE) * CAST(d3_16 AS DOUBLE))"
    " / (16.0 * CAST(n_hours AS DOUBLE) * CAST(n_hours - 1 AS DOUBLE)"
    " * CAST(n_hours - 2 AS DOUBLE) * CAST(n_hours - 3 AS DOUBLE)"
    " * CAST(n_hours - 4 AS DOUBLE))"
)


@register(
    "quality_hoeffding_d_hourly",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(SUM(CASE WHEN event_type = 'click'
                             THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    cells AS (
        SELECT x, y, CAST(count(*) AS BIGINT) AS nc
        FROM hourly GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hourly),
    mx AS (
        SELECT x,
               CAST(2 * (coalesce(SUM(t) OVER (ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0)) + t - 1 AS BIGINT) AS r2
        FROM (SELECT x, CAST(count(*) AS BIGINT) AS t
              FROM hourly GROUP BY x)
    ),
    my AS (
        SELECT y,
               CAST(2 * (coalesce(SUM(t) OVER (ORDER BY y
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0)) + t - 1 AS BIGINT) AS s2
        FROM (SELECT y, CAST(count(*) AS BIGINT) AS t
              FROM hourly GROUP BY y)
    ),
    q AS (
        SELECT a.x, a.y, a.nc,
               CAST(4 + coalesce(SUM(CASE
                   WHEN b.x < a.x AND b.y < a.y THEN 4 * b.nc
                   WHEN b.x = a.x AND b.y < a.y THEN 2 * b.nc
                   WHEN b.x < a.x AND b.y = a.y THEN 2 * b.nc
                   WHEN b.x = a.x AND b.y = a.y THEN b.nc - 1
               END), 0) AS BIGINT) AS q4
        FROM cells a LEFT JOIN cells b
          ON b.x <= a.x AND b.y <= a.y
        GROUP BY a.x, a.y, a.nc
    ),
    terms AS (
        SELECT CAST(SUM(q.nc * (q.q4 - 4) * (q.q4 - 8)) AS BIGINT)
                   AS d1_16,
               CAST(SUM(q.nc * mx.r2 * (mx.r2 - 2)
                        * my.s2 * (my.s2 - 2)) AS BIGINT) AS d2_16,
               CAST(SUM(q.nc * (mx.r2 - 2) * (my.s2 - 2)
                        * (q.q4 - 4)) AS BIGINT) AS d3_16
        FROM q
        JOIN mx ON mx.x = q.x
        JOIN my ON my.y = q.y
    )
    SELECT n AS n_hours, d1_16, d2_16, d3_16,
           {_HOEFFDING_D_EXPR} AS hoeffding_d
    FROM terms, tot
    """,
    tags=("quality", "statistics", "drift"),
)
def quality_hoeffding_d_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hoeffding's D (1948) between hourly click volume and hourly
    purchase volume — the RANK-based independence test beside the
    distance correlation's metric one: D estimates ∫(F_xy − F_xF_y)²,
    is invariant to monotone transforms of either margin (dCor is
    not), and its D1/D2/D3 sums are the classical published form
    D = 30·((n−2)(n−3)D1 + D2 − 2(n−2)D3) / (n(n−1)(n−2)(n−3)(n−4)),
    D1 = Σ(Qᵢ−1)(Qᵢ−2), D2 = Σ(Rᵢ−1)(Rᵢ−2)(Sᵢ−1)(Sᵢ−2),
    D3 = Σ(Rᵢ−2)(Sᵢ−2)(Qᵢ−1), with midrank tie credits (½ for a
    single-coordinate tie, ¼ for a double tie) in R, S and Q.

    Exactness: midranks live on a half-integer grid and Q on a quarter
    grid, so the engine carries R2 = 2(R−1), S2 = 2(S−1), Q4 = 4Q and
    the three sums D1_16/D2_16/D3_16 = 16·D1/D2/D3 as exact BIGINTs —
    hash-identical cross-engine; the single IEEE step is the final
    scalar, evaluated from ONE shared SQL expression text
    (_HOEFFDING_D_EXPR) so the operation order matches bit-for-bit.

    Scale: like quality_kendall_tau_corr, the kernel never touches
    observation pairs — ranks come from the MARGINAL histograms
    (domain-sized cumulative windows) and Q from a dominance join over
    the JOINT value histogram, cost (distinct cells)², bounded by the
    value-domain product whatever the corpus size; the corpus itself
    is scanned once into the hour grid (map-side combined).  For
    high-cardinality metrics, quantize to the engine's decimal grid
    first — the documented Kendall discipline."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("y"),
    )
    cells = hourly.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("nc")
    )
    tot = hourly.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    from pyspark.sql import Window

    def midrank2(col: str, out: str) -> DataFrame:
        # R2 = 2*(#{v' < v}) + #{v' = v} - 1  (= 2*(midrank - 1)),
        # from the marginal histogram — the cumulative window frame is
        # domain-sized, not corpus-sized.
        marg = hourly.groupBy(col).agg(
            F.count(F.lit(1)).cast("bigint").alias("t")
        )
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        return marg.select(
            F.col(col),
            (
                2 * F.coalesce(F.sum("t").over(w), F.lit(0))
                + F.col("t")
                - 1
            )
            .cast("bigint")
            .alias(out),
        )

    mx = midrank2("x", "r2")
    my = midrank2("y", "s2")
    a, b = cells.alias("a"), cells.alias("b")
    w_q = (
        F.when(
            (F.col("b.x") < F.col("a.x"))
            & (F.col("b.y") < F.col("a.y")),
            4 * F.col("b.nc"),
        )
        .when(
            (F.col("b.x") == F.col("a.x"))
            & (F.col("b.y") < F.col("a.y")),
            2 * F.col("b.nc"),
        )
        .when(
            (F.col("b.x") < F.col("a.x"))
            & (F.col("b.y") == F.col("a.y")),
            2 * F.col("b.nc"),
        )
        .when(
            (F.col("b.x") == F.col("a.x"))
            & (F.col("b.y") == F.col("a.y")),
            F.col("b.nc") - 1,
        )
    )
    q = (
        a.join(
            b,
            (F.col("b.x") <= F.col("a.x"))
            & (F.col("b.y") <= F.col("a.y")),
            "left",
        )
        .groupBy(F.col("a.x"), F.col("a.y"), F.col("a.nc"))
        .agg(
            (4 + F.coalesce(F.sum(w_q), F.lit(0)))
            .cast("bigint")
            .alias("q4")
        )
    )
    terms = (
        q.join(mx, "x")
        .join(my, "y")
        .agg(
            F.sum(
                F.col("nc")
                * (F.col("q4") - 4)
                * (F.col("q4") - 8)
            )
            .cast("bigint")
            .alias("d1_16"),
            F.sum(
                F.col("nc")
                * F.col("r2")
                * (F.col("r2") - 2)
                * F.col("s2")
                * (F.col("s2") - 2)
            )
            .cast("bigint")
            .alias("d2_16"),
            F.sum(
                F.col("nc")
                * (F.col("r2") - 2)
                * (F.col("s2") - 2)
                * (F.col("q4") - 4)
            )
            .cast("bigint")
            .alias("d3_16"),
        )
    )
    return (
        terms.crossJoin(tot)
        .select(
            F.col("n").alias("n_hours"),
            "d1_16",
            "d2_16",
            "d3_16",
        )
        .withColumn("hoeffding_d", F.expr(_HOEFFDING_D_EXPR))
    )


# ---------------------------------------------------------------------------
# Kuiper two-sample drift (cyclic-sensitive KS variant) — exact
# integer gap maxima on the shared histogram walk
# ---------------------------------------------------------------------------

#: Asymptotic 5% critical constant of the two-sample Kuiper V statistic
#: (V* = V·sqrt(na·nb/(na+nb)); published one/two-sample asymptotic
#: table value — asymptotic, like the KS 1.358 gate above).
KUIPER_C005 = 1.747


@register(
    "quality_kuiper_drift",
    oracle=f"""
    WITH rows_t AS (
        SELECT n_chars AS v,
               CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_a,
               CASE WHEN source = 'src0' THEN 0 ELSE 1 END AS is_b
        FROM documents
    ),
    hist AS (
        SELECT v, SUM(is_a) AS ca_i, SUM(is_b) AS cb_i
        FROM rows_t GROUP BY v
    ),
    cum AS (
        SELECT v,
               SUM(ca_i) OVER (ORDER BY v) AS ca,
               SUM(cb_i) OVER (ORDER BY v) AS cb
        FROM hist
    ),
    tot AS (SELECT SUM(is_a) AS na, SUM(is_b) AS nb FROM rows_t),
    gaps AS (
        SELECT CAST(greatest(0, max(cum.ca * tot.nb - cum.cb * tot.na))
                    AS BIGINT) AS dplus_num,
               CAST(greatest(0, max(cum.cb * tot.na - cum.ca * tot.nb))
                    AS BIGINT) AS dminus_num,
               CAST(count(*) AS BIGINT) AS n_values,
               CAST(tot.na AS BIGINT) AS na,
               CAST(tot.nb AS BIGINT) AS nb
        FROM cum, tot GROUP BY tot.na, tot.nb
    )
    SELECT na, nb, n_values, dplus_num, dminus_num,
           CAST(dplus_num + dminus_num AS DOUBLE)
               / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS kuiper_v,
           {KUIPER_C005} * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
               AS critical_005,
           CAST(dplus_num + dminus_num AS DOUBLE)
               / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
             > {KUIPER_C005} * sqrt((CAST(na AS DOUBLE)
                    + CAST(nb AS DOUBLE))
                / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS drift
    FROM gaps
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_kuiper_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kuiper drift test — V = D⁺ + D⁻, the sum of the
    largest ECDF gap in EACH direction, where KS takes only the larger
    of the two.  The practical payoffs: (a) equal sensitivity in both
    tails (KS is center-weighted — a source that simultaneously gains
    short and loses long documents can cancel in D but not in V), and
    (b) invariance under cyclic shifts of the support, making this the
    correct gate for circular metrics (hour-of-day, day-of-week
    ingestion mix) where KS's origin-dependence is a bug.  Same
    src0-vs-rest split over document length as quality_ks_drift_nchars,
    so the two verdicts are directly comparable.

    Exactness: both directed gaps are carried as EXACT INTEGER maxima
    of ca·nb − cb·na on the cumulative histogram (0-floored — the sup
    of an ECDF difference is ≥ 0 since the gap vanishes at ±∞); the
    only IEEE steps are the final division and the asymptotic critical
    line (1.747 literal, same convention as the KS/AD gates).

    Scale: identical to the KS kernel — one map-side-combined groupBy
    to the value-distinct histogram, one cumulative window over
    DISTINCT VALUES (bin continuous columns first), scalar output."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    is_a = (F.col("source") == "src0").cast("bigint")
    rows_t = d.select(
        F.col("n_chars").alias("v"),
        is_a.alias("is_a"),
        (1 - is_a).alias("is_b"),
    )
    hist = rows_t.groupBy("v").agg(
        F.sum("is_a").alias("ca_i"), F.sum("is_b").alias("cb_i")
    )
    w = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "v",
        F.sum("ca_i").over(w).alias("ca"),
        F.sum("cb_i").over(w).alias("cb"),
    )
    tot = rows_t.agg(
        F.sum("is_a").alias("na"), F.sum("is_b").alias("nb")
    )
    j = cum.crossJoin(F.broadcast(tot))
    gplus = F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")
    gaps = j.groupBy("na", "nb").agg(
        F.greatest(F.lit(0), F.max(gplus))
        .cast("bigint")
        .alias("dplus_num"),
        F.greatest(F.lit(0), F.max(-gplus))
        .cast("bigint")
        .alias("dminus_num"),
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
    )
    v_stat = (
        (F.col("dplus_num") + F.col("dminus_num")).cast("double")
        / (F.col("na").cast("double") * F.col("nb").cast("double"))
    )
    crit = F.lit(KUIPER_C005) * F.sqrt(
        (F.col("na").cast("double") + F.col("nb").cast("double"))
        / (F.col("na").cast("double") * F.col("nb").cast("double"))
    )
    return gaps.select(
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
        "n_values",
        "dplus_num",
        "dminus_num",
        v_stat.alias("kuiper_v"),
        crit.alias("critical_005"),
        (v_stat > crit).alias("drift"),
    )


# ---------------------------------------------------------------------------
# Blomqvist beta (median quadrant association) — exact order-statistic
# medians + one counting aggregate
# ---------------------------------------------------------------------------


@register(
    "quality_blomqvist_beta_hourly",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(SUM(CASE WHEN event_type = 'click'
                             THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    mx AS (
        SELECT x AS med_x FROM (
            SELECT x, row_number() OVER (ORDER BY x) AS rn,
                   count(*) OVER () AS n
            FROM hourly
        ) WHERE rn = (n + 1) // 2
    ),
    my AS (
        SELECT y AS med_y FROM (
            SELECT y, row_number() OVER (ORDER BY y) AS rn,
                   count(*) OVER () AS n
            FROM hourly
        ) WHERE rn = (n + 1) // 2
    ),
    q AS (
        SELECT
            CAST(count(*) AS BIGINT) AS n_hours,
            CAST(SUM(CASE WHEN x > med_x AND y > med_y
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_pp,
            CAST(SUM(CASE WHEN x < med_x AND y < med_y
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_mm,
            CAST(SUM(CASE WHEN x > med_x AND y < med_y
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_pm,
            CAST(SUM(CASE WHEN x < med_x AND y > med_y
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_mp,
            CAST(SUM(CASE WHEN x = med_x OR y = med_y
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_on_median,
            CAST(any_value(med_x) AS BIGINT) AS med_x,
            CAST(any_value(med_y) AS BIGINT) AS med_y
        FROM hourly, mx, my
    )
    SELECT n_hours, med_x, med_y, n_pp, n_mm, n_pm, n_mp, n_on_median,
           CAST(n_pp + n_mm - n_pm - n_mp AS DOUBLE)
               / CAST(n_pp + n_mm + n_pm + n_mp AS DOUBLE) AS beta
    FROM q
    """,
    tags=("quality", "statistics", "robust"),
)
def quality_blomqvist_beta_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Blomqvist's β (1950 medial correlation) between hourly click and
    purchase volumes — the cheapest member of the association ladder
    (Pearson → Spearman → Kendall → Hoeffding → dCor): sign agreement
    relative to the MEDIANS, β = (n₊₊ + n₋₋ − n₊₋ − n₋₊)/(total off
    median), maximally robust (50% breakdown in each margin) and the
    one association number a monitoring dashboard can afford on every
    tick.  Points lying ON either median are excluded from the
    denominator (the classical discrete-margin convention) and
    reported in n_on_median so the exclusion mass is auditable.

    Exactness: both medians are the engine's standard LOWER order
    statistic at rank ⌈n/2⌉ ((n+1) div 2 — the lower-median convention
    of quality_length_outlier_mad), quadrant counts are exact integer
    comparisons against them, and the single IEEE step is the final
    ratio.

    Scale: one scan → hour grid (map-side combined); the median rank
    windows run over the GRID (time-span-sized — the Kendall/Hoeffding
    discipline); production frontier for an entity-scale variant is
    frontier.quantile_cuts(mode="approx") exactly as the Lorenz/RFM
    swap; one broadcast of the two scalars; one counting aggregate."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("y"),
    )

    def lower_median(col: str, out: str) -> DataFrame:
        w = Window.orderBy(col)
        wn = Window.partitionBy()
        return (
            hourly.select(
                F.col(col),
                F.row_number().over(w).alias("rn"),
                F.count(F.lit(1)).over(wn).alias("n"),
            )
            .filter(F.col("rn") == F.expr("(n + 1) div 2"))
            .select(F.col(col).cast("bigint").alias(out))
        )

    meds = lower_median("x", "med_x").crossJoin(
        lower_median("y", "med_y")
    )
    j = hourly.crossJoin(F.broadcast(meds))
    q = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum(
            F.when(
                (F.col("x") > F.col("med_x"))
                & (F.col("y") > F.col("med_y")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_pp"),
        F.sum(
            F.when(
                (F.col("x") < F.col("med_x"))
                & (F.col("y") < F.col("med_y")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_mm"),
        F.sum(
            F.when(
                (F.col("x") > F.col("med_x"))
                & (F.col("y") < F.col("med_y")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_pm"),
        F.sum(
            F.when(
                (F.col("x") < F.col("med_x"))
                & (F.col("y") > F.col("med_y")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_mp"),
        F.sum(
            F.when(
                (F.col("x") == F.col("med_x"))
                | (F.col("y") == F.col("med_y")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_on_median"),
        F.any_value(F.col("med_x")).alias("med_x"),
        F.any_value(F.col("med_y")).alias("med_y"),
    )
    return q.select(
        "n_hours",
        "med_x",
        "med_y",
        "n_pp",
        "n_mm",
        "n_pm",
        "n_mp",
        "n_on_median",
        (
            (
                F.col("n_pp")
                + F.col("n_mm")
                - F.col("n_pm")
                - F.col("n_mp")
            ).cast("double")
            / (
                F.col("n_pp")
                + F.col("n_mm")
                + F.col("n_pm")
                + F.col("n_mp")
            ).cast("double")
        ).alias("beta"),
    )


# ---------------------------------------------------------------------------
# Watson U² two-sample drift (cyclic CvM variant) — exact integer
# mean-centered gap sums on the shared histogram walk
# ---------------------------------------------------------------------------

#: Asymptotic 5% critical value of Watson's U² statistic (published
#: table value of the limiting distribution — asymptotic, like the KS
#: 1.358 / CvM 0.461 / Kuiper 1.747 gates).
WATSON_U2_CRIT_005 = 0.187


@register(
    "quality_watson_u2_drift",
    oracle=f"""
    WITH rows_t AS (
        SELECT n_chars AS v,
               CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_a,
               CASE WHEN source = 'src0' THEN 0 ELSE 1 END AS is_b
        FROM documents
    ),
    hist AS (
        SELECT v, SUM(is_a) AS ca_i, SUM(is_b) AS cb_i
        FROM rows_t GROUP BY v
    ),
    cum AS (
        SELECT v, ca_i + cb_i AS m,
               SUM(ca_i) OVER (ORDER BY v) AS ca,
               SUM(cb_i) OVER (ORDER BY v) AS cb
        FROM hist
    ),
    tot AS (SELECT SUM(is_a) AS na, SUM(is_b) AS nb FROM rows_t),
    sums AS (
        SELECT CAST(SUM(m * (ca * tot.nb - cb * tot.na)) AS BIGINT)
                   AS s1,
               CAST(SUM(m * (ca * tot.nb - cb * tot.na)
                          * (ca * tot.nb - cb * tot.na)) AS BIGINT)
                   AS s2,
               CAST(count(*) AS BIGINT) AS n_values,
               CAST(tot.na AS BIGINT) AS na,
               CAST(tot.nb AS BIGINT) AS nb
        FROM cum, tot GROUP BY tot.na, tot.nb
    ),
    parts AS (
        SELECT na, nb, n_values,
               CAST((na + nb) * s2 - s1 * s1 AS BIGINT) AS u2_num
        FROM sums
    )
    SELECT na, nb, n_values, u2_num,
           CAST(u2_num AS DOUBLE)
               / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                  * CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
                  * CAST(na + nb AS DOUBLE)) AS watson_u2,
           CAST(u2_num AS DOUBLE)
               / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                  * CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
                  * CAST(na + nb AS DOUBLE))
             > {WATSON_U2_CRIT_005} AS drift
    FROM parts
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_watson_u2_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watson's U² two-sample drift test — the MEAN-CENTERED CvM:
    U² = (na·nb/N²)·Σᵢ(dᵢ − d̄)² over the N combined observations,
    dᵢ = F_A(xᵢ) − F_B(xᵢ).  Subtracting the mean gap makes U²
    invariant under CYCLIC rotations of the support — the CvM-class
    companion of quality_kuiper_drift (sup-metric) and the correct
    quadratic-EDF gate for circular metrics (hour-of-day, day-of-week
    mix), while on the line it behaves like CvM with equalized tail
    sensitivity.  Same src0-vs-rest split over document length as the
    KS/CvM/AD/Kuiper family, so all five verdicts line up on one
    dashboard row.

    Exactness: with gᵥ = ca·nb − cb·na and multiplicity mᵥ on the
    distinct-value walk, U²·na·nb·N³ = N·Σmg² − (Σmg)² — carried as
    ONE exact BIGINT (u2_num); the only IEEE steps are the final
    division and the asymptotic 0.187 critical line.  The replay test
    pins the rotation-invariance theorem itself: cyclically shifting
    the binned support leaves u2_num unchanged.

    Scale: the KS kernel verbatim — one map-side-combined histogram
    groupBy, one cumulative window over DISTINCT VALUES (bin
    continuous columns first), scalar output."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    is_a = (F.col("source") == "src0").cast("bigint")
    rows_t = d.select(
        F.col("n_chars").alias("v"),
        is_a.alias("is_a"),
        (1 - is_a).alias("is_b"),
    )
    hist = rows_t.groupBy("v").agg(
        F.sum("is_a").alias("ca_i"), F.sum("is_b").alias("cb_i")
    )
    w = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "v",
        (F.col("ca_i") + F.col("cb_i")).alias("m"),
        F.sum("ca_i").over(w).alias("ca"),
        F.sum("cb_i").over(w).alias("cb"),
    )
    tot = rows_t.agg(
        F.sum("is_a").alias("na"), F.sum("is_b").alias("nb")
    )
    j = cum.crossJoin(F.broadcast(tot))
    g = F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")
    sums = j.groupBy("na", "nb").agg(
        F.sum(F.col("m") * g).cast("bigint").alias("s1"),
        F.sum(F.col("m") * g * g).cast("bigint").alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
    )
    n_comb = F.col("na") + F.col("nb")
    u2_num = (n_comb * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "bigint"
    )
    parts = sums.select(
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
        "n_values",
        u2_num.alias("u2_num"),
    )
    denom = (
        F.col("na").cast("double")
        * F.col("nb").cast("double")
        * (F.col("na") + F.col("nb")).cast("double")
        * (F.col("na") + F.col("nb")).cast("double")
        * (F.col("na") + F.col("nb")).cast("double")
    )
    u2 = F.col("u2_num").cast("double") / denom
    return parts.select(
        "na",
        "nb",
        "n_values",
        "u2_num",
        u2.alias("watson_u2"),
        (u2 > F.lit(WATSON_U2_CRIT_005)).alias("drift"),
    )


# ---------------------------------------------------------------------------
# Circadian drift: Watson U² + Kuiper on the hour-of-day circle,
# clicks vs purchases — the cyclic gates applied to a genuinely
# circular metric
# ---------------------------------------------------------------------------


@register(
    "quality_circadian_drift_clicks_purchases",
    oracle=f"""
    WITH rows_t AS (
        SELECT CAST(hour(ts) AS BIGINT) AS v,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_b
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    hist AS (
        SELECT v, SUM(is_a) AS ca_i, SUM(is_b) AS cb_i
        FROM rows_t GROUP BY v
    ),
    cum AS (
        SELECT v, ca_i + cb_i AS m,
               SUM(ca_i) OVER (ORDER BY v) AS ca,
               SUM(cb_i) OVER (ORDER BY v) AS cb
        FROM hist
    ),
    tot AS (SELECT SUM(is_a) AS na, SUM(is_b) AS nb FROM rows_t),
    sums AS (
        SELECT CAST(SUM(m * (ca * tot.nb - cb * tot.na)) AS BIGINT)
                   AS s1,
               CAST(SUM(m * (ca * tot.nb - cb * tot.na)
                          * (ca * tot.nb - cb * tot.na)) AS BIGINT)
                   AS s2,
               CAST(greatest(0, max(ca * tot.nb - cb * tot.na))
                    AS BIGINT) AS dplus_num,
               CAST(greatest(0, max(cb * tot.na - ca * tot.nb))
                    AS BIGINT) AS dminus_num,
               CAST(count(*) AS BIGINT) AS n_hours_present,
               CAST(tot.na AS BIGINT) AS na,
               CAST(tot.nb AS BIGINT) AS nb
        FROM cum, tot GROUP BY tot.na, tot.nb
    )
    SELECT na, nb, n_hours_present,
           CAST((na + nb) * s2 - s1 * s1 AS BIGINT) AS u2_num,
           dplus_num, dminus_num,
           CAST((na + nb) * s2 - s1 * s1 AS DOUBLE)
               / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                  * CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
                  * CAST(na + nb AS DOUBLE)) AS watson_u2,
           CAST(dplus_num + dminus_num AS DOUBLE)
               / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS kuiper_v,
           CAST((na + nb) * s2 - s1 * s1 AS DOUBLE)
               / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                  * CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
                  * CAST(na + nb AS DOUBLE))
             > {WATSON_U2_CRIT_005} AS circadian_drift
    FROM sums
    """,
    tags=("quality", "drift", "statistics", "circular"),
)
def quality_circadian_drift_clicks_purchases(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Circadian-mix drift: do PURCHASES follow the same hour-of-day
    profile as CLICKS?  Hour-of-day is a genuinely CIRCULAR variable —
    23:00 and 00:00 are neighbors — so the linear KS/CvM gates are
    origin-dependent there (their verdict would change if the day
    'started' at a different hour), and this op deploys BOTH
    rotation-invariant statistics on the shared 24-point walk: Watson's
    U² (quadratic, the verdict gate at the asymptotic 0.187 line) and
    Kuiper's V (sup-form, reported alongside).  A click→purchase
    funnel whose conversions lag into different hours shows up here
    before it shows up in volume; the test pins that both numbers are
    invariant to rotating the 24-hour dial, which is the entire point.

    Exactness: identical integer carriers as the parent ops —
    u2_num = N·Σmg² − (Σmg)² and the two 0-floored directed gap
    maxima, all BIGINT on the hour histogram; IEEE only in the two
    final divisions and the critical line.

    Scale: ONE scan with the hour() projection pushed to it, one
    map-side-combined 24-row histogram, one 24-row window — the
    cheapest drift gate in the registry; state and output are
    O(24) forever."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_a = (F.col("event_type") == "click").cast("bigint")
    rows_t = ev.select(
        F.hour("ts").cast("bigint").alias("v"),
        is_a.alias("is_a"),
        (1 - is_a).alias("is_b"),
    )
    hist = rows_t.groupBy("v").agg(
        F.sum("is_a").alias("ca_i"), F.sum("is_b").alias("cb_i")
    )
    w = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "v",
        (F.col("ca_i") + F.col("cb_i")).alias("m"),
        F.sum("ca_i").over(w).alias("ca"),
        F.sum("cb_i").over(w).alias("cb"),
    )
    tot = rows_t.agg(
        F.sum("is_a").alias("na"), F.sum("is_b").alias("nb")
    )
    j = cum.crossJoin(F.broadcast(tot))
    g = F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")
    sums = j.groupBy("na", "nb").agg(
        F.sum(F.col("m") * g).cast("bigint").alias("s1"),
        F.sum(F.col("m") * g * g).cast("bigint").alias("s2"),
        F.greatest(F.lit(0), F.max(g)).cast("bigint").alias("dplus_num"),
        F.greatest(F.lit(0), F.max(-g))
        .cast("bigint")
        .alias("dminus_num"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours_present"),
    )
    n_comb = (F.col("na") + F.col("nb")).cast("bigint")
    u2_num = (n_comb * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "bigint"
    )
    u2 = u2_num.cast("double") / (
        F.col("na").cast("double")
        * F.col("nb").cast("double")
        * n_comb.cast("double")
        * n_comb.cast("double")
        * n_comb.cast("double")
    )
    kv = (F.col("dplus_num") + F.col("dminus_num")).cast("double") / (
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    return sums.select(
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
        "n_hours_present",
        u2_num.alias("u2_num"),
        "dplus_num",
        "dminus_num",
        u2.alias("watson_u2"),
        kv.alias("kuiper_v"),
        (u2 > F.lit(WATSON_U2_CRIT_005)).alias("circadian_drift"),
    )


# ---------------------------------------------------------------------------
# Cucconi two-sample location-scale test — exact squared-midrank sums
# on the shared histogram walk
# ---------------------------------------------------------------------------

#: 5% critical value of the asymptotic Cucconi C statistic: under H0,
#: C is asymptotically standard-bivariate-normal quadratic, giving
#: p ≈ exp(−C) (Cucconi 1968; Marozzi 2009) — so the 5% line is
#: −ln(0.05), full double precision (asymptotic, like the KS/AD/Kuiper
#: gates).
CUCCONI_CRIT_005 = 2.995732273553991

#: Shared final-step arithmetic for the Cucconi C statistic, written
#: ONCE as SQL text and executed verbatim by both engines (F.expr on
#: the Spark side) so the IEEE operation order is identical.  Inputs:
#: na, nb (BIGINT), s4 = Σ_A(2a)² and t4 = Σ_A(2(N+1)−2a)² (BIGINT
#: squared doubled-midrank sums over sample A), with N = na + nb.
_CUCCONI_C_EXPR = (
    "(power((CAST(s4 AS DOUBLE) / 4.0"
    " - CAST(na AS DOUBLE) * CAST(na + nb + 1 AS DOUBLE)"
    "   * CAST(2 * (na + nb) + 1 AS DOUBLE) / 6.0)"
    " / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
    "   * CAST(na + nb + 1 AS DOUBLE)"
    "   * CAST(2 * (na + nb) + 1 AS DOUBLE)"
    "   * CAST(8 * (na + nb) + 11 AS DOUBLE) / 180.0), 2)"
    " + power((CAST(t4 AS DOUBLE) / 4.0"
    " - CAST(na AS DOUBLE) * CAST(na + nb + 1 AS DOUBLE)"
    "   * CAST(2 * (na + nb) + 1 AS DOUBLE) / 6.0)"
    " / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
    "   * CAST(na + nb + 1 AS DOUBLE)"
    "   * CAST(2 * (na + nb) + 1 AS DOUBLE)"
    "   * CAST(8 * (na + nb) + 11 AS DOUBLE) / 180.0), 2)"
    " - 2.0 * (2.0 * (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)"
    "   - 4.0)"
    "   / (CAST(2 * (na + nb) + 1 AS DOUBLE)"
    "      * CAST(8 * (na + nb) + 11 AS DOUBLE)) - 1.0)"
    " * ((CAST(s4 AS DOUBLE) / 4.0"
    " - CAST(na AS DOUBLE) * CAST(na + nb + 1 AS DOUBLE)"
    "   * CAST(2 * (na + nb) + 1 AS DOUBLE) / 6.0)"
    " / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
    "   * CAST(na + nb + 1 AS DOUBLE)"
    "   * CAST(2 * (na + nb) + 1 AS DOUBLE)"
    "   * CAST(8 * (na + nb) + 11 AS DOUBLE) / 180.0))"
    " * ((CAST(t4 AS DOUBLE) / 4.0"
    " - CAST(na AS DOUBLE) * CAST(na + nb + 1 AS DOUBLE)"
    "   * CAST(2 * (na + nb) + 1 AS DOUBLE) / 6.0)"
    " / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
    "   * CAST(na + nb + 1 AS DOUBLE)"
    "   * CAST(2 * (na + nb) + 1 AS DOUBLE)"
    "   * CAST(8 * (na + nb) + 11 AS DOUBLE) / 180.0)))"
    " / (2.0 * (1.0"
    " - power(2.0 * (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)"
    "   - 4.0)"
    "   / (CAST(2 * (na + nb) + 1 AS DOUBLE)"
    "      * CAST(8 * (na + nb) + 11 AS DOUBLE)) - 1.0, 2)))"
)


@register(
    "quality_cucconi_drift",
    oracle=f"""
    WITH rows_t AS (
        SELECT n_chars AS v,
               CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_a,
               CASE WHEN source = 'src0' THEN 0 ELSE 1 END AS is_b
        FROM documents
    ),
    hist AS (
        SELECT v, SUM(is_a) AS ca_i, SUM(is_b) AS cb_i
        FROM rows_t GROUP BY v
    ),
    walk AS (
        SELECT v, ca_i,
               coalesce(SUM(ca_i + cb_i) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS lt,
               ca_i + cb_i AS m
        FROM hist
    ),
    tot AS (SELECT SUM(is_a) AS na, SUM(is_b) AS nb FROM rows_t),
    sums AS (
        SELECT CAST(tot.na AS BIGINT) AS na,
               CAST(tot.nb AS BIGINT) AS nb,
               CAST(SUM(w.ca_i * (2 * w.lt + w.m + 1)
                              * (2 * w.lt + w.m + 1)) AS BIGINT) AS s4,
               CAST(SUM(w.ca_i
                    * (2 * (tot.na + tot.nb + 1) - (2 * w.lt + w.m + 1))
                    * (2 * (tot.na + tot.nb + 1) - (2 * w.lt + w.m + 1)))
                    AS BIGINT) AS t4
        FROM walk w, tot GROUP BY tot.na, tot.nb
    )
    SELECT na, nb, s4, t4,
           {_CUCCONI_C_EXPR} AS cucconi_c,
           exp(-({_CUCCONI_C_EXPR})) AS p_asymptotic,
           {_CUCCONI_C_EXPR} > {CUCCONI_CRIT_005} AS drift
    FROM sums
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_cucconi_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cucconi two-sample location-SCALE drift test — the rank test
    that watches BOTH moments at once: C combines the standardized sum
    of squared ranks (U, scale-and-location sensitive from the right)
    with the standardized sum of squared CONTRARY ranks (V, from the
    left), C = (U² + V² − 2ρUV)/(2(1−ρ²)), predating and often
    out-powering the better-known Lepage combination.  The MW gate
    (quality_mannwhitney_drift) misses a pure variance change and
    Bartlett/Brown-Forsythe miss a pure shift; a corpus source whose
    document lengths drift in EITHER moment trips this single gate.
    Same src0-vs-rest split over n_chars as the EDF family, so all the
    drift verdicts line up on one dashboard row.

    Exactness: midranks on the doubled grid — 2a = 2·(#below) + m + 1
    on the distinct-value walk — make Σ_A(2a)² and the contrary sum
    EXACT BIGINTs (s4/t4, hash-stable); U, V, ρ and C are evaluated
    from them in ONE shared SQL expression text (_CUCCONI_C_EXPR,
    F.expr'd on the Spark side) so the IEEE operation order matches
    bit-for-bit; the 5% line is the full-precision −ln(0.05) literal
    and p ≈ exp(−C) is reported alongside (asymptotic, like the KS/AD
    gates; ties enter through midranks, the standard large-sample
    treatment).

    Scale: the KS kernel verbatim — one map-side-combined histogram
    groupBy, one cumulative window over DISTINCT VALUES (bin
    continuous columns first), scalar output."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    is_a = (F.col("source") == "src0").cast("bigint")
    rows_t = d.select(
        F.col("n_chars").alias("v"),
        is_a.alias("is_a"),
        (1 - is_a).alias("is_b"),
    )
    hist = rows_t.groupBy("v").agg(
        F.sum("is_a").alias("ca_i"), F.sum("is_b").alias("cb_i")
    )
    w_lt = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    walk = hist.select(
        "ca_i",
        F.coalesce(
            F.sum(F.col("ca_i") + F.col("cb_i")).over(w_lt), F.lit(0)
        ).alias("lt"),
        (F.col("ca_i") + F.col("cb_i")).alias("m"),
    )
    tot = rows_t.agg(
        F.sum("is_a").alias("na"), F.sum("is_b").alias("nb")
    )
    j = walk.crossJoin(F.broadcast(tot))
    r2 = 2 * F.col("lt") + F.col("m") + 1
    r2c = 2 * (F.col("na") + F.col("nb") + 1) - r2
    sums = j.groupBy("na", "nb").agg(
        F.sum(F.col("ca_i") * r2 * r2).cast("bigint").alias("s4"),
        F.sum(F.col("ca_i") * r2c * r2c).cast("bigint").alias("t4"),
    )
    parts = sums.select(
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
        "s4",
        "t4",
    )
    return (
        parts.withColumn("cucconi_c", F.expr(_CUCCONI_C_EXPR))
        .withColumn("p_asymptotic", F.exp(-F.col("cucconi_c")))
        .withColumn(
            "drift", F.col("cucconi_c") > F.lit(CUCCONI_CRIT_005)
        )
    )


# ---------------------------------------------------------------------------
# Mood two-sample scale test — exact squared-central-midrank sum on
# the shared histogram walk
# ---------------------------------------------------------------------------

#: Shared final-step arithmetic for the Mood z-score (ONE SQL text,
#: both engines): M = m4/4, z = (M − na(N²−1)/12) /
#: sqrt(na·nb(N+1)(N²−4)/180), N = na+nb.
_MOOD_Z_EXPR = (
    "(CAST(m4 AS DOUBLE) / 4.0"
    " - CAST(na AS DOUBLE)"
    "   * (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE) - 1.0)"
    "   / 12.0)"
    " / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
    "   * CAST(na + nb + 1 AS DOUBLE)"
    "   * (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE) - 4.0)"
    "   / 180.0)"
)


@register(
    "quality_mood_scale_drift",
    oracle=f"""
    WITH rows_t AS (
        SELECT n_chars AS v,
               CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_a,
               CASE WHEN source = 'src0' THEN 0 ELSE 1 END AS is_b
        FROM documents
    ),
    hist AS (
        SELECT v, SUM(is_a) AS ca_i, SUM(is_b) AS cb_i
        FROM rows_t GROUP BY v
    ),
    walk AS (
        SELECT v, ca_i,
               coalesce(SUM(ca_i + cb_i) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS lt,
               ca_i + cb_i AS m
        FROM hist
    ),
    tot AS (SELECT SUM(is_a) AS na, SUM(is_b) AS nb FROM rows_t),
    sums AS (
        SELECT CAST(tot.na AS BIGINT) AS na,
               CAST(tot.nb AS BIGINT) AS nb,
               CAST(SUM(w.ca_i
                    * ((2 * w.lt + w.m + 1) - (tot.na + tot.nb + 1))
                    * ((2 * w.lt + w.m + 1) - (tot.na + tot.nb + 1)))
                    AS BIGINT) AS m4
        FROM walk w, tot GROUP BY tot.na, tot.nb
    )
    SELECT na, nb, m4,
           {_MOOD_Z_EXPR} AS z_mood,
           abs({_MOOD_Z_EXPR}) > {Z_CRIT_005} AS scale_drift
    FROM sums
    """,
    tags=("quality", "drift", "statistics"),
)
def quality_mood_scale_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mood two-sample SCALE test — the rank-based variance gate that
    completes the triad on one walk: Mann-Whitney watches pure
    location (quality_mannwhitney_drift), this watches pure scale
    (M = Σ_A (aᵢ − (N+1)/2)², large when sample A's lengths spread
    into both tails of the pooled ranking), and Cucconi
    (quality_cucconi_drift) watches both jointly.  Unlike
    Bartlett/Brown-Forsythe (quality_bartlett_homoscedasticity), Mood
    needs no moment assumptions — a heavy-tailed length distribution
    cannot fake it out through its variance estimate.  Same
    src0-vs-rest split over n_chars as the whole drift family.

    Exactness: on the doubled-midrank grid, (2a − (N+1)) is an exact
    integer deviation, so M4 = Σ_A(2a − (N+1))² = 4M is ONE exact
    BIGINT (hash-stable); z is evaluated from it in ONE shared SQL
    expression text (_MOOD_Z_EXPR) against the full-precision
    ±1.96 literal — asymptotic with midrank ties, the standard
    large-sample treatment (same caveat class as the MW/Cucconi
    gates).

    Scale: the KS kernel verbatim — one map-side-combined histogram
    groupBy, one cumulative window over DISTINCT VALUES, scalar
    output."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    is_a = (F.col("source") == "src0").cast("bigint")
    rows_t = d.select(
        F.col("n_chars").alias("v"),
        is_a.alias("is_a"),
        (1 - is_a).alias("is_b"),
    )
    hist = rows_t.groupBy("v").agg(
        F.sum("is_a").alias("ca_i"), F.sum("is_b").alias("cb_i")
    )
    w_lt = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    walk = hist.select(
        "ca_i",
        F.coalesce(
            F.sum(F.col("ca_i") + F.col("cb_i")).over(w_lt), F.lit(0)
        ).alias("lt"),
        (F.col("ca_i") + F.col("cb_i")).alias("m"),
    )
    tot = rows_t.agg(
        F.sum("is_a").alias("na"), F.sum("is_b").alias("nb")
    )
    j = walk.crossJoin(F.broadcast(tot))
    devi = (
        2 * F.col("lt") + F.col("m") + 1
        - (F.col("na") + F.col("nb") + 1)
    )
    sums = j.groupBy("na", "nb").agg(
        F.sum(F.col("ca_i") * devi * devi).cast("bigint").alias("m4")
    )
    parts = sums.select(
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
        "m4",
    )
    return (
        parts.withColumn("z_mood", F.expr(_MOOD_Z_EXPR))
        .withColumn(
            "scale_drift", F.abs(F.col("z_mood")) > F.lit(Z_CRIT_005)
        )
    )


# ---------------------------------------------------------------------------
# Train/held-out LM generalization gap — the memorization audit
# ---------------------------------------------------------------------------

#: Deterministic 90/10 document split for the generalization audit
#: (doc_id % HELDOUT_MOD == 0 → held out; the join_point_in_time_scd2
#: event_id % 17 probe convention).
HELDOUT_MOD = 10


@register(
    "quality_lm_train_heldout_gap",
    oracle=f"""
    WITH occ AS (
        SELECT doc_id, w,
               CASE WHEN doc_id % {HELDOUT_MOD} = 0
                    THEN 1 ELSE 0 END AS held
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
    ),
    vocab AS (
        SELECT w, count(*) AS c FROM occ WHERE held = 0 GROUP BY w
    ),
    consts AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_tok,
               CAST(count(*) AS BIGINT) AS v
        FROM vocab
    ),
    lm AS (
        SELECT w,
               CAST(round(-ln(CAST(c + 1 AS DOUBLE)
                              / (consts.n_tok + consts.v + 1)), 6)
                    AS DECIMAL(18,6)) AS surp
        FROM vocab, consts
    ),
    unk AS (
        SELECT CAST(round(-ln(1.0 / (consts.n_tok + consts.v + 1)), 6)
                    AS DECIMAL(18,6)) AS surp
        FROM consts
    ),
    wcnt AS (
        SELECT held, w, count(*) AS k FROM occ GROUP BY held, w
    ),
    scored AS (
        SELECT wc.held, wc.k,
               coalesce(lm.surp, unk.surp) AS surp,
               CASE WHEN lm.w IS NULL THEN wc.k ELSE 0 END AS oov_k
        FROM wcnt wc
        LEFT JOIN lm ON lm.w = wc.w
        CROSS JOIN unk
    ),
    sides AS (
        SELECT held,
               CAST(SUM(k) AS BIGINT) AS tokens,
               CAST(SUM(oov_k) AS BIGINT) AS oov_tokens,
               SUM(k * surp) AS surp_sum
        FROM scored GROUP BY held
    ),
    docs AS (
        SELECT CAST(SUM(CASE WHEN doc_id % {HELDOUT_MOD} <> 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_train_docs,
               CAST(SUM(CASE WHEN doc_id % {HELDOUT_MOD} = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_heldout_docs
        FROM documents
    ),
    wide AS (
        SELECT
            max(CASE WHEN held = 0 THEN tokens END) AS train_tokens,
            max(CASE WHEN held = 1 THEN tokens END) AS heldout_tokens,
            max(CASE WHEN held = 1 THEN oov_tokens END)
                AS heldout_oov_tokens,
            max(CASE WHEN held = 0 THEN surp_sum END) AS ts,
            max(CASE WHEN held = 1 THEN surp_sum END) AS hs
        FROM sides
    )
    SELECT d.n_train_docs, d.n_heldout_docs,
           w.train_tokens, w.heldout_tokens, w.heldout_oov_tokens,
           CAST(w.heldout_oov_tokens AS DOUBLE) / w.heldout_tokens
               AS oov_rate_heldout,
           CAST(w.ts AS DOUBLE) / w.train_tokens
               AS mean_surprisal_train,
           CAST(w.hs AS DOUBLE) / w.heldout_tokens
               AS mean_surprisal_heldout,
           CAST(w.hs AS DOUBLE) / w.heldout_tokens
               - CAST(w.ts AS DOUBLE) / w.train_tokens
               AS generalization_gap
    FROM wide w, docs d
    """,
    tags=("quality", "lm", "evaluation"),
)
def quality_lm_train_heldout_gap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train/held-out surprisal gap — the GENERALIZATION audit every
    corpus-trained quality model in the registry is missing: all the
    existing LM ops (unigram → 4-gram KN) train on the corpus they
    score, so their surprisals conflate model quality with
    memorization.  This op trains an add-one-smoothed unigram LM on
    the deterministic 90% document split (doc_id % {HELDOUT_MOD} ≠ 0)
    and scores BOTH sides: held-out mean surprisal minus train mean
    surprisal is the generalization gap — near zero for a split whose
    sides share the distribution (or a leaky split: pair with
    pipeline_split_leakage_audit), ballooning when the vocabulary is
    bursty/duplicated inside train (memorized mass scores cheap where
    it trained and expensive where it didn't).  Held-out OOV tokens
    take the UNK probability 1/(N+V+1) of the same Laplace frame and
    are reported as oov_rate_heldout beside the per-source OOV audit
    (quality_oov_rate_by_source).

    Exactness: per-word surprisal is round(−ln p, 6) DECIMAL(18,6)
    (the shared round-ln convention; Laplace numerator c+1 and
    denominator N+V+1 are exact integers), side sums are exact decimal
    k·surp accumulations over (side, word) counts, and the three
    output doubles divide/subtract identical operands on both engines.

    Scale: exactly the unigram LM's plan — ONE train-side
    groupBy(word) (Heaps-sublinear vocab, broadcastable), scoring
    joins on (side, word) COUNTS, never raw occurrences; the split
    predicate is a pushed-down integer filter, no shuffle added."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    held = (F.col("doc_id") % HELDOUT_MOD == 0).cast("int")
    occ = d.select(
        held.alias("held"),
        F.explode(F.split("text", " ")).alias("w"),
    )
    vocab = occ.filter(F.col("held") == 0).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    consts = vocab.agg(
        F.sum("c").cast("bigint").alias("n_tok"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    lm = vocab.crossJoin(F.broadcast(consts)).select(
        "w",
        F.round(
            -F.log(
                (F.col("c") + 1).cast("double")
                / (F.col("n_tok") + F.col("v") + 1)
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("surp"),
    )
    unk = consts.select(
        F.round(
            -F.log(
                F.lit(1.0)
                / (F.col("n_tok") + F.col("v") + 1)
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("unk_surp")
    )
    wcnt = occ.groupBy("held", "w").agg(
        F.count(F.lit(1)).alias("k")
    )
    scored = (
        wcnt.join(F.broadcast(lm), "w", "left")
        .crossJoin(F.broadcast(unk))
        .select(
            "held",
            "k",
            F.coalesce("surp", "unk_surp").alias("surp"),
            F.when(F.col("surp").isNull(), F.col("k"))
            .otherwise(F.lit(0))
            .alias("oov_k"),
        )
    )
    sides = scored.groupBy("held").agg(
        F.sum("k").cast("bigint").alias("tokens"),
        F.sum("oov_k").cast("bigint").alias("oov_tokens"),
        F.sum(F.col("k") * F.col("surp")).alias("surp_sum"),
    )
    docs = d.agg(
        F.sum(1 - held).cast("bigint").alias("n_train_docs"),
        F.sum(held).cast("bigint").alias("n_heldout_docs"),
    )
    wide = sides.agg(
        F.max(F.when(F.col("held") == 0, F.col("tokens"))).alias(
            "train_tokens"
        ),
        F.max(F.when(F.col("held") == 1, F.col("tokens"))).alias(
            "heldout_tokens"
        ),
        F.max(F.when(F.col("held") == 1, F.col("oov_tokens"))).alias(
            "heldout_oov_tokens"
        ),
        F.max(F.when(F.col("held") == 0, F.col("surp_sum"))).alias("ts"),
        F.max(F.when(F.col("held") == 1, F.col("surp_sum"))).alias("hs"),
    )
    mt = F.col("ts").cast("double") / F.col("train_tokens")
    mh = F.col("hs").cast("double") / F.col("heldout_tokens")
    return wide.crossJoin(F.broadcast(docs)).select(
        "n_train_docs",
        "n_heldout_docs",
        F.col("train_tokens").cast("bigint").alias("train_tokens"),
        F.col("heldout_tokens").cast("bigint").alias("heldout_tokens"),
        F.col("heldout_oov_tokens")
        .cast("bigint")
        .alias("heldout_oov_tokens"),
        (
            F.col("heldout_oov_tokens").cast("double")
            / F.col("heldout_tokens")
        ).alias("oov_rate_heldout"),
        mt.alias("mean_surprisal_train"),
        mh.alias("mean_surprisal_heldout"),
        (mh - mt).alias("generalization_gap"),
    )
