"""Corpus-assembly operators: the step between a filtered document pool
and a tokenizer-ready training set.

Four operations every large-scale pretraining pipeline runs that none of
the other modules cover:

- **sequence packing** (``pack_sequences_token_budget``): concatenate
  documents in deterministic order and chop into fixed token-budget
  training sequences — the packing that turns a variable-length corpus
  into fixed-shape batches;
- **benchmark contamination** (``contamination_ngram_overlap``): flag
  training documents sharing word n-grams with a held-out benchmark
  partition — the eval-integrity scan run before any training job;
- **repetition metric** (``quality_dup_ngram_fraction``): the
  duplicated-n-gram occurrence fraction (Gopher/CCNet-style repetition
  signal over OCCURRENCES, complementing quality_gopher_filters'
  top-single-word rule);
- **incremental ingestion dedup** (``dedup_incremental_new_batch``):
  admit a new document batch against an existing corpus fingerprint set
  — dedup as a streaming-ingest contract, not a one-shot batch job.

The reference has no corpus surface at all (it processes one JSON event
stream, UniqueUsersCounter.java:63-93); these operators are part of the
engine's training-data extension, same charter as operators/pipeline.py.

Cross-engine determinism follows the package conventions: md5-derived
hashing only (dedup.hash64), integer cross-product thresholds, every
computed column aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_stream_processing_spark.operators.dedup import _word_shingles
from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import fanout, table

#: Tokens per packed training sequence (a stand-in for a model's context
#: length; the packing math is budget-agnostic).
PACK_BUDGET = 512

#: DuckDB expression for all (non-distinct) word-3-gram occurrences of a
#: token list ``t`` — the same construction as dedup.JACCARD_ORACLE's
#: shingle CTE minus the DISTINCT.
_GRAMS_SQL = (
    "list_transform(range(1, greatest(len(t) - 1, 1)), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])"
)


def _word_grams_all(toks: Column, n: int = 3) -> Column:
    """ALL word n-gram occurrences (duplicates kept — unlike
    dedup._word_shingles, which is distinct-per-doc), for occurrence-
    weighted repetition metrics."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + off) for off in range(n)]
    )
    return F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


@register(
    "pack_sequences_token_budget",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT lang, doc_id, n_tokens,
               sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS cum_prev
        FROM toks
    )
    SELECT lang,
           CAST(cum_prev // {PACK_BUDGET} AS BIGINT) AS seq_id,
           count(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
    FROM packed
    GROUP BY 1, 2
    """,
    tags=("corpus", "packing"),
)
def pack_sequences_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: documents are laid out in deterministic
    (shard, doc_id) order and assigned to the training sequence whose
    token range their starting offset falls in — ``seq_id =
    tokens_before_doc div BUDGET``.  Output audits each sequence's doc
    count and token fill (a seq_tokens far above BUDGET means one doc
    straddles into it — the consumer's truncate/continue policy decides).

    Scale: packing is a prefix-sum, and a prefix-sum over ONE global
    order is a single-partition sort — so the order is scoped per shard
    key (here ``lang``; at 100 TB a hash-bucket shard key
    ``hash64(doc_id) % K`` gives K independent, embarrassingly parallel
    packing problems, which is exactly how packing shards onto a
    cluster: sequences never cross shard boundaries).  One shuffle on
    the shard key serves both the window and the final per-sequence
    aggregate."""
    d = fanout(table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = toks.withColumn(
        "cum_prev", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        packed.withColumn(
            "seq_id", F.expr(f"cum_prev div {PACK_BUDGET}").cast("bigint")
        )
        .groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
        )
    )


@register(
    "contamination_ngram_overlap",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, source, sh FROM (
            SELECT doc_id, source,
                   unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                       AS sh
            FROM toks
            WHERE len(t) >= 3
        )
    ),
    bench AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0'),
    train AS (SELECT doc_id, sh FROM sh WHERE source <> 'src0'),
    totals AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY 1),
    shared AS (
        SELECT t.doc_id, count(*) AS n_shared
        FROM train t JOIN bench b ON b.sh = t.sh
        GROUP BY 1
    )
    SELECT s.doc_id, t.n_shingles, s.n_shared
    FROM shared s JOIN totals t ON t.doc_id = s.doc_id
    """,
    tags=("corpus", "contamination"),
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: the docs of one source partition
    ('src0') stand in for a held-out benchmark suite; every OTHER
    document is scored by how many of its distinct word-3-grams also
    occur anywhere in the benchmark.  Emits only docs with ≥1 shared
    shingle (doc_id, n_shingles, n_shared) — the decontamination
    drop-list, thresholded by the consumer (e.g. drop when
    ``n_shared * 10 >= n_shingles``).

    Scale: the benchmark side of the join is the distinct shingle set of
    the EVAL SUITE — a few MB even for large benchmarks — so it is
    broadcast and the 100 TB training side joins without shuffling raw
    text (map-side semi join on the shingle); only matched (doc_id,
    shingle) pairs reach the count shuffle.  This is the decontamination
    architecture from the Gopher/GPT-3 appendices re-expressed as a
    broadcast equi-join."""
    d = fanout(table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    sh = d.select(
        "doc_id", "source", F.explode(_word_shingles(toks)).alias("sh")
    ).distinct()
    bench = (
        sh.filter(F.col("source") == "src0").select("sh").distinct()
    )
    train = sh.filter(F.col("source") != "src0").select("doc_id", "sh")
    totals = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    shared = (
        train.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return shared.join(totals, "doc_id").select(
        "doc_id", "n_shingles", "n_shared"
    )


@register(
    "quality_dup_ngram_fraction",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   AS gram
        FROM toks
        WHERE len(t) >= 3
    ),
    counted AS (
        SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup,
           (SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) * 5 <= SUM(c))
               AS ok_repetition
    FROM counted
    GROUP BY doc_id
    """,
    tags=("corpus", "quality"),
)
def quality_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occurrence-weighted repetition metric: per document, the number of
    3-gram OCCURRENCES belonging to a gram that appears ≥2 times in that
    document (Gopher's duplicate-n-gram-fraction family).  The keep rule
    is the integer cross-product ``n_dup * 5 <= n_grams`` (dup fraction
    ≤ 20%) so the frontier is bit-exact on both engines.  Docs shorter
    than one gram carry no signal and emit no row (same convention as
    the oracle's ``len(t) >= 3`` guard).

    Scale: unlike quality_gopher_filters' higher-order-function rule
    (O(distinct × words) per doc, zero shuffle), this explodes
    occurrences and aggregates on (doc_id, gram) — one narrow shuffle of
    hashed-size keys, the right trade once per-doc distinct counts grow;
    both formulations ship deliberately, pick by corpus shape."""
    d = fanout(table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    grams = d.select(
        "doc_id", F.explode(_word_grams_all(toks)).alias("gram")
    )
    counted = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    dup_occ = F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
    return counted.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_grams"),
        dup_occ.cast("bigint").alias("n_dup"),
        (dup_occ * 5 <= F.sum("c")).alias("ok_repetition"),
    )


@register(
    "dedup_incremental_new_batch",
    oracle="""
    WITH batch AS (
        SELECT doc_id, source, md5(text) AS h
        FROM documents WHERE doc_id % 5 = 0
    ),
    corpus AS (
        SELECT DISTINCT md5(text) AS h
        FROM documents WHERE doc_id % 5 <> 0
    ),
    ranked AS (
        SELECT b.doc_id, b.source,
               (c.h IS NOT NULL) AS in_corpus,
               row_number() OVER (PARTITION BY b.h ORDER BY b.doc_id) AS rn
        FROM batch b LEFT JOIN corpus c ON c.h = b.h
    )
    SELECT source,
           count(*) AS n_batch,
           CAST(SUM(CASE WHEN in_corpus THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_corpus,
           CAST(SUM(CASE WHEN NOT in_corpus AND rn > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_batch,
           CAST(SUM(CASE WHEN NOT in_corpus AND rn = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_accepted
    FROM ranked
    GROUP BY source
    """,
    tags=("corpus", "dedup", "incremental"),
)
def dedup_incremental_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: a new batch (every 5th doc_id,
    simulating today's crawl) is admitted against the existing corpus's
    exact-text fingerprint set.  A batch doc is rejected if its md5
    already exists in the corpus (n_dup_corpus), or if an earlier batch
    doc carries the same text (n_dup_batch, lowest doc_id wins);
    accepted counts are audited per source.

    Scale: this is exact dedup restructured as a CONTRACT between runs —
    the corpus side is a pre-computed fingerprint table (32-char digests,
    not bodies) that each daily batch left-joins on hash, so daily cost
    is O(batch + matched fingerprints), never a corpus rescan.  The
    within-batch tie-break is a window over the batch only.  Both
    shuffles (join, window) ride the same hash key; at 100 TB the
    fingerprint table is itself hash-bucketed on h so the join
    co-locates without a corpus-side shuffle."""
    d = table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", "source", F.md5(F.col("text").cast("binary")).alias("h")
    )
    corpus = (
        d.filter(F.col("doc_id") % 5 != 0)
        .select(F.md5(F.col("text").cast("binary")).alias("h"))
        .distinct()
    )
    ranked = (
        batch.join(
            corpus.withColumn("in_corpus", F.lit(True)), "h", "left"
        )
        .withColumn(
            "in_corpus", F.coalesce(F.col("in_corpus"), F.lit(False))
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("h").orderBy("doc_id")),
        )
    )
    flag = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_batch"),
        flag(F.col("in_corpus")).alias("n_dup_corpus"),
        flag(~F.col("in_corpus") & (F.col("rn") > 1)).alias("n_dup_batch"),
        flag(~F.col("in_corpus") & (F.col("rn") == 1)).alias("n_accepted"),
    )
