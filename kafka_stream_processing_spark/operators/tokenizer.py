"""Tokenizer-aware operators: a merge-table (BPE-style) subword
tokenizer expressed as staged string rewrites, and sequence packing by
REAL token budget rather than whitespace-token budget.

Production training pipelines pack documents into fixed context windows
by the model tokenizer's token count, not by whitespace words (a 512-
token budget measured in words overfills by the subword expansion
factor).  A real BPE tokenizer applies an ordered merge table
iteratively over adjacent symbol pairs (Sennrich et al. 2016); here the
merge table is FIXED (as a shipped tokenizer's merges.txt is) and each
merge rank is applied as one global leftmost non-overlapping string
rewrite over the space-separated symbol sequence — a staged
approximation with identical semantics in Spark (``replace``) and the
DuckDB oracle (``replace``), generated from one Python merge list so
the two engines cannot drift.

Scale: tokenization is a narrow per-document expression chain
(pre-tokenize regex -> per-word char spacing -> K chained literal
replaces -> split/size), all inside whole-stage codegen — zero Python,
zero shuffle, divides by executor count.  Packing is the same
shard-scoped prefix-sum as ``corpus.pack_sequences_token_budget``: one
shuffle on the shard key serves the window and the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import fanout, table

#: Ordered merge table (rank order = application order), LEARNED from
#: the corpus by ``tools/train_bpe_merges.py`` (classic BPE: most
#: frequent adjacent pair per rank, applied with the same staged
#: rewrite the serve path uses) and pinned in ``_bpe_merges.py`` with a
#: bit-equality reproduction test — the same trainer→constant loop as
#: the ANN codebooks.  Each entry merges two EXISTING symbols, so later
#: ranks build on earlier ones exactly as in a real BPE merges.txt
#: ("a n"->"an", "c an"->"can", then "s can"->"scan").
from kafka_stream_processing_spark.operators._bpe_merges import (  # noqa: E402
    BPE_MERGES,
)

#: Pre-tokenizer: letter runs / digit runs / single punctuation — the
#: same class split a GPT-2-style regex pre-tokenizer performs.
PRETOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

#: Tokens per packed training sequence, measured in BPE tokens.
BPE_PACK_BUDGET = 512


def bpe_unit_count(w: Column) -> Column:
    """Number of BPE symbols a single pre-token tokenizes to: space the
    chars, apply every merge rank in order, count remaining symbols."""
    s = F.trim(F.regexp_replace(w, "(.)", "$1 "))
    for a, b in BPE_MERGES:
        s = F.replace(s, F.lit(f"{a} {b}"), F.lit(a + b))
    return F.size(F.split(s, " "))


def _bpe_units_sql(var: str) -> str:
    """The identical rewrite chain for the DuckDB oracle, generated from
    the same merge list."""
    s = f"trim(regexp_replace({var}, '(.)', '\\1 ', 'g'))"
    for a, b in BPE_MERGES:
        s = f"replace({s}, '{a} {b}', '{a}{b}')"
    return s


def bpe_token_count(text: Column | str) -> Column:
    """Total BPE tokens of a document: pre-tokenize, tokenize each
    pre-token, sum."""
    toks = F.regexp_extract_all(text, F.lit(PRETOKEN_RE), 0)
    return F.aggregate(
        F.transform(toks, lambda w: bpe_unit_count(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


_BPE_COUNT_SQL = (
    "CAST(coalesce(list_aggregate(list_transform("
    f"regexp_extract_all(text, '{PRETOKEN_RE}'), "
    f"w -> len(string_split({_bpe_units_sql('w')}, ' '))), 'sum'), 0) "
    "AS BIGINT)"
)


@register(
    "corpus_bpe_token_packing",
    oracle=f"""
    WITH counted AS (
        SELECT doc_id, lang,
               {_BPE_COUNT_SQL} AS n_bpe,
               len(string_split(text, ' ')) AS n_ws
        FROM documents
    ),
    packed AS (
        SELECT lang, doc_id, n_bpe, n_ws,
               sum(n_bpe) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_bpe
                   AS cum_prev
        FROM counted
    )
    SELECT lang,
           CAST(cum_prev // {BPE_PACK_BUDGET} AS BIGINT) AS seq_id,
           count(*) AS n_docs,
           CAST(sum(n_bpe) AS BIGINT) AS seq_bpe_tokens,
           CAST(sum(n_ws) AS BIGINT) AS seq_ws_tokens
    FROM packed
    GROUP BY 1, 2
    """,
    tags=("corpus", "tokenizer", "packing"),
)
def corpus_bpe_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware greedy sequence packing: documents are measured
    in BPE tokens (merge-table tokenizer above), laid out in
    deterministic doc_id order per shard key (lang), and assigned to the
    training sequence whose token range their starting offset falls in
    (seq_id = tokens_before_doc div BUDGET).  seq_ws_tokens rides along
    to expose the whitespace-vs-subword budget gap the naive packer
    (corpus.pack_sequences_token_budget) would have mis-packed by.

    Scale: the token count is a narrow codegen expression chain — the
    K-merge rewrite costs O(K * word_len) per word with zero Python and
    zero shuffle; packing reuses the shard-scoped prefix-sum argument of
    pack_sequences_token_budget (at 100 TB, shard by hash64(doc_id) % K
    for K independent packing problems; sequences never cross shards)."""
    d = fanout(table(spark, sf_dir, "documents"))
    counted = d.select(
        "doc_id",
        "lang",
        bpe_token_count("text").alias("n_bpe"),
        F.size(F.split("text", " ")).alias("n_ws"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = counted.withColumn(
        "cum_prev", F.sum("n_bpe").over(w) - F.col("n_bpe")
    )
    return (
        packed.withColumn(
            "seq_id", F.expr(f"cum_prev div {BPE_PACK_BUDGET}").cast("bigint")
        )
        .groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe").cast("bigint").alias("seq_bpe_tokens"),
            F.sum("n_ws").cast("bigint").alias("seq_ws_tokens"),
        )
    )


@register(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    WITH counted AS (
        SELECT lang,
               {_BPE_COUNT_SQL} AS n_bpe,
               len(string_split(text, ' ')) AS n_ws,
               len(text) AS n_chars
        FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
           CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws) AS fertility,
           CAST(SUM(n_bpe) * 100 AS DOUBLE) / SUM(n_chars)
               AS bpe_per_100_chars
    FROM counted
    GROUP BY lang
    """,
    tags=("tokenizer", "quality"),
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: BPE tokens per whitespace word and per
    100 characters, by language.  Fertility is THE go/no-go metric for a
    tokenizer on a multilingual corpus — a vocabulary trained on one
    language's pair statistics fragments the others (higher
    tokens/word), which silently taxes their effective context length
    and compute share; production pipelines gate tokenizer rollouts on
    exactly this per-language table (e.g. the fertility comparisons in
    the XLM-R and BLOOM tokenizer analyses).  Uses the TRAINED merge
    table (corpus_bpe_token_packing's kernel, one source for both
    engines), so the audit measures the very tokenizer the packer ships.
    Ratios are one IEEE double division of identical integer sums —
    bit-exact cross-engine.

    Scale: the BPE count is the same zero-shuffle codegen expression
    chain the packer uses; the audit aggregate is ONE groupBy(lang) over
    integer partials (map-side combine leaves ~languages×partitions
    rows), so the whole audit costs one corpus scan and a exchange of a
    few dozen rows."""
    d = fanout(table(spark, sf_dir, "documents"))
    counted = d.select(
        "lang",
        bpe_token_count("text").alias("n_bpe"),
        F.size(F.split("text", " ")).alias("n_ws"),
        F.length("text").alias("n_chars"),
    )
    return counted.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe").cast("bigint").alias("bpe_tokens"),
        F.sum("n_ws").cast("bigint").alias("ws_tokens"),
        F.sum("n_chars").cast("bigint").alias("chars"),
        (F.sum("n_bpe").cast("double") / F.sum("n_ws")).alias("fertility"),
        ((F.sum("n_bpe") * 100).cast("double") / F.sum("n_chars")).alias(
            "bpe_per_100_chars"
        ),
    )
