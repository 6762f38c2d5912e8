"""BPE merge-table trainer — closes the trainer→tokenizer loop.

``operators/tokenizer.py`` serves against a MODEL CONSTANT (the ordered
BPE merge table), exactly as the ANN operators serve against the
trained codebooks in ``operators/_codebooks.py``.  This module is the
TRAIN side: classic BPE learning (Sennrich et al. 2016) — start from
characters, repeatedly take the most frequent adjacent symbol pair and
add it as the next merge — run against the SAME staged-rewrite
semantics the serve path applies (each merge is one global leftmost
non-overlapping string rewrite over the space-joined symbol sequence),
so the learned table and the applied table mean the same thing.

Determinism: word frequencies come from one Spark aggregation over the
pre-tokenized corpus; the argmax tie-breaks lexicographically on the
pair; the learning loop itself is pure Python over the collected
vocabulary.  Collecting the vocabulary is the trainer's model-artifact
collect (the analog of the codebook trainer's K×DIM collect): every
real BPE trainer runs from a word-frequency table, which is vocabulary-
sized, not corpus-sized — at 100 TB the count aggregation is one
shuffle and the collected artifact is a few thousand rows.

The loop is closed by ``tests/test_round5b_ops.py::
test_trained_bpe_merges_reproduce``, which re-runs this trainer at
TRAIN_SF and asserts the pinned ``operators/_bpe_merges.py`` literals
match bit-for-bit.

Usage::

    python -m kafka_stream_processing_spark.tools.train_bpe_merges
"""

from __future__ import annotations

import os
from collections import Counter

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

#: Corpus the pinned merge table was trained on (sf0.001 carries the
#: same synthetic vocabulary as every larger sf).
TRAIN_SF = "/root/testdata/sf0.001"

#: Number of merge ranks to learn.
N_MERGES = 18


def word_frequencies(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Pre-token frequencies over the documents corpus — the standard
    BPE trainer input.  One explode + one count aggregation."""
    from kafka_stream_processing_spark.operators.tokenizer import PRETOKEN_RE
    from kafka_stream_processing_spark.sources.tables import table

    rows = (
        table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.regexp_extract_all("text", F.lit(PRETOKEN_RE), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    return {r["w"]: r["cnt"] for r in rows}


def train_merges(
    wordcounts: dict[str, int], n_merges: int = N_MERGES
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` ranks.  State per word is the space-joined
    symbol string; each chosen merge is applied with str.replace — the
    IDENTICAL leftmost non-overlapping global rewrite Spark's
    ``replace`` and DuckDB's ``replace`` perform at serve time, so the
    learner optimizes exactly the representation the tokenizer will
    produce (including the staged approximation's cross-boundary
    artifacts — self-consistency over purity)."""
    seqs = {w: " ".join(w) for w in wordcounts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter[tuple[str, str]] = Counter()
        for w, cnt in wordcounts.items():
            syms = seqs[w].split(" ")
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += cnt
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        pat, rep = f"{best[0]} {best[1]}", best[0] + best[1]
        for w in seqs:
            seqs[w] = seqs[w].replace(pat, rep)
    return merges


def render(merges: list[tuple[str, str]], sf_dir: str) -> str:
    lines = [
        '"""Trained BPE merge table — GENERATED, do not hand-edit.',
        "",
        "Produced by ``python -m kafka_stream_processing_spark.tools.",
        f"train_bpe_merges`` over ``{sf_dir}`` (deterministic: Spark word",
        "frequencies, lexicographic tie-break, staged-rewrite-consistent",
        "pair application).  The reproduction test",
        "(tests/test_round5b_ops.py::test_trained_bpe_merges_reproduce)",
        "re-trains and asserts equality, so these literals can never",
        'drift from the trainer that claims to produce them."""',
        "",
        f"TRAIN_SF = {sf_dir!r}",
        "",
        f"BPE_MERGES: tuple[tuple[str, str], ...] = {tuple(merges)!r}",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("train-bpe-merges")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    merges = train_merges(word_frequencies(spark, TRAIN_SF))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "operators",
        "_bpe_merges.py",
    )
    with open(out, "w") as fh:
        fh.write(render(merges, TRAIN_SF))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
