"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched pandas
iterators via ``mapInPandas`` (the only place Python touches rows, and it
sees columnar batches, not rows).  The actual media decode is STUBBED —
the container has no image/audio libraries — behind
:func:`decode_media_stub`; the Spark-side plumbing (schema, batch shape,
partitioning) is real and oracle-checked, because the stub's features are
deterministic functions of the bytes that DuckDB can reproduce.

Scale: mapInPandas is a narrow transformation — no shuffle; Arrow transfer
is ~columnar memcpy.  Batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch (default 10k); at 100 TB the
decode stage parallelizes per input split.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_processing_spark.registry import register
from kafka_stream_processing_spark.sources.tables import table

#: Output schema of the decode stage (what a real image decoder would emit).
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, fake_width int, fake_height int, "
    "checksum string"
)


def decode_media_stub(payload: bytes) -> dict:
    """Deterministic fake 'decode' of a media payload.

    A real implementation would dispatch on magic bytes to PIL/libav and
    raise NotImplementedError for unsupported codecs; here every derived
    feature is a pure function of the bytes so the whole pipeline is
    reproducible and oracle-checkable.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "fake_width": n % 640,
        "fake_height": (n * 7) % 480,
        "checksum": hashlib.md5(payload).hexdigest(),
    }


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [decode_media_stub(buf) for buf in pdf["payload"]]
        out = pd.DataFrame(feats)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


@register(
    "multimodal_decode_features",
    # The stub's features are byte-deterministic, so even the pandas-UDF
    # path gets a full DuckDB oracle: octet_length/md5 over the same bytes.
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
           CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS fake_height,
           md5(text) AS checksum
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: pack text as a binary payload (standing in
    for image bytes), run the decode stub via mapInPandas, emit typed
    features.  Exercises the exact plumbing a real decoder needs: binary
    column in, Arrow batches through Python, typed struct out."""
    d = table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_offset bigint, frame_hash string"


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
            n = len(buf)
            n_frames = n % 5 + 1  # a real sampler reads container metadata
            for idx in range(n_frames):
                offset = (n * (idx + 1)) // (n_frames + 1)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "frame_idx": idx,
                        "frame_offset": offset,
                        "frame_hash": hashlib.md5(buf[offset : offset + 16]).hexdigest(),
                    }
                )
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_offset", "frame_hash"])


@register(
    "multimodal_frame_sample",
    # Frame positions/hashes are byte-deterministic → SQL-checkable even
    # though the Spark side runs through Python.  DuckDB cannot slice
    # BLOBs, so the oracle slices the text — sound because the synthetic
    # docs are pure ASCII (byte slice == char slice).
    oracle="""
    WITH meta AS (
        SELECT doc_id, text,
               octet_length(encode(text)) AS n,
               octet_length(encode(text)) % 5 + 1 AS n_frames
        FROM documents
    )
    SELECT doc_id,
           CAST(idx AS INT) AS frame_idx,
           (n * (idx + 1)) // (n_frames + 1) AS frame_offset,
           md5(substr(text, CAST((n * (idx + 1)) // (n_frames + 1) AS INT) + 1, 16))
               AS frame_hash
    FROM meta, unnest(range(0, n_frames)) AS t(idx)
    """,
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-like payloads: a 1→N mapInPandas stage
    (each payload yields a variable number of frame records with offsets
    and content hashes).  The sampler itself is the stub — a real one
    seeks container keyframes — but the engine-visible contract (binary
    in, exploded typed frame rows out, narrow/no shuffle) is exactly what
    production needs."""
    d = table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(_sample_frames, schema=FRAME_SCHEMA)


@register(
    "multimodal_metadata_struct",
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           source AS origin,
           CAST(octet_length(encode(text)) > 256 AS BOOLEAN) AS is_large
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_metadata_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata pattern for opaque payloads: build the metadata
    struct JVM-side, then flatten — the schema contract every multimodal
    stage (decode, resize, frame-sample) consumes."""
    d = table(spark, sf_dir, "documents")
    meta = F.struct(
        F.lit("text/plain").alias("media_type"),
        F.length(F.encode("text", "utf-8")).cast("bigint").alias("payload_bytes"),
        F.col("source").alias("origin"),
    )
    return (
        d.select("doc_id", F.encode("text", "utf-8").alias("payload"), meta.alias("meta"))
        .select(
            "doc_id",
            F.col("meta.media_type").alias("media_type"),
            F.col("meta.payload_bytes").alias("payload_bytes"),
            F.col("meta.origin").alias("origin"),
            (F.col("meta.payload_bytes") > 256).alias("is_large"),
        )
    )


@register(
    "multimodal_payload_dedup",
    oracle="""
    WITH hashed AS (
        SELECT doc_id, md5(text) AS digest,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    SELECT digest,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
           CAST(min(n_bytes) AS BIGINT) AS payload_bytes,
           count(*) > 1 AS is_duplicated
    FROM hashed GROUP BY digest
    """,
    tags=("multimodal", "dedup"),
)
def multimodal_payload_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact dedup of opaque MEDIA payloads by content digest — the
    dedup family's scale rule (shuffle digests, never bodies) applied
    to the binary column: a 100 TB image/video corpus must never move
    payload bytes through an exchange, so each payload hashes to its
    16-byte md5 WHERE IT SITS (one narrow projection over the binary
    column) and only (digest, doc_id, n_bytes) rows shuffle into the
    digest groupBy; the keeper is the min doc_id (the
    dedup_exact_documents convention) and n_copies > 1 marks the
    redundant payloads a storage-dedup pass would reclaim.  The
    payload is the stub pipeline's utf-8 packing (multimodal module
    docstring), so DuckDB reproduces the digest from the text bytes —
    the plumbing under test is byte-level, not text-level.

    Scale: one scan + one digest-keyed map-side-combinable groupBy;
    shuffle volume is ~48 bytes/payload regardless of payload size.
    For petabyte media, sample-hash first (head+tail+length) and
    verify full digests only within sample-hash collisions — same
    plan, one extra narrow stage."""
    d = table(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id",
        F.md5(F.encode("text", "utf-8")).alias("digest"),
        F.length(F.encode("text", "utf-8")).cast("bigint").alias(
            "n_bytes"
        ),
    )
    return hashed.groupBy("digest").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        F.min("n_bytes").cast("bigint").alias("payload_bytes"),
        (F.count(F.lit(1)) > 1).alias("is_duplicated"),
    )


#: Resize target (square thumbnail edge), the standard vision-model
#: input side.
RESIZE_TARGET = 224

#: Output schema of the resize stage.
RESIZE_SCHEMA = (
    "doc_id bigint, in_width int, in_height int, out_width int, "
    "out_height int, resized_bytes bigint"
)


def resize_media_stub(payload: bytes) -> dict:
    """Deterministic fake 'resize' of a media payload: derives the fake
    source dims from the bytes (the decode stub's rule), then
    aspect-preserving fit into a RESIZE_TARGET square with pure INTEGER
    arithmetic (w·224 div max(w,h)) so both engines reproduce the dims
    exactly.  A real implementation would call PIL.Image.resize /
    swscale and raise NotImplementedError for unsupported codecs."""
    n = len(payload)
    w, h = n % 640, (n * 7) % 480
    m = max(w, h)
    if m == 0:
        ow = oh = 0
    else:
        ow = (w * RESIZE_TARGET) // m
        oh = (h * RESIZE_TARGET) // m
    return {
        "in_width": w,
        "in_height": h,
        "out_width": ow,
        "out_height": oh,
        "resized_bytes": ow * oh * 3,
    }


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [resize_media_stub(buf) for buf in pdf["payload"]]
        out = pd.DataFrame(feats)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


@register(
    "multimodal_resize",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id,
               octet_length(encode(text)) % 640 AS w,
               (octet_length(encode(text)) * 7) % 480 AS h
        FROM documents
    ),
    fit AS (
        SELECT doc_id, w, h,
               CASE WHEN greatest(w, h) = 0 THEN 0
                    ELSE (w * {RESIZE_TARGET}) // greatest(w, h)
               END AS ow,
               CASE WHEN greatest(w, h) = 0 THEN 0
                    ELSE (h * {RESIZE_TARGET}) // greatest(w, h)
               END AS oh
        FROM dims
    )
    SELECT doc_id,
           CAST(w AS INT) AS in_width,
           CAST(h AS INT) AS in_height,
           CAST(ow AS INT) AS out_width,
           CAST(oh AS INT) AS out_height,
           CAST(ow * oh * 3 AS BIGINT) AS resized_bytes
    FROM fit
    """,
    tags=("multimodal", "udf"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage for media payloads — the third member of the
    multimodal UDF pipeline (decode → RESIZE → frame-sample), run as an
    Arrow-batched ``mapInPandas`` stage over the binary column exactly
    like the decoder: per payload the stage derives source dimensions
    and fits them into a {RESIZE_TARGET}² square, aspect preserved,
    with pure integer arithmetic, emitting the resized dims and the
    RGB byte estimate a downstream batcher packs against.  The pixel
    work is STUBBED (no image libs in the container — see
    resize_media_stub) but every engine-visible property of a real
    resizer — binary in, typed struct out, 1→1 row contract, Arrow
    batch shape — is real and oracle-checked, because the stub's dims
    are pure functions of the byte length that DuckDB reproduces.

    Scale: narrow mapInPandas — no shuffle, parallel per input split,
    Arrow transfer bounded by maxRecordsPerBatch; the real resize is
    CPU-bound per payload and scales with cores exactly like this
    stub."""
    d = table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return payloads.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (banded Hamming)
# ---------------------------------------------------------------------------

#: Bits of the (stub) perceptual hash — the registry's 60-bit md5
#: convention, split into 4 bands of 15 bits for LSH bucketing.
PHASH_BITS = 60
PHASH_BANDS = 4
#: Maximum Hamming distance for a near-duplicate verdict.
PHASH_HAMMING_T = 8

PHASH_SCHEMA = "doc_id bigint, phash bigint"


def phash_stub(payload: bytes) -> int:
    """Deterministic stand-in for a perceptual hash: md5 of the
    case/whitespace-NORMALIZED bytes, truncated to 60 bits.  A real
    pHash would DCT the decoded pixels; the invariances it buys
    (resize, re-encode) are modeled here by the normalization (case +
    whitespace collapse), so payloads that differ only 'perceptually'
    collide at Hamming 0 while distinct content is ~uniform —
    byte-deterministic, hence fully oracle-checkable."""
    norm = b" ".join(payload.lower().split())
    return int(hashlib.md5(norm).hexdigest()[:15], 16)


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "phash": [phash_stub(buf) for buf in pdf["payload"]],
            }
        )


@register(
    "multimodal_phash_near_dup",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(trim(regexp_replace(
                   lower(text), '\\s+', ' ', 'g'))), 1, 15))
                   AS BIGINT) AS phash
        FROM documents
    ),
    bands AS (
        SELECT doc_id, phash, t.i AS band,
               (phash >> (15 * t.i)) & 32767 AS band_key
        FROM h, unnest(generate_series(0, {PHASH_BANDS - 1})) AS t(i)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.phash AS ha, b.phash AS hb
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(ha, hb)) <= {PHASH_HAMMING_T}
    """,
    tags=("multimodal", "dedup"),
)
def multimodal_phash_near_dup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Perceptual-hash near-duplicate detection for media payloads —
    the image-side twin of MinHash text dedup: a 60-bit pHash per
    payload (STUB: md5 of normalized bytes — see phash_stub; a real
    DCT pHash drops in with zero dataflow change), banded into
    {PHASH_BANDS}×15-bit LSH keys so candidate pairs come from
    BAND-KEY EQUI-JOINS (two payloads within Hamming
    {PHASH_HAMMING_T} of each other on 60 bits must agree exactly on
    ≥1 band by pigeonhole when distance < {PHASH_BANDS}), then the
    exact Hamming check is one XOR + bit_count.  The hash itself runs
    through the REAL multimodal plumbing — binary payload column,
    Arrow-batched mapInPandas — while the banding/bucketing/verdict
    is pure JVM bit arithmetic.

    Scale: the pigeonhole banding is what kills the all-pairs
    O(n²) — candidates are Σ per-bucket², bucketed on 15-bit keys;
    per-doc state is ONE integer (vs MinHash's K).  Identical to the
    dedup_minhash_lsh cost argument with a 1-int signature."""
    d = table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    h = payloads.mapInPandas(_phash_batches, schema=PHASH_SCHEMA)
    bands = h.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(*[F.lit(i) for i in range(PHASH_BANDS)])
        ).alias("band"),
    ).select(
        "doc_id",
        "phash",
        "band",
        F.expr(
            "shiftrightunsigned(phash, CAST(15 * band AS INT))"
            " % 32768"
        ).alias("band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("ha"),
            F.col("b.phash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(
        F.col("ha").bitwiseXOR(F.col("hb"))
    ).cast("int")
    return cand.select(
        "doc_a", "doc_b", ham.alias("hamming")
    ).filter(F.col("hamming") <= PHASH_HAMMING_T)
