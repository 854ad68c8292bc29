"""Multimodal column plumbing (training-data pipeline extension).

Images/audio/video are carried as opaque ``binary`` columns with a
typed metadata struct. The Spark-side plumbing — schema, partitioning,
Arrow-batched UDF signatures, batch shapes — is real and tested; the
actual media decode is STUBBED (codec libraries are not available in
this environment): ``decode_image_stub`` raises NotImplementedError
unless ``deterministic_fake=True``, which produces a seeded fake
feature vector so the pipeline shape can be exercised end-to-end.

At 100 TB: binary payloads stay columnar in parquet, metadata columns
allow predicate pushdown (e.g. filter by mime/width) without touching
bytes; mapInPandas streams Arrow batches so decode memory is bounded
by batch size, not partition size.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..session import tune_for_oracle
from ..sources.parquet import fan_out, load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        # double, not float32: the moments are SQL-recomputable and
        # float32 would shift round()-boundary values vs the oracle
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def documents_as_media(spark, sf_dir) -> DataFrame:
    """Synthesize a media table from documents: utf-8 payload bytes +
    metadata. Stands in for an image/audio table with the same shape."""
    tune_for_oracle(spark)
    # fan_out: mapInPandas decode/feature batches single-thread on a
    # one-row-group scan otherwise
    d = fan_out(spark, load_table(spark, sf_dir, "documents"))
    # single-rowgroup local file -> 1 scan task; spread rows so the
    # Arrow-batched Python stages downstream use every core
    target = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < target // 2:
        d = d.repartition(target)
    payload = F.encode("text", "utf-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("mime"),
        payload.alias("payload"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )


def decode_image_stub(payload: bytes, deterministic_fake: bool = False) -> list[float]:
    """STUB: real decode needs PIL/ffmpeg (not in this container)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment; pass deterministic_fake=True for pipeline tests"
        )
    # seeded fake: 4 moments of the byte distribution, float32
    if payload is None or len(payload) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    mean = sum(payload) / n
    mn, mx = float(min(payload)), float(max(payload))
    return [float(n), float(mean), mn, mx]


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    decode would swap into _decode; Arrow batches bound memory."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image_stub(p, deterministic_fake=True)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing: mapInPandas pass that would decode -> resize ->
    re-encode. STUB keeps the byte payload and stamps the target
    dimensions into metadata; the Arrow batch shape, schema, and
    partition behavior are exactly what a PIL/opencv implementation
    would use."""
    out_schema = StructType(
        MEDIA_SCHEMA.fields
        + [StructField("width", LongType(), True), StructField("height", LongType(), True)]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            # real impl: pdf["payload"] = [reencode(resize(decode(p))) ...]
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(_resize, schema=out_schema)


def frame_sample_stub(df: DataFrame, every_n_bytes: int = 256,
                      max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: one output row
    per sampled frame (explode-shaped mapInPandas). STUB samples fixed
    byte offsets instead of decoded frames; the fan-out shape (row ->
    N frame rows with frame_no + frame_payload) matches an ffmpeg
    keyframe sampler."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_no", LongType(), False),
            StructField("frame_payload", BinaryType(), True),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    if i >= max_frames:
                        break
                    ids.append(mid)
                    frame_nos.append(i)
                    payloads.append(bytes(payload[off:off + every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame_payload": payloads}
            )

    return df.mapInPandas(_sample, schema=out_schema)


def mm_feature_extract(spark, sf_dir):
    """Oracle-checked slice of the Arrow-batched extract path: the fake
    feature vector's length/mean components are recomputable in SQL, so
    the full mapInPandas plumbing is verified end-to-end."""
    media = documents_as_media(spark, sf_dir)
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        F.element_at("features", 1).cast("double").alias("feat_len"),
        F.round(F.element_at("features", 2).cast("double"), 3).alias("feat_mean"),
    )


def mm_frame_sample_counts(spark, sf_dir):
    """Oracle-checked frame-sampling fan-out: frames per document =
    ceil(bytes/256) capped at 8; total sampled bytes recomputable."""
    media = documents_as_media(spark, sf_dir)
    frames = frame_sample_stub(media)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.sum(F.length("frame_payload")).alias("sampled_bytes"),
        F.max("frame_no").alias("last_frame"),
    )


def mm_binary_stats(spark, sf_dir):
    """Oracle-checked metadata query over the binary column: byte
    lengths computed without leaving the JVM (no decode)."""
    media = documents_as_media(spark, sf_dir)
    return media.groupBy("mime").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


def mm_payload_dedup(spark, sf_dir):
    """Exact binary dedup: canonical (lowest) media_id per identical
    payload + duplicate count — the first pass of any multimodal
    training-data pipeline (identical images/clips re-crawled under
    different ids).

    Scale shape: the shuffle key is (sha2-256(payload), n_bytes) — a
    40-byte digest per row instead of the payload itself; at 100 TB the
    media bytes never cross an exchange. The oracle groups on raw
    payload equality, so any digest collision would surface as a
    driver hash-mismatch (2^-128 odds)."""
    media = documents_as_media(spark, sf_dir)
    return (
        media.select(
            F.sha2("payload", 256).alias("_digest"),
            "n_bytes",
            "media_id",
        )
        .groupBy("_digest", "n_bytes")
        .agg(
            F.min("media_id").alias("media_id"),
            F.count("*").alias("dup_count"),
        )
        .select("media_id", "n_bytes", "dup_count")
    )


ORACLE_SQL = {
    "mm_payload_dedup": """
        SELECT min(doc_id) AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               count(*) AS dup_count
        FROM documents
        GROUP BY text
    """,
    "mm_binary_stats": """
        SELECT 'text/plain' AS mime,
               count(*) AS n_items,
               CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT)
                   AS total_bytes,
               max(CAST(octet_length(encode(text)) AS BIGINT)) AS max_bytes
        FROM documents
    """,
    # the testdata text is pure ASCII (verified), so utf-8 byte values
    # equal codepoints and the fake features are SQL-recomputable
    "mm_feature_extract": """
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(octet_length(encode(text)) AS DOUBLE) AS feat_len,
               round(list_aggregate(
                   list_transform(string_split(text, ''),
                                  c -> CAST(ord(c) AS DOUBLE)), 'avg'), 3)
                   AS feat_mean
        FROM documents
    """,
    "mm_frame_sample_counts": """
        SELECT doc_id AS media_id,
               CAST(least(ceil(octet_length(encode(text)) / 256.0), 8) AS BIGINT)
                   AS n_frames,
               CAST(least(octet_length(encode(text)), 8 * 256) AS BIGINT)
                   AS sampled_bytes,
               CAST(least(ceil(octet_length(encode(text)) / 256.0), 8) - 1 AS BIGINT)
                   AS last_frame
        FROM documents
        WHERE octet_length(encode(text)) > 0
    """,
}

QUERIES = {
    "mm_payload_dedup": mm_payload_dedup,
    "mm_binary_stats": mm_binary_stats,
    "mm_feature_extract": mm_feature_extract,
    "mm_frame_sample_counts": mm_frame_sample_counts,
}
