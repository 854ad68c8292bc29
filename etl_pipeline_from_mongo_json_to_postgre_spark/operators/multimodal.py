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
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..session import tune_for_oracle
from ..sources.parquet import load_table

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
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def documents_as_media(spark, sf_dir) -> DataFrame:
    """Synthesize a media table from documents: utf-8 payload bytes +
    metadata. Stands in for an image/audio table with the same shape."""
    tune_for_oracle(spark)
    d = load_table(spark, sf_dir, "documents")
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


def mm_binary_stats(spark, sf_dir):
    """Oracle-checked metadata query over the binary column: byte
    lengths computed without leaving the JVM (no decode)."""
    media = documents_as_media(spark, sf_dir)
    return media.groupBy("mime").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


ORACLE_SQL = {
    "mm_binary_stats": """
        SELECT 'text/plain' AS mime,
               count(*) AS n_items,
               sum(CAST(octet_length(encode(text)) AS BIGINT)) AS total_bytes,
               max(CAST(octet_length(encode(text)) AS BIGINT)) AS max_bytes
        FROM documents
    """,
}

QUERIES = {
    "mm_binary_stats": mm_binary_stats,
}
