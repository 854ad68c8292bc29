"""REAL image resize over a binary media column (upgrades multimodal's
resize_stub for the one raster format this environment can decode for
real): decode binary PPM -> nearest-neighbor resample to a fixed
OUT_H x OUT_W raster -> integer pixel stats, all inside Arrow-batched
mapInPandas (bounded decode memory — the 100 TB contract for media
columns; reference has no media ops, this is the prompt-mandated
multimodal extension family).

EXACT oracle: nearest-neighbor resampling of the closed-form synthetic
raster is itself closed-form — output pixel (i, j, c) reads source
pixel (i*h // OUT_H, j*w // OUT_W), whose byte value is
(media_id * k) % 256 with k = (src_y*w + src_x)*3 + c + 1 (the same
generation rule multimodal._ppm_bytes pins for the decoder) — so the
DuckDB side recomputes every resized pixel with integer arithmetic and
a flat unnested index, never touching bytes. A resize bug (transposed
axes, off-by-one in the index map, wrong rounding) breaks parity.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.types import LongType, StructField, StructType

from .multimodal import _media_ids, decode_ppm, documents_as_ppm_images

OUT_H = 8
OUT_W = 8

_RESIZE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("out_h", LongType(), True),
    StructField("out_w", LongType(), True),
    StructField("sum_bytes", LongType(), True),
    StructField("mean_milli", LongType(), True),
    StructField("min_byte", LongType(), True),
    StructField("max_byte", LongType(), True),
])


def resize_ppm_nearest(payload: bytes, out_h: int = OUT_H,
                       out_w: int = OUT_W) -> dict:
    """Decode a binary PPM and nearest-neighbor resample its raster to
    (out_h, out_w): output (i, j) reads source (i*h // out_h,
    j*w // out_w) — integer arithmetic only, so the result is exactly
    reproducible (no float rounding to diverge from the SQL oracle)."""
    import re

    import numpy as np

    meta = decode_ppm(payload)  # validates header + raster length
    w, h = meta["width"], meta["height"]
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", bytes(payload))
    raster = np.frombuffer(bytes(payload), dtype=np.uint8,
                           count=w * h * 3, offset=m.end()
                           ).reshape(h, w, 3)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    resized = raster[np.ix_(ys, xs)]
    total = int(resized.sum(dtype=np.int64))
    n = out_h * out_w * 3
    return {
        "out_h": out_h,
        "out_w": out_w,
        "sum_bytes": total,
        "mean_milli": total * 1000 // n,
        "min_byte": int(resized.min()),
        "max_byte": int(resized.max()),
    }


def mm_image_resize_stats(spark, sf_dir):
    """queries() entry: REAL decode -> REAL nearest-neighbor resize ->
    integer stats of the resized raster, per media payload."""
    imgs = documents_as_ppm_images(spark, sf_dir)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out.append({"media_id": mid, **resize_ppm_nearest(payload)})
            yield pd.DataFrame(out)

    return imgs.mapInPandas(_resize, schema=_RESIZE_SCHEMA)


QUERIES = {
    "mm_image_resize_stats": mm_image_resize_stats,
}

ORACLE_SQL = {
    # flat index t over OUT_H*OUT_W*3 output bytes: i = t // (OUT_W*3),
    # j = (t // 3) % OUT_W, c = t % 3; source pixel via integer floor
    # division; byte value from the synthetic generation rule.
    "mm_image_resize_stats": f"""
        WITH m AS (
            SELECT doc_id AS media_id,
                   4 + doc_id % 5 AS w,
                   4 + doc_id % 3 AS h
            FROM documents
        ), px AS (
            SELECT media_id,
                   (media_id * (((t // ({OUT_W} * 3)) * h // {OUT_H} * w
                                 + ((t // 3) % {OUT_W}) * w // {OUT_W})
                                * 3 + (t % 3) + 1)) % 256 AS b
            FROM m, unnest(range(0, {OUT_H} * {OUT_W} * 3)) AS u(t)
        )
        SELECT media_id,
               CAST({OUT_H} AS BIGINT) AS out_h,
               CAST({OUT_W} AS BIGINT) AS out_w,
               CAST(sum(b) AS BIGINT) AS sum_bytes,
               CAST(sum(b) * 1000 // ({OUT_H} * {OUT_W} * 3) AS BIGINT)
                   AS mean_milli,
               CAST(min(b) AS BIGINT) AS min_byte,
               CAST(max(b) AS BIGINT) AS max_byte
        FROM px GROUP BY media_id
    """,
}
