"""REAL nearest-neighbor PPM resize (operators/mm_resize.py): unit pins
vs a brute-force reference on both downsample and upsample shapes;
registry parity is covered by the sweep."""

import numpy as np

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.mm_resize import (
    OUT_H, OUT_W, resize_ppm_nearest,
)


def _ppm(w, h, raster):
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(raster)


def _brute(raster, w, h, out_h, out_w):
    img = np.array(raster, dtype=np.uint8).reshape(h, w, 3)
    out = np.zeros((out_h, out_w, 3), dtype=np.uint8)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = img[i * h // out_h, j * w // out_w]
    return out


def test_matches_bruteforce_on_down_and_upsample():
    rng = np.random.default_rng(7)
    for w, h in [(16, 12), (3, 2), (8, 8), (5, 11)]:
        raster = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8)
        got = resize_ppm_nearest(_ppm(w, h, raster.tobytes()))
        ref = _brute(raster, w, h, OUT_H, OUT_W)
        assert got["sum_bytes"] == int(ref.sum(dtype=np.int64))
        assert got["min_byte"] == int(ref.min())
        assert got["max_byte"] == int(ref.max())
        assert (got["out_h"], got["out_w"]) == (OUT_H, OUT_W)


def test_identity_when_shapes_match():
    rng = np.random.default_rng(11)
    raster = rng.integers(0, 256, size=OUT_W * OUT_H * 3, dtype=np.uint8)
    got = resize_ppm_nearest(_ppm(OUT_W, OUT_H, raster.tobytes()))
    assert got["sum_bytes"] == int(raster.sum(dtype=np.int64))
    assert got["min_byte"] == int(raster.min())
    assert got["max_byte"] == int(raster.max())
