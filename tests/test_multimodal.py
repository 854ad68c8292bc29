"""Multimodal plumbing: binary columns, metadata, mapInPandas batches."""

import pytest

from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
    decode_image_stub,
    documents_as_media,
    extract_features,
)


def test_media_table_schema(spark, sf_dir):
    media = documents_as_media(spark, sf_dir)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "mime", "payload", "n_bytes",
    ]
    row = media.limit(1).collect()[0]
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"abc")


def test_extract_features_batched(spark, sf_dir):
    media = documents_as_media(spark, sf_dir).limit(20)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["features"]) == 4
        assert r["features"][0] == float(r["n_bytes"])  # moment 0 = length


def test_resize_stub_plumbing(spark, sf_dir):
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        documents_as_media, resize_stub,
    )
    media = documents_as_media(spark, sf_dir).limit(10)
    out = resize_stub(media, width=64, height=48)
    rows = out.collect()
    assert {r["width"] for r in rows} == {64}
    assert {r["height"] for r in rows} == {48}
    assert all(r["payload"] is not None for r in rows)


def test_frame_sample_stub_fanout(spark, sf_dir):
    from etl_pipeline_from_mongo_json_to_postgre_spark.operators.multimodal import (
        documents_as_media, frame_sample_stub,
    )
    media = documents_as_media(spark, sf_dir).limit(5)
    frames = frame_sample_stub(media, every_n_bytes=100, max_frames=3).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_id.items():
        assert [r["frame_no"] for r in sorted(rows, key=lambda r: r["frame_no"])] \
            == list(range(len(rows)))
        assert len(rows) <= 3
        assert all(len(r["frame_payload"]) <= 100 for r in rows)
