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
