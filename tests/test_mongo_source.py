"""BSON normalization parity tests (reference ui/mongo_ingest.py:76-91)."""

from datetime import date, datetime, timezone

import pytest

from etl_pipeline_from_mongo_json_to_postgre_spark.errors import InputError
from etl_pipeline_from_mongo_json_to_postgre_spark.sources import mongo


class ObjectId:
    """Duck-typed stand-in for bson.ObjectId (not shipped in container)."""

    def __init__(self, hex_str="64f1b2c3d4e5f60718293a4b"):
        self.binary = bytes.fromhex(hex_str)
        self._hex = hex_str

    def __str__(self):
        return self._hex


def test_objectid_to_str():
    assert mongo.serialize_value(ObjectId()) == "64f1b2c3d4e5f60718293a4b"


def test_datetime_and_date_isoformat():
    dt = datetime(2024, 3, 5, 10, 11, 12, tzinfo=timezone.utc)
    assert mongo.serialize_value(dt) == "2024-03-05T10:11:12+00:00"
    assert mongo.serialize_value(date(2024, 3, 5)) == "2024-03-05"


def test_recursive_lists_and_dicts():
    doc = {
        "_id": ObjectId(),
        "tags": [ObjectId("0" * 24), {"when": date(2020, 1, 2)}],
        "nested": {"inner": [datetime(2021, 6, 7, 8, 9, 10)]},
        "n": 5,
        "flag": True,
        "s": "plain",
    }
    out = mongo.serialize_document(doc)
    assert out["_id"] == "64f1b2c3d4e5f60718293a4b"
    assert out["tags"][0] == "0" * 24
    assert out["tags"][1] == {"when": "2020-01-02"}
    assert out["nested"] == {"inner": ["2021-06-07T08:09:10"]}
    # scalars untouched (bool stays bool, not stringified)
    assert out["n"] == 5 and out["flag"] is True and out["s"] == "plain"


def test_localhost_guard():
    # reference ui/mongo_ingest.py:27-29
    mongo.validate_mongo_host("localhost")
    mongo.validate_mongo_host("127.0.0.1")
    with pytest.raises(InputError, match="localhost"):
        mongo.validate_mongo_host("db.prod.internal")


def test_connect_without_pymongo_raises():
    if mongo._MongoClient is not None:
        pytest.skip("pymongo installed")
    with pytest.raises(InputError, match="pymongo"):
        mongo.connect()


def test_export_with_fake_client():
    class FakeCollection:
        def __init__(self, docs):
            self._docs = docs

        def find(self):
            return iter(self._docs)

        def find_one(self):
            return self._docs[0] if self._docs else None

    class FakeDB(dict):
        pass

    client = {"appdb": {"users": FakeCollection([{"_id": ObjectId(), "v": 1}]),
                        "empty": FakeCollection([])}}
    out = mongo.export_collections(client, "appdb", ["users", "empty"])
    assert out["users"] == [{"_id": "64f1b2c3d4e5f60718293a4b", "v": 1}]
    assert out["empty"] == []
    preview = mongo.preview_first_documents(client, "appdb", ["users", "empty"])
    assert list(preview) == ["users"]


def test_mongo_docs_to_df_roundtrip(spark):
    df = mongo.mongo_docs_to_df(spark, [{"_id": ObjectId(), "ts": date(2024, 1, 2)}])
    row = df.collect()[0]
    import json
    doc = json.loads(row["raw_json"])
    assert doc == {"_id": "64f1b2c3d4e5f60718293a4b", "ts": "2024-01-02"}
