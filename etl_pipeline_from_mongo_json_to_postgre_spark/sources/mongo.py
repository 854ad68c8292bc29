"""MongoDB source (reference S3, ui/mongo_ingest.py).

Two layers:

1. **BSON normalization** — pure-Python serialization of Mongo-native
   types into JSON-friendly values, mirroring the reference exactly
   (ui/mongo_ingest.py:76-91): ObjectId -> str, datetime/date ->
   isoformat, recursive through lists/dicts. Works on any object with
   the duck-typed shape, so it is fully testable without pymongo or a
   server (a tiny FakeObjectId stands in).

2. **Collection export / scan** — pymongo-gated (the container ships no
   pymongo): full-collection find() serialized into the engine's
   multi-collection JSON shape ``{collection: [doc, ...]}``
   (ui/mongo_ingest.py:94-105), plus first-doc preview (S4,
   ui/mapping_editor.py:391-409) and the reference's localhost-only
   guard (ui/mongo_ingest.py:27-29).

At scale the staged-JSON hop is replaced by the Spark Mongo connector
(``spark.read.format("mongodb")``) which partition-splits collections
server-side; the normalization rules here define the column semantics
either path must produce, and ``mongo_docs_to_df`` feeds either into
the same MappingPlan projection.
"""

from __future__ import annotations

import json
from datetime import date, datetime
from typing import Any, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession

from ..errors import InputError

try:  # pragma: no cover - not installed in the test container
    from bson import ObjectId as _BsonObjectId
except ImportError:
    _BsonObjectId = None

try:  # pragma: no cover
    from pymongo import MongoClient as _MongoClient
except ImportError:
    _MongoClient = None


def _is_object_id(value: Any) -> bool:
    if _BsonObjectId is not None and isinstance(value, _BsonObjectId):
        return True
    # duck-typed stand-in (tests; alternate bson libs): class literally
    # named ObjectId with binary payload attr
    return type(value).__name__ == "ObjectId" and hasattr(value, "binary")


def serialize_value(value: Any) -> Any:
    """BSON value -> JSON-friendly value (reference ui/mongo_ingest.py:81-91).

    Order matters: datetime before date is irrelevant (isoformat both),
    but ObjectId must be checked before the generic fallthrough, and
    bool/int/str pass through untouched.
    """
    if _is_object_id(value):
        return str(value)
    if isinstance(value, (datetime, date)):
        return value.isoformat()
    if isinstance(value, list):
        return [serialize_value(item) for item in value]
    if isinstance(value, dict):
        return {key: serialize_value(item) for key, item in value.items()}
    return value


def serialize_document(document: Mapping[str, Any]) -> dict[str, Any]:
    """Reference ui/mongo_ingest.py:76-78."""
    return {key: serialize_value(value) for key, value in document.items()}


def validate_mongo_host(host: str) -> None:
    """Reference localhost-only guard (ui/mongo_ingest.py:27-29)."""
    if host not in {"localhost", "127.0.0.1"}:
        raise InputError("MongoDB host must be localhost.")


def _require_pymongo():
    if _MongoClient is None:
        raise InputError(
            "pymongo is not installed; stage the collection as JSON "
            "(serialize_document + json.dump) or install pymongo."
        )
    return _MongoClient


def connect(host: str = "localhost", port: int = 27017,
            username: str = "", password: str = "", auth_db: str = ""):
    """Reference ui/mongo_ingest.py:59-74 (optional-credential connect)."""
    validate_mongo_host(host)
    MongoClient = _require_pymongo()
    client_args: dict[str, Any] = {"host": host, "port": port}
    if username:
        client_args["username"] = username
        client_args["password"] = password
        if auth_db:
            client_args["authSource"] = auth_db
    return MongoClient(**client_args)


def export_collections(client, database_name: str,
                       collection_names: Iterable[str]) -> dict[str, list]:
    """Full-scan export into the engine's multi-collection shape
    (reference ui/mongo_ingest.py:94-105, minus the file hop)."""
    out: dict[str, list] = {}
    for name in collection_names:
        docs = client[database_name][name].find()
        out[name] = [serialize_document(doc) for doc in docs]
    return out


def preview_first_documents(client, database_name: str,
                            collection_names: Iterable[str]) -> dict[str, dict]:
    """find_one() per collection for schema inference (reference S4,
    ui/mapping_editor.py:391-409)."""
    out: dict[str, dict] = {}
    for name in collection_names:
        doc = client[database_name][name].find_one()
        if doc is not None:
            out[name] = serialize_document(doc)
    return out


def stage_to_json(data: Mapping[str, list], path: str) -> str:
    """Persist an export in the reference's staged-file format
    (ui/mongo_ingest.py:100-105)."""
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(data, fh, indent=2)
    return path


def mongo_docs_to_df(spark: SparkSession, docs: list[dict]) -> DataFrame:
    """Serialized documents -> raw-JSON DataFrame ready for a
    MappingPlan projection (same hand-off as the JSON source)."""
    from .json_source import collections_to_raw_df

    return collections_to_raw_df(spark, {"_": [serialize_document(d) for d in docs]})["_"]
