"""Config loading + validation (parity with reference etl_pipeline/config_loader.py).

Pure driver-side metadata handling: YAML/JSON dispatch by extension
(reference config_loader.py:13-33), app-config validation (:36-123),
mapping-config validation (:126-152) and type-closure validation
(:155-171). Raises ConfigError with actionable messages, same taxonomy
as the reference (errors.py:1-10).
"""

from __future__ import annotations

import json
import os
from typing import Any

from ..errors import ConfigError
from .defaults import SUPPORTED_TYPES, default_app_config

try:
    import yaml  # PyYAML ships with pyspark images; gate anyway
except ImportError:  # pragma: no cover
    yaml = None


def normalize_type(type_name: str) -> str:
    """Lowercase/strip a logical type name (reference type_utils.py:1-6)."""
    return str(type_name).strip().lower()


def load_config(path: str) -> dict:
    """Load a YAML or JSON config file, dispatched on extension.

    Parity: reference config_loader.py:13-33.
    """
    if not os.path.exists(path):
        raise ConfigError(f"config file not found: {path}")
    ext = os.path.splitext(path)[1].lower()
    with open(path, "r", encoding="utf-8") as fh:
        if ext in (".yaml", ".yml"):
            if yaml is None:
                raise ConfigError("PyYAML not available for YAML config")
            data = yaml.safe_load(fh)
        elif ext == ".json":
            data = json.load(fh)
        else:
            raise ConfigError(f"unsupported config extension: {ext}")
    if not isinstance(data, dict):
        raise ConfigError(f"config root must be a mapping: {path}")
    return data


def _require(d: dict, key: str, ctx: str) -> Any:
    if key not in d:
        raise ConfigError(f"missing required key '{key}' in {ctx}")
    return d[key]


def validate_app_config(config: dict) -> dict:
    """Validate app config; fill defaults for missing runtime knobs.

    Parity: reference config_loader.py:36-123 (required sections,
    date-format list non-empty, type-mapping closure).
    """
    if not isinstance(config, dict):
        raise ConfigError("app config must be a mapping")
    merged = default_app_config()
    for section in ("database", "runtime", "audit", "logging"):
        sec = config.get(section)
        if sec is not None:
            if not isinstance(sec, dict):
                raise ConfigError(f"app config section '{section}' must be a mapping")
            merged[section].update(sec)
    runtime = merged["runtime"]
    formats = _require(runtime, "date_formats", "runtime")
    if not isinstance(formats, list) or not formats:
        raise ConfigError("runtime.date_formats must be a non-empty list")
    tm = _require(runtime, "type_mappings", "runtime")
    if not isinstance(tm, dict) or not tm:
        raise ConfigError("runtime.type_mappings must be a non-empty mapping")
    runtime["type_mappings"] = {normalize_type(k): v for k, v in tm.items()}
    return merged


def validate_mapping_config(mapping_config: dict, type_mappings: dict | None = None) -> dict:
    """Validate a mapping config of shape
    ``{collection: {target_table, raw_json_column?, object_id_attribute?,
    mappings: {source_attr: {column, type}}}}``.

    Parity: reference config_loader.py:126-171 (every mapping needs
    column+type; every type supported and present in type_mappings;
    duplicate target columns rejected, schema_manager.py:39-43).
    """
    if not isinstance(mapping_config, dict) or not mapping_config:
        raise ConfigError("mapping config must be a non-empty mapping")
    # reference config files nest everything under a top-level
    # ``collections:`` key (config/mapping_config.yaml:1); accept both
    # the wrapped and flat shapes, return flat.
    if set(mapping_config) == {"collections"}:
        mapping_config = mapping_config["collections"]
        if not isinstance(mapping_config, dict) or not mapping_config:
            raise ConfigError("mapping config 'collections' must be a non-empty mapping")
    known_types = set(SUPPORTED_TYPES)
    if type_mappings:
        known_types &= {normalize_type(t) for t in type_mappings}
    out: dict[str, dict] = {}
    for coll, spec in mapping_config.items():
        if not isinstance(spec, dict):
            raise ConfigError(f"mapping for collection '{coll}' must be a mapping")
        target_table = _require(spec, "target_table", f"collection '{coll}'")
        mappings = _require(spec, "mappings", f"collection '{coll}'")
        if not isinstance(mappings, dict) or not mappings:
            raise ConfigError(f"collection '{coll}' has no attribute mappings")
        seen_cols: set[str] = set()
        norm_mappings: dict[str, dict] = {}
        for attr, m in mappings.items():
            if not isinstance(m, dict):
                raise ConfigError(f"mapping '{coll}.{attr}' must be a mapping")
            column = _require(m, "column", f"mapping '{coll}.{attr}'")
            mtype = normalize_type(_require(m, "type", f"mapping '{coll}.{attr}'"))
            if mtype not in known_types:
                raise ConfigError(
                    f"unsupported type '{mtype}' for mapping '{coll}.{attr}'"
                )
            if column in seen_cols:
                raise ConfigError(
                    f"duplicate target column '{column}' in collection '{coll}'"
                )
            seen_cols.add(column)
            norm_mappings[attr] = {"column": column, "type": mtype}
        out[coll] = {
            "target_table": str(target_table),
            "raw_json_column": spec.get("raw_json_column", "raw_json"),
            "object_id_attribute": spec.get("object_id_attribute"),
            "mappings": norm_mappings,
        }
    return out


def normalize_table_name(name: str, default_schema: str = "public") -> str:
    """Lowercase schema-qualified table name (reference schema_utils.py:24-26)."""
    name = str(name).strip().lower()
    if "." not in name:
        return f"{default_schema}.{name}"
    return name
