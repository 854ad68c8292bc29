from .defaults import (
    AUDIT_COLUMNS,
    AUDIT_SCHEMA,
    AUDIT_TABLE,
    BUSINESS_COLUMNS,
    DEFAULT_DATE_FORMATS,
    RESERVED_COLUMNS,
    SUPPORTED_TYPES,
    default_app_config,
)
from .loader import (
    load_config,
    normalize_table_name,
    normalize_type,
    validate_app_config,
    validate_mapping_config,
)

__all__ = [
    "AUDIT_COLUMNS",
    "AUDIT_SCHEMA",
    "AUDIT_TABLE",
    "BUSINESS_COLUMNS",
    "DEFAULT_DATE_FORMATS",
    "RESERVED_COLUMNS",
    "SUPPORTED_TYPES",
    "default_app_config",
    "load_config",
    "normalize_table_name",
    "normalize_type",
    "validate_app_config",
    "validate_mapping_config",
]
