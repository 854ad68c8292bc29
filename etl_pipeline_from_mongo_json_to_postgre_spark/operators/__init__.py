from .transform import missing_table_audit_rows, transform_collection

__all__ = ["missing_table_audit_rows", "transform_collection"]
