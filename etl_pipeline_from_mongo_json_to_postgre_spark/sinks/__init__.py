"""Sinks: JDBC Postgres writer + DDL bootstrap (SURVEY §2.2 K1-K6)."""
