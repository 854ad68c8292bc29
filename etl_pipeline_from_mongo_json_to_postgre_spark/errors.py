"""Error taxonomy mirroring the reference's etl_pipeline/errors.py:1-10.

Three public error classes with identical meaning; unexpected runtime
failures are wrapped in LoadError by the pipeline orchestrator.
"""


class ConfigError(Exception):
    """Invalid or incomplete app/mapping configuration."""


class InputError(Exception):
    """Input file shape/content violates the collection-document contract."""


class LoadError(Exception):
    """Failure while loading data into the destination store."""
