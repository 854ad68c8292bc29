"""Deterministic sampling keys shared by every rerun-stable operator.

One Knuth multiplicative scramble, one modulus — defined ONCE so the
Spark expressions and their DuckDB oracle twins (built via
``scrambled_key_sql``) can never drift apart. Used by:
text_queries.sample_hash_mod / sample_stratified, corpus.pack_sequences
/ sample_domain_mix / sample_token_budget, kmeans._init_centroids.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH_MULT = 2654435761          # Knuth multiplicative hash constant
SCRAMBLE_MOD = 1_000_000_007     # large prime; keeps products in BIGINT


def scrambled_key(col: Column, mod: int = SCRAMBLE_MOD) -> Column:
    """Order-scrambling integer key: pure arithmetic, identical on
    every engine / rerun / task retry (never rand())."""
    return F.pmod(col * F.lit(KNUTH_MULT), F.lit(mod))


def scrambled_key_sql(expr: str, mod: int = SCRAMBLE_MOD) -> str:
    """The identical computation as SQL text for DuckDB oracles
    (non-negative inputs: % == pmod)."""
    return f"(({expr}) * {KNUTH_MULT}) % {mod}"
