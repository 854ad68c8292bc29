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
    every engine / rerun / task retry (never rand()).

    DEGENERACY CAVEAT (r10 review): for any modulus m dividing
    KNUTH_MULT - 1 (= 2^4 * 3 * 5 * ...: all of 2, 4, 5, 8, 10, 16,
    20, ...), KNUTH_MULT ≡ 1 (mod m) and this is the IDENTITY
    ``col % m`` — no scrambling at all. The house small mods hit this:
    SHARDS=8 / MANIFEST_SHARDS=16 shard sprays and the mod-2/mod-10
    batch slices are plain round-robin strides. That is fine where
    only retry-stable membership and an even spray are needed (shard
    assignment; round-robin is an even spray by construction), but NOT
    where id-order decorrelation is load-bearing (splits, sampled
    slices of id-structured corpora) — there use a non-dividing mod
    (100, 1000, SCRAMBLE_MOD) or ``scrambled_bucket``."""
    return F.pmod(col * F.lit(KNUTH_MULT), F.lit(mod))


def scrambled_key_sql(expr: str, mod: int = SCRAMBLE_MOD) -> str:
    """The identical computation as SQL text for DuckDB oracles
    (non-negative inputs: % == pmod). Same degeneracy caveat as
    ``scrambled_key``."""
    return f"(({expr}) * {KNUTH_MULT}) % {mod}"


def scrambled_bucket(col: Column, mod: int) -> Column:
    """Genuinely scrambled small-modulus bucket: scramble in the large
    prime space FIRST, then reduce — immune to the ``scrambled_key``
    identity degeneracy because SCRAMBLE_MOD is prime (KNUTH_MULT is
    never ≡ 1 mod it) and the outer reduction sees the permuted value.
    Use for id-decorrelated splits/slices with small bucket counts."""
    return F.pmod(F.pmod(col * F.lit(KNUTH_MULT), F.lit(SCRAMBLE_MOD)),
                  F.lit(mod))


def scrambled_bucket_sql(expr: str, mod: int) -> str:
    """DuckDB twin of ``scrambled_bucket`` (non-negative inputs)."""
    return f"((({expr}) * {KNUTH_MULT}) % {SCRAMBLE_MOD}) % {mod}"
