"""Portable text-hashing and tokenization Column builders.

"Portable" = bit-identical results reproducible in ANSI SQL (DuckDB
oracle) — polynomial fold hashes over character codes with modular
arithmetic that stays inside BIGINT range on both engines. Used by the
dedup family (minhash / simhash / fingerprint). For pure-Spark paths
where cross-engine parity is not required, xxhash64 is the faster
choice (see operators/dedup.py pair generation).

All builders are pure Column expressions — JVM-side, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
CHAR_SEED = 7
WORD_COMBINE = 131


def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def ws_tokens(col: Column) -> Column:
    """SINGLE-SPACE tokenization, empty tokens dropped — the ONE
    definition the corpus-curation family (dedup / mixing / chunking /
    repetition) hashes over; its DuckDB twin is DUCK_WS_TOKENS. The
    copies these modules carried were bit-identical but private —
    consolidated r7 so a tokenizer tweak cannot silently diverge the
    portable-hash families (gram/chunk hashes must agree across
    operators AND with the oracles)."""
    return F.filter(F.split(col, " "), lambda x: x != "")


def duck_ws_tokens(col: str = "text") -> str:
    """DuckDB twin of ws_tokens, column-generic like its Spark pair
    (ADVICE r7: the old DUCK_WS_TOKENS constant hardcoded the column
    name 'text', silently reading the wrong column for any future
    caller tokenizing something else)."""
    return f"list_filter(string_split({col}, ' '), x -> x <> '')"


# legacy alias for the default column; prefer duck_ws_tokens(col)
DUCK_WS_TOKENS = duck_ws_tokens()


def chars(col: Column) -> Column:
    """Character array with the empty-string artifact of split removed."""
    return F.filter(F.split(col, ""), lambda x: x != "")


def char_fold_hash(col: Column) -> Column:
    """Polynomial rolling hash over character codes:
    h = fold(7, c -> (h*31 + ascii(c)) % 1e9+7). Empty string -> 7."""
    return F.aggregate(
        chars(col),
        F.lit(CHAR_SEED).cast("bigint"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % F.lit(MOD),
    )


def word_hashes(words: Column) -> Column:
    """array<string> -> array<bigint> of per-word fold hashes."""
    return F.transform(words, char_fold_hash)


def shingle_hashes(wh: Column, k: int = 3) -> Column:
    """Hashes of k-word shingles from an array of word hashes:
    fold(7, w -> (h*131 + w) % MOD) over each window of k.
    Empty array when fewer than k words."""
    def shingle(i: Column) -> Column:
        acc = F.lit(CHAR_SEED).cast("bigint")
        for off in range(k):
            acc = (acc * WORD_COMBINE + F.element_at(wh, i + F.lit(off + 1))) % F.lit(MOD)
        return acc

    return F.when(
        F.size(wh) >= k,
        F.transform(F.sequence(F.lit(0), F.size(wh) - k), shingle),
    ).otherwise(F.array().cast("array<bigint>"))


# --- DuckDB SQL fragment twins (kept adjacent so engine + oracle stay
# in lockstep; each returns a SQL string over an input expression) ---

def duck_char_fold_hash(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST({CHAR_SEED} AS BIGINT), "
        f"list_transform(range(1, length({expr})+1), i -> ascii({expr}[i]))), "
        f"(acc, c) -> (acc*31 + c) % {MOD})"
    )


def duck_word_hashes(words_expr: str) -> str:
    return f"list_transform({words_expr}, w -> {duck_char_fold_hash('w')})"


def duck_shingle_hashes(k: int = 3) -> str:
    """Expects a list column literally named ``wh`` in scope (use a CTE)."""
    acc = f"CAST({CHAR_SEED} AS BIGINT)"
    for off in range(k):
        acc = f"(({acc})*{WORD_COMBINE} + wh[i+{off}]) % {MOD}"
    return (
        f"CASE WHEN len(wh) >= {k} THEN "
        f"list_transform(range(1, len(wh)-{k-2}), i -> {acc}) "
        f"ELSE CAST([] AS BIGINT[]) END"
    )
