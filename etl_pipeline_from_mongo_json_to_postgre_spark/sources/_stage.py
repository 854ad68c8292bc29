"""Shared staging plumbing for the file-based source modules
(csv_source / xml_source / binary_source).

Staging is a HARNESS convenience — real CSV/XML/media drops arrive
from outside — so every stager shares the same three disciplines,
kept in ONE place so a fix applies to all of them (r9 review: three
hand-synced copies had already accumulated):

- fingerprint-keyed cache dirs: the key includes a content fingerprint
  of the parquet source (names, sizes, mtimes), so a regenerated
  sf_dir invalidates the stage instead of serving stale data
  (ADVICE r4);
- bounded staging: a mis-pointed sf_dir fails loudly at MAX rows, it
  never silently stages an unbounded table;
- executor-side writes only (df.write / mapInPandas), no driver
  collect.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame


def source_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """Cheap content fingerprint of the parquet source files (names,
    sizes, mtimes)."""
    root = os.path.join(sf_dir, f"{table}.parquet")
    paths = [root]
    if os.path.isdir(root):
        # Recurse to the actual DATA files (nested partition layouts
        # like lang=en/part-*.parquet must influence the fingerprint —
        # r10 review: a flat non-recursive listing fingerprinted them
        # as nothing at all), excluding marker/crc noise (_SUCCESS,
        # .crc) whose re-commit churn is not a content change
        # (ADVICE r9).
        paths = sorted(
            os.path.join(dirpath, f)
            for dirpath, _dirs, files in os.walk(root)
            for f in files
            if not (f.startswith("_") or f.endswith(".crc"))
        )
    h = hashlib.sha256()
    for p in paths:
        try:
            st = os.stat(p)
        except FileNotFoundError:
            # Entry vanished between listdir and stat (concurrent
            # rewrite): skip it — the surviving files still change the
            # fingerprint vs the old listing.
            continue
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def stage_dir(cache_root: str, sf_dir: str, table: str = "documents") -> str:
    """Fingerprint-keyed staging directory for (cache_root, sf_dir)."""
    return os.path.join(
        cache_root,
        sf_dir.strip("/").replace("/", "_")
        + "_"
        + source_fingerprint(sf_dir, table),
    )


def guard_stage_rows(df: DataFrame, max_rows: int, what: str) -> None:
    """Loud bounded-stage guard: raises if df exceeds max_rows."""
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{what}: refusing to stage >{max_rows} rows (got at least "
            f"{n}); staging is a bounded harness path, point real scans "
            "at their drop location instead"
        )
