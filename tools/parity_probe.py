"""Ad-hoc local mirror of the driver's correctness gate.

Usage:
    python tools/parity_probe.py name1 name2 ...   # probe specific entries
    python tools/parity_probe.py --all             # sweep the whole registry
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/parity_probe.py ...

Runs each registry entry on a default (ANSI-on) SparkSession and its
DuckDB oracle side-by-side, comparing row count + columns + canonical
values exactly like tests/oracle_compare.compare.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from tests.oracle_compare import compare, duckdb_conn


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    flags = [a for a in sys.argv[1:] if a.startswith("-")]
    # Loud on bad input (r10 review): a typo'd flag (-all, --sweep)
    # used to filter to an empty probe set and exit 0 with FAILS=[] —
    # a parity gate that probed nothing reporting success.
    unknown_flags = [f for f in flags if f != "--all"]
    if unknown_flags:
        print(f"unknown flags: {unknown_flags} (only --all is accepted)")
        return 2
    if "--all" in flags and args:
        # r11 ADVICE: '--all foo' used to silently ignore 'foo' and run
        # the full sweep — the caller believes foo was validated. The
        # combination is ambiguous; refuse it like any other bad input.
        print(f"--all cannot be combined with entry names: {args}")
        return 2
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(queries) if "--all" in flags else args
    if not names:
        print("no entries to probe: pass entry names or --all")
        return 2
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown entries: {unknown}")
        return 2
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("parity-probe")
        .getOrCreate()
    )
    con = duckdb_conn(sf_dir)
    fails = []
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"  {name}: rows-only ({n} rows) [{time.time()-t0:.1f}s]")
                continue
            ok, msg = compare(df, con, oracles[name])
        except Exception as exc:  # noqa: BLE001 - probe reports, not raises
            ok, msg = False, f"EXCEPTION: {exc}"
        status = "OK" if ok else "FAIL"
        print(f"  {name}: {status} [{time.time()-t0:.1f}s]" + ("" if ok else f" — {msg[:400]}"))
        if not ok:
            fails.append(name)
    print(f"\nFAILS={fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
