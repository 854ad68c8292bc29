"""Engine-side timing census: run EVERY registry entry (Spark only, no
oracle) at a scale factor, report the slowest tail, and optionally
enforce per-entry time budgets.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/engine_census.py
    # CI budget gate (one command; budgets are checked in):
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/engine_census.py \
        --budgets tools/census_budgets_sf001.json
    # refresh budgets after adding entries (3x headroom, 4.5 s floor):
    ... --write-budgets tools/census_budgets_sf001.json

This is the sweep that found the round-4 CollapseProject inlining bug
(four entries at 55-66 s that the 27-query bench never touches). The
budget gate exists so that class of plan regression fails a checked-in
command instead of waiting for a manual run (VERDICT r4 task 6); the
3x-headroom budgets absorb host noise while still catching the 7-45x
blowups that plan bugs produce.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Floor raised 3.0 -> 4.5 (r9 continuation): the sandbox host showed
# ±40% day-scale throughput swings on identical code (census totals
# 175.6 -> 185 -> 245 -> 264 s across reboots/hours), and sub-2 s
# entries kept tripping 3 s floors on first-touch + host noise while
# the 7-45x plan regressions these budgets exist to catch sit far
# above any floor. 4.5 s = 3x a 1.5 s entry on the slow host.
BUDGET_FLOOR_S = 4.5
BUDGET_HEADROOM = 3.0


def run_census(sf_dir: str, cpus: int) -> dict[str, object]:
    from etl_pipeline_from_mongo_json_to_postgre_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="engine-census", cpus=cpus)
    # Warm the session before timing anything: whole-stage codegen, the
    # parquet reader path, and shuffle machinery cost ~5 s on first use,
    # all of which would otherwise be billed to whichever entry the
    # evidence-derived window ordering happens to put first (the order
    # changes every round; budgets must not depend on it).
    from etl_pipeline_from_mongo_json_to_postgre_spark.sources.parquet import load_table

    # Guarded like the worker warm-up below: a broken reader path or a
    # mis-pointed sf_dir must degrade to per-entry ERR rows in the
    # timing loop, never abort the census before it starts (r10 review).
    try:
        load_table(spark, sf_dir, "events").groupBy(
            "event_type").count().collect()
    except Exception as exc:  # noqa: BLE001
        print(f"parquet warm-up failed (continuing): {exc}",
              file=sys.stderr)
    # Also warm the Python/Arrow worker path: the FIRST mapInPandas over
    # a full partition fan spawns one Python worker PER CORE, each paying
    # pandas/pyarrow import + Arrow serializer init (measured 6-12 s
    # billed to whichever multimodal entry the rotating window order puts
    # first — r9: mm_audio_decode_stats breached its floor budget at a
    # warm 1.5-2 s). A 1-row warm-up is NOT enough (it initializes a
    # single worker); fan one task to every core so the reuse pool is
    # fully initialized before timing starts.
    # Guarded: a broken Python-worker path must degrade to per-entry ERR
    # rows in the timing loop (the module's "census reports, not raises"
    # contract), never abort the census before it starts.
    try:
        spark.range(0, cpus, 1, cpus).mapInPandas(
            lambda it: it, "id long").count()
    except Exception as exc:  # noqa: BLE001
        print(f"python-worker warm-up failed (continuing): {exc}",
              file=sys.stderr)
    times: dict[str, object] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            # noop sink, not count() (r10 review): count() lets the
            # optimizer prune the final projection, hiding regressions
            # that live in projected expressions (p1's mapped
            # projection measured 4.6x cheaper under count()). The
            # noop sink evaluates EVERY output column JVM-side and
            # discards rows — the same work the driver's value-hash
            # collect pays, for any schema.
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            times[name] = round(time.time() - t0, 2)
        except Exception as exc:  # noqa: BLE001 - census reports, not raises
            times[name] = f"ERR {str(exc)[:120]}"
    return times


def check_budgets(times: dict[str, object], budgets: dict[str, float]) -> list[str]:
    """Breach list. Entries missing from the budget file breach too —
    a new operator must ship with a budget, not dodge the gate."""
    breaches = []
    for name, t in times.items():
        if not isinstance(t, float):
            breaches.append(f"{name}: {t}")
        elif name not in budgets:
            breaches.append(f"{name}: {t}s but NO BUDGET (add to the budget file)")
        elif t > budgets[name]:
            breaches.append(f"{name}: {t}s > budget {budgets[name]}s")
    return breaches


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budgets", help="budget JSON to enforce (rc=1 on breach)")
    ap.add_argument("--write-budgets", help="write measured*3 (floor 4.5s) budgets here")
    ap.add_argument("--json", help="dump raw per-entry seconds to this path")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    times = run_census(sf_dir, cpus)

    num = {k: v for k, v in times.items() if isinstance(v, float)}
    errs = {k: v for k, v in times.items() if not isinstance(v, float)}
    print("SLOWEST:")
    for k in sorted(num, key=num.get, reverse=True)[:20]:  # type: ignore[arg-type]
        print(f"  {k}: {num[k]}s")
    print(f"ERRORS: {errs}")
    print(f"TOTAL: {round(sum(num.values()), 1)} s for {len(num)} queries")

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(times, fh, indent=1, sort_keys=True)
    if args.write_budgets:
        budgets = {
            k: max(BUDGET_FLOOR_S, round(BUDGET_HEADROOM * v, 1))
            for k, v in sorted(num.items())
        }
        with open(args.write_budgets, "w") as fh:
            json.dump(budgets, fh, indent=1, sort_keys=True)
        print(f"wrote {len(budgets)} budgets to {args.write_budgets}")
    if args.budgets:
        with open(args.budgets) as fh:
            budgets = json.load(fh)
        breaches = check_budgets(times, budgets)
        if breaches:
            print("BUDGET BREACHES:")
            for b in breaches:
                print(f"  {b}")
            return 1
        print(f"BUDGETS OK ({len(num)} entries)")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
