"""Engine-side timing census: run EVERY registry entry (Spark only, no
oracle) at a scale factor and report the slowest tail.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/engine_census.py

This is the sweep that found the round-4 CollapseProject inlining bug
(four entries at 55-66 s that the 27-query bench never touches) — run
it once per round after adding operators; anything that stands out by
an order of magnitude deserves a .explain().
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from etl_pipeline_from_mongo_json_to_postgre_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="engine-census",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    times: dict[str, object] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
            times[name] = round(time.time() - t0, 2)
        except Exception as exc:  # noqa: BLE001 - census reports, not raises
            times[name] = f"ERR {str(exc)[:120]}"
    num = {k: v for k, v in times.items() if isinstance(v, float)}
    errs = {k: v for k, v in times.items() if not isinstance(v, float)}
    print("SLOWEST:")
    for k in sorted(num, key=num.get, reverse=True)[:20]:  # type: ignore[arg-type]
        print(f"  {k}: {num[k]}s")
    print(f"ERRORS: {errs}")
    print(f"TOTAL: {round(sum(num.values()), 1)} s for {len(num)} queries")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
