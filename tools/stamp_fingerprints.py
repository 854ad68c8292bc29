"""Stamp per-entry code fingerprints at green-evidence time (VERDICT r5
task 6).

The driver window (__spark_entry__._priority) re-windows an entry whose
code or oracle drifted since its last green driver row. "Since its last
green" needs a record of what the code looked like THEN — this tool
writes it: for every entry whose latest green round is newer than its
stamp, capture the current fingerprints into
tools/entry_fingerprints.json.

RUN FIRST THING AT ROUND START, before editing any operator: the driver
produces CORRECTNESS_r{N}.json against the round-(N-1) close commit,
which is exactly the code still on disk at round-N start — stamping
later would bless in-round edits with evidence that never saw them.

    python tools/stamp_fingerprints.py                # refresh stamps
    python tools/stamp_fingerprints.py --mark-drifted NAME ...
        # force specific entries back into the window (used when an
        # operator/oracle was edited AFTER this round's stamping)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAMP_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "entry_fingerprints.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mark-drifted", nargs="*", default=[],
                    help="entries to force-mark as drifted (re-window)")
    args = ap.parse_args()

    import __spark_entry__ as e

    q_raw, o = e._raw_registries()
    cur = e._current_fingerprints(q_raw, o)
    ev = e._evidence_latest_green()
    stamps = e._stamps()

    updated, marked = [], []
    for name, rnd in sorted(ev.items()):
        if name not in cur:
            continue
        st = stamps.get(name)
        if st is None or st.get("round", -1) < rnd:
            stamps[name] = {**cur[name], "round": rnd}
            updated.append(name)
    for name in args.mark_drifted:
        if name not in cur:
            print(f"unknown entry: {name}", file=sys.stderr)
            return 1
        prev = stamps.get(name, {})
        stamps[name] = {"fn": "drifted", "mod": "drifted",
                        "round": prev.get("round", 0)}
        marked.append(name)
    # drop stamps for vanished entries
    stamps = {n: s for n, s in stamps.items() if n in cur}

    with open(STAMP_PATH, "w") as fh:
        json.dump(stamps, fh, indent=1, sort_keys=True)
    print(f"stamped {len(updated)} updated, {len(marked)} marked drifted, "
          f"{len(stamps)} total -> {STAMP_PATH}")
    if updated:
        print("updated:", ", ".join(updated[:20]),
              "..." if len(updated) > 20 else "")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
