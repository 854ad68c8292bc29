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
import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMP_PATH = os.path.join(REPO, "tools", "entry_fingerprints.json")


def _git(*args: str) -> str | None:
    try:
        r = subprocess.run(["git", "-C", REPO, *args],
                           capture_output=True, timeout=20)
        return r.stdout.decode() if r.returncode == 0 else None
    except Exception:  # noqa: BLE001 - git absence degrades gracefully
        return None


def _tested_module_hash(rnd: int, relpath: str, evidence_dir: str,
                        _cache: dict = {}) -> str | None:
    """sha256[:16] of ``relpath`` AS THE DRIVER TESTED IT for round
    ``rnd``: the parent tree of the commit that introduced
    CORRECTNESS_r{rnd}.json in ``evidence_dir`` (the driver runs
    against the previous round's close commit, then commits the
    evidence on top). None when git can't answer — no repo, the
    evidence file isn't tracked (e.g. fixture-synthesized evidence in
    tests), or the path is absent at the tested tree; callers bless on
    None because the working tree then IS the only code the evidence
    can refer to."""
    ev_file = os.path.join(evidence_dir, f"CORRECTNESS_r{rnd:02d}.json")
    ev_rel = os.path.relpath(ev_file, REPO)
    if ev_rel.startswith(".."):
        return None  # evidence outside the repo: synthesized fixture
    if ("ev", ev_rel) not in _cache:
        # The commit that INTRODUCED round rnd's evidence, not the
        # newest commit touching the file: a later reformat /
        # consolidation commit would otherwise silently shift the
        # reference tree forward and bless code the driver never tested
        # (ADVICE r7, medium). NEWEST introduction, so a delete +
        # re-add resolves to the commit that introduced the CURRENT
        # content. RENAMED evidence (r9 advice + review): the walk must
        # trace THROUGH renames — a pathspec-limited plain
        # `--diff-filter=A -- <newpath>` reports the rename commit
        # ITSELF as an Add, whose parent tree already contains module
        # edits made after the driver ran (bless-untested-code hazard).
        # But raw `--follow --diff-filter=A` over-follows: git's
        # similarity detection also chains through COPIES of other
        # still-present files (r10 live failure: CORRECTNESS_r09.json
        # scored C080 against CORRECTNESS_r03.json — round evidence
        # files are structurally similar by construction — resolving
        # the tested tree to round THREE and falsely drift-marking 40
        # entries). A copy introduces NEW content at the copying
        # commit; only a true rename (old path deleted) carries content
        # history. So: walk `--follow --name-status` newest→oldest,
        # chaining the tracked path through R entries and stopping at
        # the first A (added) or C (copied) entry for it. Plain A,
        # then oldest-touch, remain as fallbacks (--follow can return
        # nothing for exotic histories), never None, so the guard
        # cannot silently self-disable into bless-everything.
        commit = None
        out = _git("log", "--follow", "--name-status",
                   "--format=%x00%H", "--", ev_rel)
        if out:
            current = ev_rel
            for block in out.split("\x00"):
                lines = [ln for ln in block.splitlines() if ln.strip()]
                if not lines:
                    continue
                sha, entries = lines[0], lines[1:]
                for ent in entries:
                    parts = ent.split("\t")
                    status = parts[0]
                    if status == "A" and parts[-1] == current:
                        commit = sha
                        break
                    if status.startswith(("R", "C")) and parts[-1] == current:
                        if status.startswith("R"):
                            current = parts[1]  # trace through rename
                        else:
                            commit = sha  # copy = new content here
                        break
                if commit:
                    break
        if commit is None:
            out = _git("log", "--diff-filter=A", "--format=%H",
                       "--", ev_rel)
            lines = out.split() if out else []
            commit = lines[0] if lines else None
        if commit is None:
            out = _git("log", "--format=%H", "--", ev_rel)
            lines = out.split() if out else []
            commit = lines[-1] if lines else None
        _cache[("ev", ev_rel)] = commit
    commit = _cache[("ev", ev_rel)]
    if not commit:
        return None
    key = (commit, relpath)
    if key not in _cache:
        blob = _git("show", f"{commit}^:{relpath}")
        _cache[key] = (hashlib.sha256(blob.encode()).hexdigest()[:16]
                       if blob is not None else None)
    return _cache[key]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mark-drifted", nargs="*", default=[],
                    help="entries to force-mark as drifted (re-window)")
    args = ap.parse_args()

    import functools
    import inspect

    import __spark_entry__ as e

    q_raw, o = e._raw_registries()
    cur = e._current_fingerprints(q_raw, o)
    ev = e._evidence_latest_green()
    stamps = e._stamps()

    def _relpath(name: str) -> str | None:
        f = inspect.unwrap(q_raw[name])
        while isinstance(f, functools.partial):
            f = f.func
        path = getattr(inspect.getmodule(f), "__file__", None)
        return os.path.relpath(path, REPO) if path else None

    updated, marked, refused = [], [], []
    for name, rnd in sorted(ev.items()):
        if name not in cur:
            continue
        st = stamps.get(name)
        if st is None or st.get("round", -1) < rnd:
            # Anti-laundering guard (r7 review): a stamp asserts "this
            # is the code the driver's green row vouches for". Bless
            # only when the entry's module file matches the TESTED tree
            # (parent of the evidence commit); an entry edited after
            # the driver ran — committed or not — is stamped DRIFTED
            # instead, so it re-enters the window rather than carrying
            # evidence that never saw its current code. None (git
            # can't answer, e.g. the driver hasn't committed the
            # evidence file yet) blesses: the working tree then IS the
            # tested code.
            rel = _relpath(name)
            tested = (_tested_module_hash(rnd, rel, e._REPO)
                      if rel else None)
            if tested is not None and tested != cur[name]["mod"]:
                stamps[name] = {"fn": "drifted", "mod": "drifted",
                                "round": rnd}
                refused.append(name)
                continue
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
          f"{len(refused)} refused (module differs from tested tree), "
          f"{len(stamps)} total -> {STAMP_PATH}")
    if updated:
        print("updated:", ", ".join(updated[:20]),
              "..." if len(updated) > 20 else "")
    if refused:
        print("refused (stamped drifted):", ", ".join(refused[:20]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
