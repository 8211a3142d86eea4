#!/usr/bin/env python
"""Compute the next round's 50-entry driver-window priority list.

The driver's correctness gate hashes only the FIRST 50 registry entries,
so each round `queries/__init__._PRIORITY` must be rotated by the policy
documented there. Doing it by hand invites exactly the drift this script
removes — round 7 grew a 40-query never-checked backlog because the list
was curated, not computed. Policy, in order:

  1. Registry entries with NO driver CORRECTNESS row in ANY round
     (a backlog must never be allowed to re-form).
  2. Names passed on the command line — the round's new or
     changed-code-path queries (the script cannot know your diff).
  3. Fill to 50 with the OLDEST latest-proof entries (ties broken by
     registry order, i.e. whatever the previous priority put first).

Usage:
    python scripts/next_window.py [changed_query ...]

Prints the 50 names one per line plus a paste-ready _PRIORITY block.
Exits non-zero if the CLI names aren't registered (typo guard).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> None:
    from xarray_sql_spark.queries import REGISTRY

    changed = list(dict.fromkeys(sys.argv[1:]))  # de-dup, keep order
    unknown = [n for n in changed if n not in REGISTRY]
    if unknown:
        sys.exit(f"not in registry: {unknown}")

    latest: dict[str, int] = {}
    for fp in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(fp.split("_r")[1].split(".")[0])
        with open(fp) as f:
            rec = json.load(f)
        for name, row in rec.items():
            if isinstance(row, dict):
                latest[name] = max(latest.get(name, 0), rnd)

    never = [n for n in REGISTRY if n not in latest]
    picked = list(dict.fromkeys(never + changed))
    if len(picked) > WINDOW:
        print(
            f"WARNING: {len(picked)} mandatory entries exceed the "
            f"{WINDOW}-slot window; the tail spills to next round:",
            picked[WINDOW:],
            file=sys.stderr,
        )
    fill = sorted(
        (n for n in REGISTRY if n not in picked),
        key=lambda n: (latest.get(n, 0), list(REGISTRY).index(n)),
    )
    window = (picked + fill)[:WINDOW]

    print(f"# never-checked: {len(never)}  changed: {len(changed)}  "
          f"oldest-proof fill: {len(window) - min(len(picked), WINDOW)}")
    for n in window:
        print(f"{n}  (last driver row: r{latest.get(n, 0) or '—'})")
    print("\n_PRIORITY = (")
    for i in range(0, WINDOW, 3):
        print('    "' + " ".join(window[i : i + 3]) + ' "')
    print(").split()")


if __name__ == "__main__":
    main()
