#!/usr/bin/env python3
"""Window-rotation guard (round-2 verdict item 7).

The driver's CORRECTNESS gate checks only the first 50 oracle-backed
registry entries per round, so an oracle can sit registered-but-never-
driver-verified forever if the registry order never rotates it in. This
check fails when any registered oracle has neither (a) appeared in a past
round's CORRECTNESS_r*.json nor (b) a seat in the CURRENT first-50 window
(i.e. it would still be unchecked after this round runs).

Run from the repo root:  python tools/check_window_rotation.py
Exit 0 = every oracle is covered by history or the pending window.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50  # driver checks the first N oracle-backed registry entries


def main() -> int:
    from clustopher_spark.queries import ORACLES, QUERIES

    oracle_names = [n for n in QUERIES if n in ORACLES]
    window = set(oracle_names[:WINDOW])

    checked: set[str] = set()
    rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    for path in rounds:
        with open(path) as f:
            checked |= set(json.load(f))

    uncovered = [n for n in oracle_names if n not in checked and n not in window]
    covered_after = len([n for n in oracle_names if n in checked or n in window])
    print(
        f"oracles={len(oracle_names)} window={len(window)} "
        f"history_rounds={len(rounds)} already_checked={len(checked & set(oracle_names))} "
        f"covered_after_this_round={covered_after}"
    )
    if uncovered:
        print(f"FAIL: {len(uncovered)} oracle(s) neither driver-checked in any "
              f"round nor in the current window:", file=sys.stderr)
        for n in uncovered:
            print(f"  {n}", file=sys.stderr)
        return 1
    print("OK: every registered oracle is driver-checked or scheduled this round")
    return 0


if __name__ == "__main__":
    sys.exit(main())
