"""Mechanical check of the correctness-gate rotation ledger.

The driver gates the FIRST 50 of ``__spark_entry__.queries()`` each round;
``_SNAPSHOT_PRIORITY`` stages that head.  Rounds 5-7 all had to recompute
the never-gated set by hand because a prose comment drifted from reality
(the r06 verdict's "what's wrong #2").  This tool IS that recomputation:

- gated  = every query with a green row in any ``CORRECTNESS_r*.json``
  (rows+schema+hash all true);
- debt   = registry queries with NO green driver row;
- INVARIANT: while debt exceeds one 50-query snapshot, the staged head-50
  must consist ENTIRELY of debt (no slot wasted re-gating green queries);
  once debt fits, every debt query must sit INSIDE the head-50.

Exit 1 on violation; always prints the recomputed counts so ledger
comments can quote numbers that a tool has actually derived.

Usage: python tools/rotation_check.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import __spark_entry__ as entry

    gated: set[str] = set()
    rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    for path in rounds:
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                gated.add(name)

    registry = list(entry.queries())
    head = registry[:50]
    if head != entry._SNAPSHOT_PRIORITY[: len(head)]:
        print("ROTATION FAIL: queries() head != _SNAPSHOT_PRIORITY head")
        return 1

    reg_set = set(registry)
    gated_in_reg = gated & reg_set
    debt = [q for q in registry if q not in gated]
    head_debt = [q for q in head if q not in gated]

    print(
        f"rotation: {len(registry)} registered, "
        f"{len(gated_in_reg)} driver-gated green across {len(rounds)} rounds, "
        f"{len(debt)} never-gated; head-50 holds {len(head_debt)} debt"
    )

    if len(debt) >= 50:
        stale = [q for q in head if q in gated]
        if stale:
            print(
                f"ROTATION FAIL: debt ({len(debt)}) exceeds one snapshot but "
                f"the head-50 re-gates {len(stale)} already-green queries: "
                f"{stale[:10]}"
            )
            return 1
    else:
        outside = [q for q in debt if q not in head]
        if outside:
            print(
                f"ROTATION FAIL: {len(outside)} never-gated queries sit "
                f"OUTSIDE the head-50 even though all {len(debt)} debt "
                f"queries fit: {outside[:10]}"
            )
            return 1

    print("rotation ledger consistent")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
