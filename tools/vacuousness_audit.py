"""Vacuousness audit: compare two check_oracle JSON sweeps (typically
sf0.01 pre-check vs the definitive sf0.1 FULLCHECK) and flag entries
whose result set COLLAPSES as the data grows.

Motivation (round 9 live catch): apriori_triple_itemsets was green at
both scale factors — and empty at sf0.1, because its fixed absolute
min-support (2) thins out as the item space grows with corpus size. An
entry that matches its oracle on ZERO rows verifies nothing; fixed
absolute thresholds, textbook criticals, and global fractions are the
usual culprits (standing round-4 gotcha). A green hash on a shrinking
result is exactly the failure mode a per-SF row comparison sees and a
single-SF gate cannot.

Flags:
- VACUOUS: rows > 0 at the small SF, rows == 0 at the large SF.
- COLLAPSED: rows shrank by >= 10x while the data grew (suspicious for
  threshold entries; scalar/summary entries with <= 25 rows at the
  small SF are exempt — their output is dimension-bounded by design).

Usage: python tools/vacuousness_audit.py SMALL.json LARGE.json
Exit 1 iff any VACUOUS entry exists (COLLAPSED is a warning).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print("usage: vacuousness_audit.py SMALL_SWEEP.json LARGE_SWEEP.json")
        return 2
    small = json.load(open(sys.argv[1]))
    large = json.load(open(sys.argv[2]))
    sres, lres = small["results"], large["results"]
    vacuous, collapsed = [], []
    for name, lrow in lres.items():
        srow = sres.get(name)
        if srow is None:
            continue
        s_rows = srow.get("spark_rows")
        l_rows = lrow.get("spark_rows")
        if s_rows is None or l_rows is None:
            continue
        if s_rows > 0 and l_rows == 0:
            vacuous.append((name, s_rows, l_rows))
        elif s_rows > 25 and l_rows > 0 and l_rows * 10 <= s_rows:
            collapsed.append((name, s_rows, l_rows))
    for name, s, l in sorted(collapsed):
        print(f"COLLAPSED {name}: {s} rows @ {small['sf_dir']} -> "
              f"{l} @ {large['sf_dir']}")
    for name, s, l in sorted(vacuous):
        print(f"VACUOUS   {name}: {s} rows @ {small['sf_dir']} -> "
              f"0 @ {large['sf_dir']}")
    print(f"\n{len(vacuous)} vacuous, {len(collapsed)} collapsed "
          f"of {len(lres)} compared")
    return 1 if vacuous else 0


if __name__ == "__main__":
    raise SystemExit(main())
