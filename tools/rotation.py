"""Compute the next registry-rotation front: the oracle-backed queries
the external driver has never sampled, grouped by family.

The driver's correctness gate samples the FIRST 50 registered queries
each round (CORRECTNESS_r{N}.json); each round's rotation fronts 50
never-yet-sampled oracle-backed queries so driver-verified evidence
spreads across the whole registry. This tool derives the candidate pool
mechanically so the next round's _R{N}_FRONT can't drift from the
actual evidence record.

Usage:
    python tools/rotation.py [--limit 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=50)
    args = ap.parse_args()

    from chicago_business_owners_data_engineering_spark import registry

    queries = registry.get_queries()
    oracles = registry.get_oracles()

    sampled: set[str] = set()
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        if "LOCAL" in f:
            continue
        sampled.update(json.load(open(f)).keys())

    pool = [n for n in queries if n not in sampled and n in oracles]
    rows_only = [n for n in queries if n not in sampled and n not in oracles]

    fam = defaultdict(list)
    for n in pool:
        fam[re.match(r"[a-z]+", n).group()].append(n)

    print(f"registry={len(queries)} oracle-backed={len(oracles)} "
          f"driver-sampled={len(sampled & set(queries))} "
          f"never-sampled-pool={len(pool)} rows-only-unsampled={len(rows_only)}")
    print()
    for k in sorted(fam, key=lambda k: -len(fam[k])):
        print(f"{k:6s} {len(fam[k]):3d}  {' '.join(sorted(fam[k]))}")
    print()
    # Largest-family-first greedy pick of the next front
    pick: list[str] = []
    for k in sorted(fam, key=lambda k: -len(fam[k])):
        for n in sorted(fam[k]):
            if len(pick) < args.limit:
                pick.append(n)
    print(f"suggested _R_NEXT_FRONT ({len(pick)}):")
    for n in pick:
        print(f'    "{n}",')


if __name__ == "__main__":
    main()
