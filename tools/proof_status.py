"""Print the driver-proof status of every REGISTRY query: which names have
a green CORRECTNESS row in some round, which are rows-only, and which are
still unproven (and whether they all fit the driver's 50-slot window).

Usage: python tools/proof_status.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from sentiment_analysis_data_pipeline_spark.queries import (  # noqa: E402
    REGISTRY,
    _proven_names,
)


def main() -> None:
    proven = _proven_names(REGISTRY)
    names = list(REGISTRY)
    unproven = [n for n in names if n not in proven]
    print(f"registry: {len(names)} queries; proven: {len(proven)}; unproven: {len(unproven)}")
    for n in unproven:
        slot = names.index(n)
        marker = "" if slot < 50 else "  ** PAST DRIVER CUTOFF **"
        print(f"  slot {slot:3d}  {n}{marker}")
    if not unproven:
        print("no unproven queries -- every registry entry has a driver proof")
    elif all(names.index(n) < 50 for n in unproven):
        print("all unproven queries are inside the driver's 50-slot proof window")
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()
