"""Stamp BENCH_GOLDEN.json from an UNCONTENDED bench run's BENCH_DETAIL.json.

Usage: python tools/make_golden.py [detail_path] [sf]

Takes each query's MINIMUM sample (spread[0]) as its golden floor and the
run's best anchor (min of start/end drift anchors) as the environment
stamp. bench.py then reports every run's per-query min vs this board after
anchor scaling and flags ratio > 2 mechanically (round-11 verdict item 3).

Only stamp from a run you KNOW was uncontended: check that anchor_sec and
anchor_end_sec agree (say, within 20%) and sit at the machine's known-idle
level before promoting a detail file to golden -- this script refuses a
run whose anchors disagree by more than 1.5x.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    detail_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_DETAIL.json")
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
    with open(detail_path) as f:
        detail = json.load(f)
    if "detail" in detail:  # a captured stdout detail line
        detail = detail["detail"]
    a0, a1 = detail["anchor_sec"], detail["anchor_end_sec"]
    ratio = max(a0, a1) / min(a0, a1)
    if ratio > 1.5:
        raise SystemExit(
            f"refusing: anchors {a0}/{a1} disagree {ratio:.2f}x -- the run "
            "drifted; golden needs a stable-environment run"
        )
    golden = {
        "sf": sf,
        "anchor_sec": min(a0, a1),
        "anchor_end_sec": max(a0, a1),
        "min_sec": {n: s[0] for n, s in sorted(detail["spread"].items())},
        "source": os.path.basename(detail_path),
    }
    out = os.path.join(REPO, "BENCH_GOLDEN.json")
    with open(out, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"stamped {out}: {len(golden['min_sec'])} queries, anchor {golden['anchor_sec']}")


if __name__ == "__main__":
    main()
