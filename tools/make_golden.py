"""Stamp BENCH_GOLDEN.json from an UNCONTENDED bench run's BENCH_DETAIL.json.

Usage: python tools/make_golden.py [detail_path] [sf] [--window]

Takes each query's MINIMUM sample (spread[0]) as its golden floor and the
run's best anchor (min of start/end drift anchors) as the environment
stamp. bench.py then reports every run's per-query min vs this board after
anchor scaling and flags ratio > 2 mechanically (round-11 verdict item 3).

Only stamp from a run you KNOW was uncontended: check that anchor_sec and
anchor_end_sec agree (say, within 20%) and sit at the machine's known-idle
level before promoting a detail file to golden -- without --window this
script refuses a run whose anchors disagree by more than 1.5x.

--window (round-12, verdict item 1): all four r11 re-stamp attempts failed
the 1.5x rule because the BOX drifts over the bench hour (the warm-up
tightening proved it is environment, not JIT). The window stamp accepts
the drift and records the [start, end] anchor pair explicitly; the floors
are scaled by the BEST (smallest) anchor, which maximizes every future
run's allowance -- conservative in the only safe direction (a floor that
is too loose can miss a regression near the bound; it can never
false-flag). A warm-up that did NOT converge is refused in either mode:
its anchor measures cold JIT, not the environment (the detail file records
convergence since round 12).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--window"]
    window_ok = "--window" in sys.argv[1:]
    detail_path = args[0] if args else os.path.join(REPO, "BENCH_DETAIL.json")
    sf = float(args[1]) if len(args) > 1 else 0.1
    with open(detail_path) as f:
        detail = json.load(f)
    if "detail" in detail:  # a captured stdout detail line
        detail = detail["detail"]
    for key in ("anchor_warmup", "anchor_end_warmup"):
        w = detail.get(key)
        if w is not None and not w.get("converged"):
            raise SystemExit(
                f"refusing: {key} did not converge ({w.get('warm_runs')} warm"
                " runs) -- the anchor measures cold JIT, not the environment;"
                " re-run the bench"
            )
    a0, a1 = detail["anchor_sec"], detail["anchor_end_sec"]
    ratio = max(a0, a1) / min(a0, a1)
    if ratio > 1.5 and not window_ok:
        raise SystemExit(
            f"refusing: anchors {a0}/{a1} disagree {ratio:.2f}x -- the run "
            "drifted; golden needs a stable-environment run (or pass "
            "--window to stamp the drift window explicitly)"
        )
    golden = {
        "sf": sf,
        "anchor_sec": min(a0, a1),
        "anchor_end_sec": max(a0, a1),
        "min_sec": {n: s[0] for n, s in sorted(detail["spread"].items())},
        "source": os.path.basename(detail_path),
    }
    if ratio > 1.5:
        golden["window_stamp"] = True  # anchors drifted; floors scaled by best
    out = os.path.join(REPO, "BENCH_GOLDEN.json")
    with open(out, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"stamped {out}: {len(golden['min_sec'])} queries, anchor {golden['anchor_sec']}")


if __name__ == "__main__":
    main()
