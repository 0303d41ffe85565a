"""Compare two BENCH_DETAIL.json files per query (r11 before/after evidence).

Usage: python tools/r11_compare.py BASE.json NEW.json [--min-delta 0.3]
Prints per-query min-sample deltas (noise-robust best-of-5 compare, the
BENCH_GOLDEN convention) sorted by absolute saving, plus totals.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("new")
    ap.add_argument("--min-delta", type=float, default=0.3)
    args = ap.parse_args()
    base = json.load(open(args.base))
    new = json.load(open(args.new))
    bmin = {k: v[0] for k, v in base["spread"].items()}
    nmin = {k: v[0] for k, v in new["spread"].items()}
    common = sorted(set(bmin) & set(nmin))
    tb = sum(bmin[k] for k in common)
    tn = sum(nmin[k] for k in common)
    print(
        f"common queries: {len(common)}  total(min) {tb:.1f} -> {tn:.1f} s"
        f"  ({tn / tb:.3f}x)"
    )
    print(
        f"anchors: base {base['anchor_sec']}/{base['anchor_end_sec']}"
        f"  new {new['anchor_sec']}/{new['anchor_end_sec']}"
    )
    rows = [(bmin[k] - nmin[k], bmin[k], nmin[k], k) for k in common]
    rows.sort(reverse=True)
    print("-- improvements --")
    for d, b, n, k in rows:
        if d >= args.min_delta:
            print(f"{b:8.2f} -> {n:8.2f}  ({d:+.2f})  {k}")
    print("-- regressions --")
    for d, b, n, k in sorted(rows):
        if -d >= args.min_delta:
            print(f"{b:8.2f} -> {n:8.2f}  ({d:+.2f})  {k}")


if __name__ == "__main__":
    main()
