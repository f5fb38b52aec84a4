"""Diff two bench JSON artifacts (bench.py output or the driver's
BENCH_r{N}.json, which wraps it under "parsed").

Usage:
    python scripts/bench_compare.py BENCH_r03.json /tmp/bench_now.json

Prints per-workload deltas for the common set, the net change, and
flags movers beyond a noise threshold so a plan regression (lost
broadcast, new shuffle, fallen-out-of-codegen UDF) is one command to
spot instead of a by-hand comparison.
"""

from __future__ import annotations

import json
import sys

NOISE_SEC = 0.25  # absolute; below this a delta is scheduling noise
NOISE_REL = 0.25  # relative


def load(path: str) -> dict:
    d = json.load(open(path))
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a.get("queries", {}), b.get("queries", {})
    common = sorted(set(qa) & set(qb))
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    ta, tb = sum(qa[k] for k in common), sum(qb[k] for k in common)
    print(f"common {len(common)} workloads: {ta:.1f}s -> {tb:.1f}s "
          f"({(tb / ta - 1) * 100:+.1f}%)")
    if only_a:
        print(f"dropped: {', '.join(only_a)}")
    if only_b:
        print(f"added:   {', '.join(only_b)} "
              f"(+{sum(qb[k] for k in only_b):.1f}s)")
    movers = [
        k for k in common
        if abs(qb[k] - qa[k]) > NOISE_SEC
        and abs(qb[k] - qa[k]) / max(qa[k], 1e-9) > NOISE_REL
    ]
    movers.sort(key=lambda k: qa[k] - qb[k])
    if movers:
        print("\nmovers beyond noise (old -> new):")
        for k in movers:
            print(f"  {'REGRESSED' if qb[k] > qa[k] else 'improved '} "
                  f"{k:28s} {qa[k]:7.3f} -> {qb[k]:7.3f}")
    else:
        print("no movers beyond noise")


if __name__ == "__main__":
    main()
