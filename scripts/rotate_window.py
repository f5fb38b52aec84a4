"""Driver-window rotation advisor.

The driver grades exactly the first 50 exported registry entries, so
each round we convert judge/pytest-only proof into graded proof by
swapping rows that are already green in prior rounds for oracled
queries the driver has never seen — WITHOUT dropping any operator
family from the window (tests/test_registry_window.py's invariant).

Usage:
    python scripts/rotate_window.py            # report + suggestion
    python scripts/rotate_window.py --max 15   # cap the swap size

Reads every CORRECTNESS_r*.json in the repo root. A window row is a
rotation candidate once it has hash-matched in >= 1 prior round; a
row whose family tag no OTHER window row (current or incoming)
carries is pinned. Suggested swap-ins are oracled, never-graded
queries ordered to maximize new family tags per slot.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_dbms_spark.queries import REGISTRY
from parallel_dbms_spark.queries.registry import DRIVER_WINDOW


def graded_history() -> dict[str, list[str]]:
    """name -> [round files where it hash-matched]."""
    hist: dict[str, list[str]] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        data = json.load(open(f))
        for name, row in data.items():
            if row.get("hash_match"):
                hist.setdefault(name, []).append(f)
    return hist


def main() -> None:
    max_swaps = 15
    if "--max" in sys.argv:
        max_swaps = int(sys.argv[sys.argv.index("--max") + 1])

    hist = graded_history()
    ever_graded = set(hist)
    window = list(DRIVER_WINDOW)

    # never-graded oracled queries, most-novel-tags first
    candidates = [
        n
        for n in REGISTRY
        if REGISTRY[n].oracle and n not in ever_graded and n not in window
    ]

    def tag_coverage(names):
        cov: dict[str, int] = {}
        for n in names:
            for t in REGISTRY[n].tags:
                cov[t] = cov.get(t, 0) + 1
        return cov

    # greedy: pick the IN rows first (most-novel-tags), then drop
    # ever-graded rows one at a time while the COMBINED window
    # (remaining + all chosen INs) still spans every family — incoming
    # rows count toward coverage, so a sole-carrier OUT row is fine
    # when an IN row carries the same tag.
    from tests.test_registry_window import REQUIRED_FAMILIES

    cov = tag_coverage(window)
    candidates.sort(
        key=lambda n: -sum(1 for t in REGISTRY[n].tags if cov.get(t, 0) == 0)
    )
    incoming = candidates[:max_swaps]

    def full_coverage(names):
        got = set()
        for n in names:
            got.update(REGISTRY[n].tags)
        return REQUIRED_FAMILIES <= got

    swappable = []
    remaining = list(window)
    for n in sorted(window, key=lambda n: -len(hist.get(n, []))):
        if len(swappable) == len(incoming):
            break
        if n not in ever_graded:
            continue
        trial = [x for x in remaining if x != n]
        if full_coverage(trial + incoming):
            swappable.append(n)
            remaining = trial

    n_swap = min(max_swaps, len(swappable), len(candidates))
    print(f"window rows ever graded green: "
          f"{sum(1 for n in window if n in ever_graded)}/{len(window)}")
    print(f"oracled never-graded queries outside window: {len(candidates)}")
    print(f"\nsuggested swap ({n_swap} slots):")
    for out, inn in zip(swappable[:n_swap], candidates[:n_swap]):
        print(f"  OUT {out:34s} (green x{len(hist[out])})  ->  IN {inn} "
              f"{REGISTRY[inn].tags}")
    if n_swap:
        print("\nApply by editing DRIVER_WINDOW in "
              "parallel_dbms_spark/queries/registry.py, then run:\n"
              "  python -m pytest tests/test_registry_window.py -q\n"
              "  python scripts/check_oracles.py /root/testdata/sf0.01 --window")


if __name__ == "__main__":
    main()
