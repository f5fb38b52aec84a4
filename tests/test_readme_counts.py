"""README's headline registry counts must match the code (doc-rot
guard — the r4 ADVICE found them stale)."""

from __future__ import annotations

import os
import re

from parallel_dbms_spark.queries import REGISTRY


def test_readme_registry_counts_match_code():
    path = os.path.join(os.path.dirname(__file__), "..", "README.md")
    text = open(path, encoding="utf-8").read()
    m = re.search(
        r"registry stands at (\d+)\s*\nqueries \((\d+) with", text
    ) or re.search(r"registry stands at (\d+)\s+queries \((\d+) with", text)
    assert m, "README no longer states the registry counts"
    n_total, n_oracled = int(m.group(1)), int(m.group(2))
    assert n_total == len(REGISTRY)
    assert n_oracled == sum(1 for s in REGISTRY.values() if s.oracle)
