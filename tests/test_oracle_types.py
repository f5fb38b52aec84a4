"""Registry-wide oracle TYPE lint.

The driver's value-hash is typed: DuckDB SUM(BIGINT) -> HUGEINT hashes
differently from Spark's BIGINT even when every value is equal. This bit
three times (null_semantics r2, profile_orders r2, vector_centroids r3)
because the local comparator only compared Python values. This test
*binds* every registered oracle in DuckDB (no execution, no Spark) and
fails on any declared result type the driver's hash would distinguish —
so the gate, not vigilance, catches the fourth instance.
"""

from __future__ import annotations

import duckdb
import pytest

from oracle_compare import duck_connect, forbidden_types

from parallel_dbms_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

ORACLED = sorted(n for n, spec in REGISTRY.items() if spec.oracle)


@pytest.fixture(scope="module")
def con():
    return duck_connect(SF_DIR)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_declares_no_hash_hostile_types(con, name):
    spec = REGISTRY[name]
    try:
        rel = con.sql(spec.oracle)
    except duckdb.Error as e:  # pragma: no cover - binding failure is its own bug
        pytest.fail(f"{name}: oracle failed to bind: {e}")
    bad = forbidden_types(rel)
    assert not bad, (
        f"{name}: oracle result schema contains driver-hash-hostile types "
        f"{bad}; cast them (e.g. CAST(SUM(x) AS BIGINT)) per the registry "
        f"convention (queries/registry.py module doc)"
    )
