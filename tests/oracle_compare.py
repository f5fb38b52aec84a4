"""Driver-mirroring oracle comparison: run a registered Spark query and
its DuckDB oracle on the same parquet tables; compare row count, column
names/order-insensitively, and exact values (floats included — the
query surface is engineered for bit-identical doubles, see
queries/relational.py module doc).
"""

from __future__ import annotations

import datetime
import math

import duckdb

from parallel_dbms_spark.catalog import TABLES

__all__ = [
    "duck_connect",
    "run_compare",
    "CompareResult",
    "FORBIDDEN_DUCK_TYPES",
    "forbidden_types",
]

# DuckDB result types the driver's *typed* value-hash distinguishes from
# anything Spark can produce. SUM(BIGINT) silently returns HUGEINT, which
# shipped three rounds in a row (null_semantics r2, profile_orders r2,
# vector_centroids r3) because this comparator was value-only. Any oracle
# whose declared result schema contains one of these is a hash mismatch
# waiting to happen, regardless of the values.
FORBIDDEN_DUCK_TYPES = (
    "HUGEINT",
    "UHUGEINT",
    "UBIGINT",
    "UINTEGER",
    "USMALLINT",
    "UTINYINT",
    "TIMESTAMP_NS",
    "TIMESTAMP WITH TIME ZONE",
    "TIME",
)


def forbidden_types(rel) -> list[tuple[str, str]]:
    """(column, type) pairs in a bound DuckDB relation whose declared type
    the driver's hash would distinguish from the Spark side. Binding only —
    the query is never executed."""
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ)
        if any(t == f or t.startswith(f + "[") for f in FORBIDDEN_DUCK_TYPES):
            bad.append((col, t))
    return bad


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    # DuckDB may hand back ns-precision timestamps; Spark µs. Compare at µs.
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


class CompareResult:
    def __init__(self, name):
        self.name = name
        self.rows_match = False
        self.schema_match = False
        self.values_match = False
        self.types_ok = True
        self.detail = ""

    @property
    def ok(self):
        return (
            self.rows_match
            and self.schema_match
            and self.values_match
            and self.types_ok
        )

    def __repr__(self):
        flags = f"rows={self.rows_match} schema={self.schema_match} values={self.values_match}"
        return f"<{self.name}: {'OK' if self.ok else 'FAIL ' + flags + ' ' + self.detail}>"


def run_compare(spark, con, name, fn, oracle, sf_dir) -> CompareResult:
    res = CompareResult(name)
    sdf = fn(spark, sf_dir)
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]

    rel = con.sql(oracle)
    dcols = list(rel.columns)
    bad = forbidden_types(rel)
    if bad:
        res.types_ok = False
        res.detail = f"oracle declares driver-hash-hostile types: {bad}"
    drows = rel.fetchall()

    # later mismatch messages APPEND to detail so a type-lint failure
    # above is never hidden by a row/value diff on the same result
    def add_detail(msg):
        res.detail = f"{res.detail}; {msg}" if res.detail else msg

    res.rows_match = len(srows) == len(drows)
    res.schema_match = sorted(scols) == sorted(dcols)
    if not res.schema_match:
        add_detail(f"spark cols {sorted(scols)} != duck cols {sorted(dcols)}")
        return res
    if not res.rows_match:
        add_detail(f"spark {len(srows)} rows != duck {len(drows)} rows")

    # Sort columns by name (the driver's convention), then rows.
    sperm = sorted(range(len(scols)), key=lambda i: scols[i])
    dperm = sorted(range(len(dcols)), key=lambda i: dcols[i])
    skey = sorted(tuple(_norm(r[i]) for i in sperm) for r in srows)
    dkey = sorted(tuple(_norm(r[i]) for i in dperm) for r in drows)
    res.values_match = skey == dkey
    if not res.values_match:
        for a, b in zip(skey, dkey):
            if a != b:
                add_detail(f"first diff: spark={a!r} duck={b!r}")
                break
    return res
