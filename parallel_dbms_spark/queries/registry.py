"""Query registry — the driver-facing correctness surface.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent ANSI-SQL oracle string that
DuckDB runs on the same parquet tables. Column names are aliased
identically on both sides — the driver sorts columns by name before
value-hashing.

Conventions that keep the hashes aligned:
- every aggregate/computed column is aliased on BOTH sides
- DuckDB ``sum``/windowed sums over integers return HUGEINT -> oracle
  casts to BIGINT; ``count(*)`` is BIGINT on both sides already
- ``rank``-style columns are BIGINT in DuckDB -> cast to INTEGER
- events.ts (TIMESTAMP_NS) is cast to µs TIMESTAMP on both sides
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle
    }
