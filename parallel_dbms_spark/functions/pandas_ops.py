"""Grouped-map pandas operators (applyInPandas) — the per-group
custom-logic extension point, complementing mapInPandas (multimodal)
and applyInPandasWithState (streaming/stateful.py).

``zscore_by_group`` standardizes a 2-decimal value column within each
group. The moments are computed from exact int64 cent counts, and the
combining arithmetic uses the same IEEE-double expression the SQL
oracle writes — so even a pandas-side operator is oracle-exact
(python floats ARE IEEE doubles; identical op order ⇒ identical bits).

Scale: applyInPandas shuffles by the group key and hands each group to
one task as Arrow batches. Groups must fit in executor memory — right
for bounded-cardinality keys (event types, languages, tenants); for
unbounded keys use window functions instead (see the oracle, which is
exactly that plan).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame


def zscore_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    keep_cols: list[str],
) -> DataFrame:
    """(keep_cols..., group_col, value_col, z) with z standardized per
    group via exact-cent moments (sample stddev)."""

    out_fields = ", ".join(
        f"{c} {t}" for c, t in df.select(*keep_cols, group_col, value_col).dtypes
    )
    schema = f"{out_fields}, z double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = pdf[value_col].mul(100).round().astype("int64")
        n = len(pdf)
        s = int(cents.sum())
        ss = int((cents * cents).sum())
        sx = s / 100.0
        sxx = ss / 10000.0
        mean = sx / n
        if n > 1:
            var = (sxx - sx * sx / n) / (n - 1)
            sd = math.sqrt(var)
        else:
            sd = float("nan")
        out = pdf[[*keep_cols, group_col, value_col]].copy()
        out["z"] = (pdf[value_col] - mean) / sd
        return out

    return df.groupBy(group_col).applyInPandas(norm, schema=schema)
