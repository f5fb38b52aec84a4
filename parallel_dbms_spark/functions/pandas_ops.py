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


def pack_sequences(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Sequence packing: assign documents to context-window bins of at
    most ``budget`` tokens, greedily in ``id_col`` order within each
    ``group_col`` partition (the standard pretraining-data step that
    turns variable-length documents into fixed-budget training rows).

    Greedy close-when-full is inherently sequential per group — a
    running total that RESETS on overflow is not a window function —
    so it runs as a grouped-map pandas operator: one Arrow batch per
    group, a vectorized-enough cumsum loop inside. Output is
    deterministic (sort by id within group) and bins are contiguous id
    ranges.

    Scale: groups are shuffled once by ``group_col``; each group must
    fit one task. For 100 TB, pre-split groups by a date/shard column
    so each pandas group is a few hundred MB — packing quality is
    unaffected because bins never cross documents anyway. A document
    alone over budget gets its own bin (callers chunk oversized docs
    upstream).

    Returns (group_col, id_col, tokens_col, bin_id, bin_tokens) with
    bin_id dense per group and bin_tokens the bin's total.
    """
    gtype = dict(df.dtypes)[group_col]
    schema = (
        f"{group_col} {gtype}, {id_col} long, {tokens_col} long, "
        "bin_id long, bin_tokens long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        toks = pdf[tokens_col].astype("int64").to_numpy()
        bins, totals = [], []
        bin_id, running = 0, 0
        for t in toks:
            if running > 0 and running + t > budget:
                bin_id += 1
                running = 0
            running += int(t)
            bins.append(bin_id)
            totals.append(running)
        out = pdf[[group_col, id_col, tokens_col]].copy()
        out["bin_id"] = bins
        # bin_tokens = final total of the bin each row landed in
        bt = pd.Series(totals).groupby(pd.Series(bins)).transform("max")
        out["bin_tokens"] = bt.to_numpy()
        return out

    return df.select(group_col, id_col, tokens_col).groupBy(group_col).applyInPandas(
        pack, schema=schema
    )


def weighted_mean_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """User-defined AGGREGATE via a pandas GROUPED_AGG UDF.

    sum(w*v)/sum(w) per group — the UDAF extension point the reference
    lacks entirely (SURVEY §2.3 UDF/UDAF row). The UDF receives each
    group's columns as Arrow-backed pandas Series and returns one
    scalar; Spark runs it as a real aggregate (works in groupBy *and*
    over windows). Float sums are order-dependent → rows-only check,
    pytest-asserted against the exact decimal SQL within 1e-9.

    Scale: partial aggregation does NOT apply to pandas GROUPED_AGG —
    all of a group's rows shuffle to one task. Bounded-cardinality
    group keys only; for high-cardinality keys express the same thing
    with built-ins (sum(w*v)/sum(w)) which DO combine map-side.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    return df.groupBy(group_col).agg(
        wmean(F.col(value_col), F.col(weight_col)).alias("weighted_mean")
    )


def ewma_by_key(
    df,
    key: str,
    ts: str,
    value: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
    tiebreak: str | None = None,
):
    """Exponentially weighted moving average per key — the recursive
    smoother (s_t = α·x_t + (1-α)·s_{t-1}) that windowed SQL cannot
    express (every output depends on the ENTIRE per-key prefix, not a
    bounded frame), hence the sanctioned Arrow path: applyInPandas
    with one vectorized ``Series.ewm`` per key group.

    Scale: one shuffle on the key; per-task state is one key's series
    (the same bound as sessionize/asof — salt by time range if a
    single key outgrows a partition). Output: key, ts, value, ewma.
    Differential-tested against pandas ewm directly and against the
    closed-form recursion on a hand-computed series.
    """
    from pyspark.sql import functions as F  # noqa: F401  (parity w/ module style)

    schema = (
        f"{key} long, {ts} timestamp, {value} double, {out_col} double"
    )
    sort_cols = [ts] if tiebreak is None else [ts, tiebreak]
    in_cols = [key, ts, value] + ([tiebreak] if tiebreak else [])

    def smooth(pdf):
        import pandas as pd  # noqa: F401

        # stable sort; an explicit tiebreak column makes equal
        # timestamps deterministic across partitionings (without it,
        # ties keep the Spark-delivered input order)
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        pdf[out_col] = (
            pdf[value].astype("float64").ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf[[key, ts, value, out_col]]

    return (
        df.select(*in_cols)
        .groupBy(key)
        .applyInPandas(smooth, schema=schema)
    )
