"""Distributed linear-model fitting via normal equations — classic
in-database ML: the model solves on the driver, the DATA never leaves
the executors.

For features X (d small: engineered per-row signals) and label y, OLS/
ridge needs only the sufficient statistics X'X (d×d) and X'y (d) —
both are plain SUMs of per-row products, i.e. ONE map-side-combined
aggregation pass whose reduce output is d(d+3)/2 numbers regardless of
row count. The driver solves the d×d system with numpy (model
parameters, like IVF centroids / BPE merges) and scoring is a codegen
dot product — no UDF, no shuffle.

This is the supervised sibling of ``similarity.power_iteration_pc1``
(same sufficient-statistics discipline) and covers the quality-
classifier / signal-regression stage of a corpus pipeline: fit a tiny
linear model on cheap engineered features, score 100 TB with a
projection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def linear_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    l2: float = 0.0,
    fit_intercept: bool = True,
):
    """Least-squares fit of ``label ~ features`` (+ optional ridge
    penalty ``l2``; the intercept is never penalized). Returns
    (coefficients dict {feature: beta}, intercept float).

    One aggregation pass computes all of X'X and X'y; only those
    d(d+3)/2 sums reach the driver.
    """
    import numpy as np

    cols = list(feature_cols)
    if fit_intercept:
        terms = [F.lit(1.0).alias("__one")] + [
            F.col(c).cast("double") for c in cols
        ]
        names = ["__one"] + cols
    else:
        terms = [F.col(c).cast("double") for c in cols]
        names = list(cols)
    d = len(names)
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(terms[i] * terms[j]).alias(f"__xx_{i}_{j}"))
    for i in range(d):
        aggs.append(
            F.sum(terms[i] * F.col(label_col).cast("double")).alias(f"__xy_{i}")
        )
    row = df.agg(*aggs).head()
    if row is None or row[f"__xx_0_0"] is None:
        raise ValueError("linear_fit: empty input")
    xtx = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            xtx[i, j] = xtx[j, i] = row[f"__xx_{i}_{j}"]
    xty = np.array([row[f"__xy_{i}"] for i in range(d)])
    if l2:
        reg = np.eye(d) * l2
        if fit_intercept:
            reg[0, 0] = 0.0  # never penalize the intercept
        xtx = xtx + reg
    try:
        beta = np.linalg.solve(xtx, xty)
    except np.linalg.LinAlgError as e:
        raise ValueError(
            "linear_fit: X'X is singular — a feature is constant or "
            "collinear with others; drop it or pass l2 > 0"
        ) from e
    if fit_intercept:
        return dict(zip(cols, map(float, beta[1:]))), float(beta[0])
    return dict(zip(cols, map(float, beta))), 0.0


def predict_expr(coefficients: dict, intercept: float) -> F.Column:
    """The scoring expression: a pure-codegen linear combination —
    broadcastable to any width of data with zero Python in the path."""
    expr = F.lit(float(intercept))
    for c, b in coefficients.items():
        expr = expr + F.col(c).cast("double") * F.lit(float(b))
    return expr


def fit_and_score(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    l2: float = 0.0,
    out_col: str = "prediction",
) -> DataFrame:
    """Fit, then score the SAME frame (the in-database regression
    query shape); adds ``out_col`` and ``residual``."""
    coefs, b0 = linear_fit(df, feature_cols, label_col, l2)
    pred = predict_expr(coefs, b0)
    return df.withColumn(out_col, pred).withColumn(
        "residual", F.col(label_col).cast("double") - F.col(out_col)
    )
