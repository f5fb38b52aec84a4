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


def logistic_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iters: int = 12,
    l2: float = 1e-8,
    fit_intercept: bool = True,
):
    """Logistic regression via IRLS (Newton-Raphson) — the quality-
    classifier sibling of ``linear_fit``, same sufficient-statistics
    discipline: per iteration ONE map-side-combined aggregation pass
    computes the gradient X'(p-y) (d numbers) and Hessian X'WX
    (d(d+1)/2 numbers, W = p(1-p)); the d×d solve happens on the
    driver. Data never leaves the executors; per-step driver traffic
    is O(d²) regardless of row count, so 100 TB costs ``iters`` scans
    of a (cacheable) projected frame.

    The per-row probability p = sigmoid(x·beta) is a pure-codegen
    expression rebuilt from the current beta literals each step — no
    UDF anywhere. Labels must be 0/1 (cast to double). Returns
    (coefficients dict, intercept). ``l2`` keeps the Hessian positive
    definite on separable data (intercept unpenalized).
    """
    import numpy as np

    cols = list(feature_cols)
    if fit_intercept:
        terms = [F.lit(1.0).alias("__one")] + [
            F.col(c).cast("double") for c in cols
        ]
    else:
        terms = [F.col(c).cast("double") for c in cols]
    d = len(terms)
    y = F.col(label_col).cast("double")
    beta = np.zeros(d)

    for _ in range(iters):
        z = F.lit(0.0)
        for i in range(d):
            z = z + terms[i] * F.lit(float(beta[i]))
        # clamp keeps exp() finite in ANSI mode on separable data
        z = F.greatest(F.lit(-30.0), F.least(F.lit(30.0), z))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        w = p * (F.lit(1.0) - p)
        aggs = [F.sum(terms[i] * (p - y)).alias(f"__g_{i}") for i in range(d)]
        for i in range(d):
            for j in range(i, d):
                aggs.append(
                    F.sum(terms[i] * terms[j] * w).alias(f"__h_{i}_{j}")
                )
        row = df.agg(*aggs).head()
        if row is None or row["__g_0"] is None:
            raise ValueError("logistic_fit: empty input")
        g = np.array([row[f"__g_{i}"] for i in range(d)])
        h = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                h[i, j] = h[j, i] = row[f"__h_{i}_{j}"]
        reg = np.eye(d) * l2
        if fit_intercept:
            reg[0, 0] = 0.0
        g = g + (reg @ beta)
        h = h + reg
        try:
            step = np.linalg.solve(h, g)
        except np.linalg.LinAlgError as e:
            raise ValueError(
                "logistic_fit: singular Hessian — constant/collinear "
                "feature or fully separated data; raise l2"
            ) from e
        beta = beta - step
        if float(np.max(np.abs(step))) < 1e-12:
            break
    if fit_intercept:
        return dict(zip(cols, map(float, beta[1:]))), float(beta[0])
    return dict(zip(cols, map(float, beta))), 0.0


def predict_proba_expr(coefficients: dict, intercept: float) -> F.Column:
    """sigmoid(linear score) as a codegen expression — scores any
    width of data with zero Python in the path."""
    z = predict_expr(coefficients, intercept)
    z = F.greatest(F.lit(-30.0), F.least(F.lit(30.0), z))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
