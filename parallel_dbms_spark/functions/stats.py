"""In-database statistics: hypothesis tests, ranking metrics, and
distribution diagnostics computed as single-pass distributed
aggregations — the "experiment analysis" surface a warehouse exposes
so analysts never pull raw rows to a notebook.

Everything here follows the engine's determinism discipline so the
results are bit-identical across engines and partitionings:

- sufficient statistics are accumulated EXACTLY (counts as BIGINT,
  value sums over e6-quantized integers carried in DECIMAL(38,0), so
  aggregation order cannot perturb them);
- the final scalar formula (t statistic, AUC, chi-square cell, KL
  term, Gini) is evaluated on those exact integers in one
  deterministic double expression, then floor-quantized to a BIGINT
  ``*_e6``/``*_e9`` column;
- where a per-group double must be SUMMED (chi-square total, KL
  divergence), the quantization happens per term BEFORE the sum, so
  the sum is integer arithmetic and order-independent.

Global-rank statistics (AUC's rank sums, Gini's i·x_i sum) use
:func:`..operators.relational.global_row_number` — the
range-partitioned distributed rank — never a single-partition global
window, so they hold at 100 TB.

The reference engine has no statistics surface at all (its aggregate
inventory is COUNT/SUM/AVG/MIN/MAX,
/root/reference/src/operators/aggregation.cpp); this module is part of
the extension surface SURVEY §2.3 calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.relational import global_row_number

# Exact integer accumulator type: wide enough that petabyte-scale sums
# of e6-quantized values cannot overflow (ANSI mode would throw on a
# BIGINT overflow rather than wrap, but 38 digits never gets there).
_ACC = "decimal(38,0)"


def _e6(col):
    """floor(1e6 * x) as BIGINT — the engine-wide float quantization
    idiom (matches the DuckDB oracle side ``CAST(FLOOR(x * 1000000.0)
    AS BIGINT)``)."""
    return F.floor(col * F.lit(1000000.0)).cast("bigint")


def mann_whitney_auc(
    df: DataFrame, score_col: str, label_col: str, id_col: str
) -> DataFrame:
    """AUC of ``score_col`` against binary ``label_col`` via the
    Mann-Whitney rank-sum identity — the standard evaluation of a
    scoring model (here: does the signal separate positives from
    negatives), computed without materializing any pair.

        AUC = (R⁺ - n⁺(n⁺+1)/2) / (n⁺ n⁻)

    where R⁺ is the positive-class rank sum under AVERAGE ranks (ties
    share the mean of their rank range — required for an unbiased AUC
    with discrete scores).

    Distributed plan: one :func:`global_row_number` over
    (score, id) — range shuffle, no global window — then a per-score
    aggregate recovers the tie groups: for a score with lowest row
    number ``rk_lo`` and ``nt`` ties, every tied row's average rank is
    ``rk_lo + (nt-1)/2``, so twice the positive rank sum is
    ``Σ n⁺_s · (2·rk_lo + nt - 1)`` — integer arithmetic, carried in
    DECIMAL(38,0). Only the final division is floating point.

    Returns one row: ``n_pos, n_neg, auc_e6``.
    """
    d = df.select(
        F.col(score_col).alias("score"),
        F.col(id_col).alias("_id"),
        F.when(F.col(label_col), F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    rn = global_row_number(d, [F.col("score").asc(), F.col("_id").asc()])
    per_score = rn.groupBy("score").agg(
        F.min("rn").alias("rk_lo"),
        F.count(F.lit(1)).alias("nt"),
        F.sum("y").alias("np_s"),
    )
    agg = per_score.agg(
        F.sum(
            (
                F.col("np_s")
                * (F.lit(2) * F.col("rk_lo") + F.col("nt") - F.lit(1))
            ).cast(_ACC)
        ).alias("two_rs"),
        F.sum("np_s").cast("bigint").alias("n_pos"),
        F.sum(F.col("nt") - F.col("np_s")).cast("bigint").alias("n_neg"),
    )
    np_, nn = F.col("n_pos"), F.col("n_neg")
    # subtract exactly (DECIMAL), convert to double ONCE — mirrors the
    # oracle's HUGEINT subtraction so no pre-conversion rounding can
    # diverge when 2·R⁺ exceeds 2^53
    diff = (
        F.col("two_rs") - (np_ * (np_ + F.lit(1))).cast(_ACC)
    ).cast("double")
    auc = F.lit(1000000.0) * diff / (F.lit(2.0) * np_ * nn)
    return agg.select(
        "n_pos", "n_neg", F.floor(auc).cast("bigint").alias("auc_e6")
    )


def contingency_chi2(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Chi-square contingency cells for ``row_col × col_col`` — the
    independence screen behind "does event mix differ by time of day /
    segment / experiment arm".

    One groupBy produces observed counts; row totals, column totals,
    and N are re-aggregations of that (already tiny) cell frame, so
    the raw table is scanned exactly once and every join after the
    first aggregate is a broadcast of group-cardinality rows.

    Expected counts and cell contributions are per-cell deterministic
    doubles over exact integers (``exp = double(rt)·ct / N``), emitted
    floor-quantized so a downstream SUM(contrib_e6) — the chi-square
    statistic — is order-independent integer arithmetic.

    Returns one row per observed cell:
    ``row_key, col_key, obs, exp_e6, contrib_e6``.
    """
    obs = df.groupBy(
        F.col(row_col).alias("row_key"), F.col(col_col).alias("col_key")
    ).agg(F.count(F.lit(1)).alias("obs"))
    row_tot = obs.groupBy("row_key").agg(F.sum("obs").alias("rt"))
    col_tot = obs.groupBy("col_key").agg(F.sum("obs").alias("ct"))
    n_tot = obs.agg(F.sum("obs").alias("n"))
    exp = (F.col("rt").cast("double") * F.col("ct")) / F.col("n")
    cells = (
        obs.join(F.broadcast(row_tot), "row_key")
        .join(F.broadcast(col_tot), "col_key")
        .crossJoin(F.broadcast(n_tot))
        .withColumn("exp", exp)
    )
    contrib = (
        (F.col("obs") - F.col("exp"))
        * (F.col("obs") - F.col("exp"))
        / F.col("exp")
    )
    return cells.select(
        "row_key",
        "col_key",
        "obs",
        _e6(F.col("exp")).alias("exp_e6"),
        _e6(contrib).alias("contrib_e6"),
    )


def welch_ttest(
    df: DataFrame, value_col: str, group_col: str, group_a, group_b
) -> DataFrame:
    """Welch's unequal-variance t-test between two groups — the A/B
    comparison primitive, computed from one pass of exact sufficient
    statistics.

    Each value is floor-quantized to an e6 integer FIRST, so the
    per-group sums Σv and Σv² are exact integers (DECIMAL(38,0)) and
    aggregation order is irrelevant; mean/variance/t/df are then one
    deterministic double expression over those integers. Units cancel
    in t (mean is e6, variance e12); df is Welch-Satterthwaite.

    Returns one row:
    ``n_a, n_b, mean_a_e6, mean_b_e6, t_e6, df_e3``.
    """
    v = F.floor(F.col(value_col) * F.lit(1000000.0)).cast("bigint")
    tagged = df.filter(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        F.when(F.col(group_col) == F.lit(group_a), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_a"),
        v.alias("v"),
    )
    g = tagged.groupBy("is_a").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast(_ACC)).alias("s1"),
        F.sum((F.col("v").cast(_ACC) * F.col("v"))).alias("s2"),
    )
    a = g.filter(F.col("is_a") == 1).select(
        F.col("n").alias("n_a"),
        F.col("s1").cast("double").alias("s1a"),
        F.col("s2").cast("double").alias("s2a"),
    )
    b = g.filter(F.col("is_a") == 0).select(
        F.col("n").alias("n_b"),
        F.col("s1").cast("double").alias("s1b"),
        F.col("s2").cast("double").alias("s2b"),
    )
    j = a.crossJoin(b)
    m_a = F.col("s1a") / F.col("n_a")
    m_b = F.col("s1b") / F.col("n_b")
    var_a = (F.col("s2a") - F.col("s1a") * F.col("s1a") / F.col("n_a")) / (
        F.col("n_a") - F.lit(1)
    )
    var_b = (F.col("s2b") - F.col("s1b") * F.col("s1b") / F.col("n_b")) / (
        F.col("n_b") - F.lit(1)
    )
    se_a = var_a / F.col("n_a")
    se_b = var_b / F.col("n_b")
    t = (m_a - m_b) / F.sqrt(se_a + se_b)
    df_w = (
        (se_a + se_b)
        * (se_a + se_b)
        / (
            se_a * se_a / (F.col("n_a") - F.lit(1))
            + se_b * se_b / (F.col("n_b") - F.lit(1))
        )
    )
    return j.select(
        "n_a",
        "n_b",
        F.floor(m_a).cast("bigint").alias("mean_a_e6"),
        F.floor(m_b).cast("bigint").alias("mean_b_e6"),
        _e6(t).alias("t_e6"),
        F.floor(df_w * F.lit(1000.0)).cast("bigint").alias("df_e3"),
    )


def kl_divergence_by_group(
    df: DataFrame, group_col: str, term_col: str
) -> DataFrame:
    """KL(P_group ‖ Q_corpus) over a term distribution — "how far does
    each source's token mix drift from the corpus mix", the
    distribution-shift monitor for corpus mixing (same role the Pile /
    RedPajama mixing recipes give per-source token histograms).

    Plan: one groupBy (group, term) for P counts, one groupBy (term)
    for Q counts, an equi-join ON TERM (both sides are term-keyed
    aggregates, so the join is co-partitioned after the shuffle), and
    per-group totals broadcast back. Every per-term KL contribution
    p·ln(p/q) is a deterministic double over exact counts, quantized
    to e9 BEFORE the per-group sum so the sum is exact integer
    arithmetic. P's support is a subset of Q's by construction, so no
    zero-q guard is needed; terms absent from a group contribute 0 by
    the usual convention and never appear in the join.

    Returns one row per group: ``group, n_terms, n_tokens, kl_e9``.
    """
    terms = df.select(
        F.col(group_col).alias("grp"), F.col(term_col).alias("term")
    )
    p_cnt = terms.groupBy("grp", "term").agg(
        F.count(F.lit(1)).alias("pc")
    )
    q_cnt = terms.groupBy("term").agg(F.count(F.lit(1)).alias("qc"))
    p_tot = p_cnt.groupBy("grp").agg(F.sum("pc").alias("pt"))
    q_tot = q_cnt.agg(F.sum("qc").alias("qt"))
    p = F.col("pc").cast("double") / F.col("pt")
    q = F.col("qc").cast("double") / F.col("qt")
    contrib_e9 = F.floor(
        F.lit(1000000000.0) * (p * F.log(p / q))
    ).cast("bigint")
    return (
        p_cnt.join(q_cnt, "term")
        .join(F.broadcast(p_tot), "grp")
        .crossJoin(F.broadcast(q_tot))
        .withColumn("contrib_e9", contrib_e9)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("pc").cast("bigint").alias("n_tokens"),
            F.sum("contrib_e9").cast("bigint").alias("kl_e9"),
        )
    )


def gini_coefficient(df: DataFrame, value_col: str, id_col: str) -> DataFrame:
    """Gini concentration coefficient of a non-negative value column
    (customer-spend inequality, shard-size imbalance) via the rank
    identity

        G = (2·Σ i·x_(i) / (n·Σx) ) - (n+1)/n

    with x_(i) the values in ascending order. The rank comes from
    :func:`global_row_number` (range shuffle, no global window);
    Σ i·x_i and Σx are exact integer sums over e6-quantized values in
    DECIMAL(38,0), so the only floating-point step is the final
    closed-form expression.

    Returns one row: ``n, total_e6, gini_e6``.
    """
    v = F.floor(F.col(value_col) * F.lit(1000000.0)).cast("bigint")
    d = df.select(v.alias("v"), F.col(id_col).alias("_id"))
    rn = global_row_number(d, [F.col("v").asc(), F.col("_id").asc()])
    agg = rn.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast(_ACC)).alias("sx"),
        F.sum((F.col("rn").cast(_ACC) * F.col("v"))).alias("sixi"),
    )
    n = F.col("n")
    gini = (
        F.lit(2.0)
        * F.col("sixi").cast("double")
        / (n * F.col("sx").cast("double"))
    ) - (n + F.lit(1)).cast("double") / n
    return agg.select(
        "n",
        F.col("sx").cast("bigint").alias("total_e6"),
        _e6(gini).alias("gini_e6"),
    )


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-data / corruption screen for a monetary column.

    The digit is extracted EXACTLY: the value is floor-quantized to
    integer cents (a BIGINT), and the leading character of that
    integer's decimal rendering is the digit. Integer-to-string is
    identical across engines, unlike double formatting, and unlike the
    float ``floor(log10 x)`` route there is no boundary case where
    log10(1000) evaluates to 2.9999… and misclassifies the digit.
    Benford's expected share log10(1+1/d) and the observed share are
    deterministic doubles over exact counts, floor-quantized.

    Assumes values ≥ 0.01 (monetary); rows ≤ 0 are excluded.

    Returns up to 9 rows: ``digit, n, share_e6, benford_e6, dev_e6``.
    """
    x = F.col(value_col)
    cents = F.floor(x * F.lit(100.0)).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (
        df.filter(x > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("nt"))
    share = F.col("n").cast("double") / F.col("nt")
    benford = F.log(
        F.lit(1.0) + F.lit(1.0) / F.col("digit")
    ) / F.log(F.lit(10.0))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            _e6(share).alias("share_e6"),
            _e6(benford).alias("benford_e6"),
            _e6(F.abs(share - benford)).alias("dev_e6"),
        )
    )


def bootstrap_replicate_means(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int = 32,
    threshold_hex: str = "80000000",
) -> DataFrame:
    """Hash-deterministic m-out-of-n bootstrap: ``n_replicates``
    half-sample means of a value column, the input to a percentile
    confidence interval for the mean (Politis-Romano subsampling /
    m-out-of-n bootstrap — valid CIs at m = n/2 with the usual
    sqrt(m/n) rescale, which the caller applies if they want exact
    coverage rather than a spread diagnostic).

    Membership of row i in replicate r is ``md5(i || '|' || r)``'s
    leading 8 hex chars compared to ``threshold_hex`` — a pure function
    of (id, r), so replicates are reproducible across engines, runs,
    and partitionings (no RNG state, no seed plumbing).

    Scale shape: ONE scan, ``n_replicates`` conditional aggregates —
    never an explode/cross-join that would shuffle B×N rows. Values
    floor-quantize to e6 integers before the sums (exact DECIMAL
    accumulation), so each replicate mean is one deterministic double.

    Returns ``n_replicates`` rows: ``replicate, n, mean_e6``.
    """
    key = F.col(id_col).cast("string")
    v = F.floor(F.col(value_col) * F.lit(1000000.0)).cast("bigint")
    d = df.select(key.alias("_k"), v.alias("_v"))
    aggs = []
    for r in range(n_replicates):
        m = F.substring(
            F.md5(F.concat_ws("|", F.col("_k"), F.lit(str(r)))), 1, 8
        )
        inc = m < F.lit(threshold_hex)
        aggs.append(
            F.sum(F.when(inc, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"n_{r}")
        )
        aggs.append(
            F.sum(F.when(inc, F.col("_v").cast(_ACC)).otherwise(None)).alias(
                f"s_{r}"
            )
        )
    wide = d.agg(*aggs)
    # reshape the one wide row to (replicate, n, mean_e6) via stack —
    # a projection of a single row, not a shuffle
    pairs = ", ".join(
        f"{r}, n_{r}, CAST(FLOOR(CAST(s_{r} AS DOUBLE) / n_{r}) AS BIGINT)"
        for r in range(n_replicates)
    )
    return wide.selectExpr(
        f"stack({n_replicates}, {pairs}) AS (replicate, n, mean_e6)"
    ).select(
        F.col("replicate").cast("int").alias("replicate"), "n", "mean_e6"
    )


def covariance_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Sample covariance matrix of numeric columns from ONE scan of
    exact sufficient statistics: per pair (i ≤ j), Σxᵢ, Σxⱼ, Σxᵢxⱼ over
    e6-quantized values in DECIMAL(38,0); cov = (Σxy - ΣxΣy/n)/(n-1)
    evaluated once in double per cell. Output covariances are in the
    ORIGINAL units (the e12 quantization factor divides back out),
    floor-quantized to ``cov_e6``.

    Returns one row per ordered pair i ≤ j: ``col_a, col_b, n,
    cov_e6`` — the upper triangle (the matrix is symmetric).
    """
    qs = {
        c: F.floor(F.col(c) * F.lit(1000000.0)).cast("bigint") for c in cols
    }
    d = df.select([qs[c].alias(f"_q_{c}") for c in cols])
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(f"_q_{c}").cast(_ACC)).alias(f"_s_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(
                F.sum(
                    F.col(f"_q_{a}").cast(_ACC) * F.col(f"_q_{b}")
                ).alias(f"_p_{a}_{b}")
            )
    wide = d.agg(*aggs)
    rows = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            n = F.col("_n")
            cov = (
                F.col(f"_p_{a}_{b}").cast("double")
                - F.col(f"_s_{a}").cast("double")
                * F.col(f"_s_{b}").cast("double")
                / n
            ) / (n - F.lit(1))
            rows.append(
                wide.select(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    n.cast("bigint").alias("n"),
                    # e12 units -> original units, then e6 quantize:
                    # net divide by 1e6
                    F.floor(cov / F.lit(1000000.0))
                    .cast("bigint")
                    .alias("cov_e6"),
                )
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
