"""In-database statistics queries: hypothesis tests, ranking metrics,
and distribution diagnostics over the fixture tables — the experiment
/ analysis surface of the engine (functions/stats.py), each with an
exactly-mirrored DuckDB oracle.

Oracle discipline (see functions/stats.py): exact integer sufficient
statistics, one deterministic double expression per scalar,
floor-quantized ``*_e6``/``*_e9`` outputs; association and conversion
points are written IDENTICALLY on both sides, so hashes are
bit-equal. The reference engine has no statistics surface (its
aggregates stop at COUNT/SUM/AVG/MIN/MAX,
/root/reference/src/operators/aggregation.cpp) — this module is part
of the §2.3 extension surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import stats
from .registry import register


@register(
    "eval_auc_quality",
    oracle="""WITH s AS (SELECT n_chars AS score, doc_id,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
              FROM documents),
                   r AS (SELECT y, RANK() OVER (ORDER BY score) AS rk_lo,
                                COUNT(*) OVER (PARTITION BY score) AS nt
                         FROM s),
                   a AS (SELECT SUM(CASE WHEN y = 1
                                         THEN 2 * rk_lo + nt - 1
                                         ELSE 0 END) AS two_rs,
                                SUM(y) AS np, COUNT(*) - SUM(y) AS nn
                         FROM r)
              SELECT CAST(np AS BIGINT) AS n_pos,
                     CAST(nn AS BIGINT) AS n_neg,
                     CAST(FLOOR(1000000.0 * (two_rs - np * (np + 1))
                                / (2.0 * np * nn)) AS BIGINT) AS auc_e6
              FROM a""",
    tags=("statistics", "eval", "rank", "aggregate"),
)
def eval_auc_quality(spark, sf_dir):
    """Mann-Whitney AUC of document length as an English-language
    classifier — 'does this score separate the classes' answered with
    one distributed rank pass, no pairwise materialization."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        (F.col("lang") == F.lit("en")).alias("is_en"),
    )
    return stats.mann_whitney_auc(d, "n_chars", "is_en", "doc_id")


@register(
    "stat_chisq_event_hours",
    oracle="""WITH d AS (SELECT event_type,
                     CAST(FLOOR(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) / 6)
                          AS INTEGER) AS hr_bucket
              FROM events),
                   obs AS (SELECT event_type, hr_bucket, COUNT(*) AS obs
                           FROM d GROUP BY 1, 2),
                   rt AS (SELECT event_type, SUM(obs) AS rt
                          FROM obs GROUP BY 1),
                   ct AS (SELECT hr_bucket, SUM(obs) AS ct
                          FROM obs GROUP BY 1),
                   nt AS (SELECT SUM(obs) AS n FROM obs),
                   cells AS (SELECT event_type, hr_bucket, o.obs,
                                    (CAST(rt.rt AS DOUBLE) * ct.ct) / nt.n
                                      AS expd
                             FROM obs o
                             JOIN rt USING (event_type)
                             JOIN ct USING (hr_bucket)
                             CROSS JOIN nt)
              SELECT event_type, hr_bucket, obs,
                     CAST(FLOOR(expd * 1000000.0) AS BIGINT) AS exp_e6,
                     CAST(FLOOR((obs - expd) * (obs - expd) / expd
                                * 1000000.0) AS BIGINT) AS contrib_e6
              FROM cells""",
    tags=("statistics", "aggregate", "groupby"),
)
def stat_chisq_event_hours(spark, sf_dir):
    """Chi-square contingency of event type × 6-hour time-of-day
    bucket — the independence screen for 'does the event mix shift
    over the day'. Cell contributions are emitted quantized so
    SUM(contrib_e6) IS the chi-square statistic, order-independent."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.hour("ts") / F.lit(6)).cast("int").alias("hr_bucket"),
    )
    out = stats.contingency_chi2(ev, "event_type", "hr_bucket")
    return out.select(
        F.col("row_key").alias("event_type"),
        F.col("col_key").alias("hr_bucket"),
        "obs",
        "exp_e6",
        "contrib_e6",
    )


@register(
    "stat_ttest_welch_value",
    oracle="""WITH v AS (SELECT CASE WHEN event_type = 'click'
                                     THEN 1 ELSE 0 END AS is_a,
                     CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v
              FROM events WHERE event_type IN ('click', 'purchase')),
                   g AS (SELECT is_a, COUNT(*) AS n, SUM(v) AS s1,
                                SUM(CAST(v AS HUGEINT) * v) AS s2
                         FROM v GROUP BY 1),
                   a AS (SELECT n AS n_a, CAST(s1 AS DOUBLE) AS s1a,
                                CAST(s2 AS DOUBLE) AS s2a
                         FROM g WHERE is_a = 1),
                   b AS (SELECT n AS n_b, CAST(s1 AS DOUBLE) AS s1b,
                                CAST(s2 AS DOUBLE) AS s2b
                         FROM g WHERE is_a = 0),
                   k AS (SELECT n_a, n_b,
                                s1a / n_a AS ma, s1b / n_b AS mb,
                                (s2a - s1a * s1a / n_a) / (n_a - 1) AS vara,
                                (s2b - s1b * s1b / n_b) / (n_b - 1) AS varb
                         FROM a CROSS JOIN b),
                   l AS (SELECT n_a, n_b, ma, mb,
                                vara / n_a AS sea, varb / n_b AS seb
                         FROM k)
              SELECT n_a, n_b,
                     CAST(FLOOR(ma) AS BIGINT) AS mean_a_e6,
                     CAST(FLOOR(mb) AS BIGINT) AS mean_b_e6,
                     CAST(FLOOR((ma - mb) / sqrt(sea + seb) * 1000000.0)
                          AS BIGINT) AS t_e6,
                     CAST(FLOOR((sea + seb) * (sea + seb)
                                / (sea * sea / (n_a - 1)
                                   + seb * seb / (n_b - 1))
                                * 1000.0) AS BIGINT) AS df_e3
              FROM l""",
    tags=("statistics", "aggregate"),
)
def stat_ttest_welch_value(spark, sf_dir):
    """Welch's t-test: does mean event value differ between clicks and
    purchases — the A/B primitive from one pass of exact e6-quantized
    sufficient statistics (Welch-Satterthwaite df included)."""
    ev = load_table(spark, sf_dir, "events")
    return stats.welch_ttest(ev, "value", "event_type", "click", "purchase")


@register(
    "corpus_kl_divergence",
    oracle=r"""WITH toks AS (SELECT source,
                     unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                       AS term
              FROM documents),
                   t2 AS (SELECT source, term FROM toks WHERE term <> ''),
                   p AS (SELECT source, term, COUNT(*) AS pc
                         FROM t2 GROUP BY 1, 2),
                   q AS (SELECT term, COUNT(*) AS qc FROM t2 GROUP BY 1),
                   pt AS (SELECT source, SUM(pc) AS pt FROM p GROUP BY 1),
                   qt AS (SELECT SUM(qc) AS qt FROM q),
                   c AS (SELECT source, pc,
                                CAST(FLOOR(1000000000.0
                                     * ((CAST(pc AS DOUBLE) / pt)
                                        * ln((CAST(pc AS DOUBLE) / pt)
                                             / (CAST(qc AS DOUBLE) / qt))))
                                     AS BIGINT) AS contrib_e9
                         FROM p
                         JOIN q USING (term)
                         JOIN pt USING (source)
                         CROSS JOIN qt)
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
                     CAST(SUM(pc) AS BIGINT) AS n_tokens,
                     CAST(SUM(contrib_e9) AS BIGINT) AS kl_e9
              FROM c GROUP BY source""",
    tags=("statistics", "text", "mixing", "aggregate"),
)
def corpus_kl_divergence(spark, sf_dir):
    """KL(P_source ‖ Q_corpus) over whitespace-token distributions —
    the per-source distribution-shift monitor a corpus-mixing pipeline
    tracks. Per-term contributions quantize before the per-source sum,
    so the divergence is exact integer arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "source",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    out = stats.kl_divergence_by_group(terms, "source", "term")
    return out.select(
        F.col("grp").alias("source"), "n_terms", "n_tokens", "kl_e9"
    )


@register(
    "stat_gini_order_value",
    oracle="""WITH s AS (SELECT CAST(FLOOR(o_totalprice * 1000000.0)
                                     AS BIGINT) AS v,
                                o_orderkey
                         FROM orders),
                   r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, o_orderkey)
                                     AS rn
                         FROM s),
                   a AS (SELECT COUNT(*) AS n, SUM(v) AS sx,
                                SUM(CAST(rn AS HUGEINT) * v) AS sixi
                         FROM r)
              SELECT CAST(n AS BIGINT) AS n,
                     CAST(sx AS BIGINT) AS total_e6,
                     CAST(FLOOR((2.0 * sixi / (n * CAST(sx AS DOUBLE))
                                 - CAST(n + 1 AS DOUBLE) / n)
                                * 1000000.0) AS BIGINT) AS gini_e6
              FROM a""",
    tags=("statistics", "rank", "aggregate"),
)
def stat_gini_order_value(spark, sf_dir):
    """Gini concentration of order value — revenue-inequality /
    shard-imbalance diagnostic via the rank identity, with the global
    rank computed by the distributed range-partition pattern (no
    single-partition window)."""
    orders = load_table(spark, sf_dir, "orders")
    return stats.gini_coefficient(orders, "o_totalprice", "o_orderkey")


@register(
    "dq_benford_totalprice",
    oracle="""WITH d AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100.0)
                                         AS BIGINT) AS VARCHAR), 1, 1)
                               AS INTEGER) AS digit
              FROM orders WHERE o_totalprice > 0),
                   c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
                   t AS (SELECT SUM(n) AS nt FROM c)
              SELECT digit, n,
                     CAST(FLOOR(CAST(n AS DOUBLE) / nt * 1000000.0)
                          AS BIGINT) AS share_e6,
                     CAST(FLOOR(ln(1.0 + 1.0 / digit) / ln(10.0)
                                * 1000000.0) AS BIGINT) AS benford_e6,
                     CAST(FLOOR(abs(CAST(n AS DOUBLE) / nt
                                    - ln(1.0 + 1.0 / digit) / ln(10.0))
                                * 1000000.0) AS BIGINT) AS dev_e6
              FROM c CROSS JOIN t""",
    tags=("statistics", "dq", "aggregate"),
)
def dq_benford_totalprice(spark, sf_dir):
    """First-significant-digit distribution of order totals vs
    Benford's law — the fabricated-data screen, with the digit
    extracted exactly from integer cents (no float-log boundary
    cases)."""
    orders = load_table(spark, sf_dir, "orders")
    return stats.benford_digits(orders, "o_totalprice")
