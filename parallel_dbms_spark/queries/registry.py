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

# The driver grades the FIRST 50 registry entries, so the exported
# order is curated: one-or-more oracle-backed representatives of EVERY
# operator family (reference parity O1-O18, the §2.3 gap categories,
# dedup/similarity/text/multimodal/sampling/pipeline, streaming,
# TPC-H) inside that window, rather than whatever module import order
# produces. Entries not listed here follow in registration order.
# tests/test_registry_window.py asserts the window's family coverage.
#
# ROUND-5 ROTATION: 18 rows with graded-green history (8 of them green
# in 2+ rounds, the rest green in r4) yield their slots to 18 oracled
# queries the driver has never graded — the 7 round-4 additions
# (lake deletes, Z-order 3D, PIVOT, spatial radius, SQL UDF, pipe
# syntax, sharded as-of) plus 11 more judge-verified rows. Rotated out
# (history preserved in CORRECTNESS_r0{2,3,4}.json):
# join_skew_salted_q, scd2_pit_enrich, stream_tumbling_hour,
# dedup_exact, text_stats, pipeline_clean_corpus, scd2_user_state,
# lake_skipping_scan, agg_bitmap_distinct_weekly, agg_mode_listagg,
# sql_nulls_ordering, sql_recursive_customer_chain, asof_join_nearest,
# interval_overlap_sessions, search_substring_trigram,
# search_containment_pairs, lake_instant_count, lake_version_diff.
# Family coverage invariant verified: asof_join_sharded_backward keeps
# skew+asof, spatial_radius_pairs keeps range, agg_percentile_disc +
# anomaly_hourly_counts keep aggregate/sketch depth, lake_time_travel +
# lake_delete_keys + lake_zorder_3d_skipping keep lake/cdc/skipping.
DRIVER_WINDOW: tuple[str, ...] = (
    # reference parity: scan/filter/project (O1-O5)
    "scan_project",
    "filter_pushdown_conj",
    # aggregates: percentile_disc, anomaly detection, winsorize/robust
    # z-score two-pass percentile cleaning
    "agg_percentile_disc",
    "anomaly_hourly_counts",
    "robust_zscore_prices",
    # joins (O9-O12): equi/pure-theta/outer
    "join_broadcast_equi",
    "join_theta_only",
    "join_left_outer",
    # sort/limit (O13-O15), set ops
    "top_n",
    "set_except",
    # windows: distinct-over-trailing-range, ntile, rolling median
    "window_distinct_trailing_7d",
    "window_ntile_deciles",
    "window_rolling_median",
    # SQL depth: recursive CTE, TPC-H Q17, JSON, dialect (PIVOT, pipe,
    # SQL-language UDF)
    "sql_recursive_balance_paydown",
    "tpch_q17_shape",
    "json_extract_props",
    "sql_pivot_syntax",
    "sql_pipe_syntax",
    "sql_udf_scalar",
    # temporal joins: as-of forward/strict/sharded (skew), spatial
    "asof_join_strict",
    "asof_join_sharded_backward",
    "spatial_radius_pairs",
    "agg_histogram_quantiles",
    # profiling / dq / validation / sessionize / timeseries
    "profile_orders",
    "dq_orders_expectations",
    "validate_orders",
    "sessionize_events",
    "daily_orders_gapfilled",
    "funnel_view_click_purchase",
    # reshape
    "unpivot_lineitem_metrics",
    "array_functions",
    # TPC-H / MV shapes
    "mv_rollup_rewrite",
    "tpch_q21_shape",
    # structured streaming (batch-SQL oracles)
    "stream_session_30m",
    "stream_dedup_within_watermark",
    # LLM-pipeline: dedup
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_fuzzy_names",
    # text analysis
    "text_tfidf_topk",
    "text_bm25_topk",
    # similarity / vectors
    "sim_bruteforce_topk",
    "vector_centroids",
    # multimodal, search
    "multimodal_resize",
    "search_phrase",
    # SCD2 streamed, lake: bloom, sorted export, time travel, deletes,
    # N-D Z-order skipping
    "stream_scd2_dimension",
    "lake_bloom_point_lookup",
    "lake_sorted_export",
    "lake_time_travel",
    "lake_delete_keys",
    "lake_zorder_3d_skipping",
)


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def _ordered() -> list[str]:
    window = [n for n in DRIVER_WINDOW if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in DRIVER_WINDOW]
    return window + rest


def _configured(fn):
    """Exported queries may run on a DRIVER-provided SparkSession that
    lacks our runtime confs (UTC zone, nanos-as-long scan, AQE, bloom
    pruning). ``session.configure`` is idempotent and runtime-settable,
    so every exported entry normalizes the session it is handed."""
    import functools

    @functools.wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..session import configure

        configure(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _configured(REGISTRY[name].fn) for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered()
        if REGISTRY[name].oracle
    }
