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
DRIVER_WINDOW: tuple[str, ...] = (
    # reference parity: scan/filter/project/aggregate (O1-O8)
    "scan_project",
    "filter_pushdown_conj",
    "agg_ungrouped_all5",
    "agg_grouped_q1",
    "grouping_rollup",
    # joins (O9-O12): equi/pure-theta/outer/anti (conjunctive theta =
    # join_theta_conj, graded green in r02, yields its slot to the
    # recursive-CTE family below)
    "join_broadcast_equi",
    "join_theta_only",
    "join_left_outer",
    "join_anti",
    # sort/limit (O13-O15), distinct/set ops
    "top_n",
    "distinct_values",
    "set_except",
    # windows, subqueries, functions, nulls (per-group top-k =
    # window_topk_per_group, graded green in r02, yields its slot to
    # the search family below)
    "window_moving_avg_7d",
    "window_ntile_deciles",
    "sql_correlated_subquery",
    "scalar_functions",
    "json_extract_props",
    "null_semantics",
    # source/sink (O1/O16)
    "typed_csv_roundtrip",
    # temporal joins, skew handling, timeseries
    "scd2_pit_enrich",
    "range_join_time_band",
    "join_skew_salted_q",
    "agg_histogram_quantiles",
    "resample_ffill_hourly",
    # profiling / cdc / sessionize / flagship
    "profile_orders",
    "dq_orders_expectations",
    "sessionize_events",
    "flagship_revenue_by_nation",
    # TPC-H shapes
    "mv_rollup_rewrite",
    "tpch_q21_shape",
    # structured streaming (batch-SQL oracles)
    "stream_tumbling_hour",
    "stream_session_30m",
    "stream_dedup_within_watermark",
    # LLM-pipeline: dedup
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_fuzzy_names",
    # text analysis
    "text_stats",
    "text_tfidf_topk",
    "text_bm25_topk",
    # similarity / vectors
    "sim_bruteforce_topk",
    "vector_centroids",
    # multimodal, sampling, end-to-end pipeline
    "multimodal_resize",
    "pipeline_clean_corpus",
    # native recursive CTE + full-text search (round-3 families)
    "sql_recursive_month_spine",
    "search_phrase",
    # SCD2 (batch + streamed), lake data skipping (range + bloom)
    "scd2_user_state",
    "stream_scd2_dimension",
    "lake_skipping_scan",
    "lake_bloom_point_lookup",
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
