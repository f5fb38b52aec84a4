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
# ROUND-13 ROTATION (applied): all 50 r12 rows graded green and the
# oracled-never-graded debt is again ZERO after this round's three
# conversions, so the r12 staleness policy repeats: 29 keepers = the
# exact-minimal set cover (branch-and-bound, scripts/rotate_window.py,
# re-solved over the r12-enlarged graded history) of the families only
# ever-graded rows carry; 3 slots take this round's conversions
# (multimodal_phash_neardup — the integer-dHash decode->dedup twin;
# sim_mmr_topk — the 6th pinned twin, integer micro-unit MMR greedy;
# stream_neardup_dedup_docs — the md5-band streaming dedup whose
# exactly-once survivor set now grades by value); and the remaining
# 18 slots RE-GRADE the oracled rows whose latest green grade is the
# OLDEST on file (15 last graded r2, plus the three stalest r3 rows
# including typed_csv_roundtrip — the O1/O16 CSV face, VERDICT r12's
# named stalest lineage). Every incoming row oracle-verified at
# sf0.01 AND sf0.1 before rotation. Rotated out (graded green r12,
# history in CORRECTNESS_r12.json): scan_project (projection/scan now
# carried by sql_lateral_alias + project_expressions' re-grade slot),
# multimodal_pcm_energy (multimodal/pandas_udf carried by the phash
# conversion), stream_tx_change_feed (cdc-feed carried by
# lake_tx_update_cdf_images, source by stream_tx_partitioned_sink),
# and the r12 conversion/re-grade tail — all still exported and
# oracled, just unwindowed.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- 29 keepers: exact-minimal set cover of the families no
    # unwindowed row re-covers (all graded green r2-r12) ---
    "agg_histogram_quantiles",        # histogram + sketch + window
    "agg_two_stage_distinct",         # distinct + skew
    "batch_session_window_native",    # session_window + streaming
    "decontaminate_vs_benchmark",     # dedup + jaccard
    "er_resolve_parts",               # clustering + fuzzy + pipeline
    "event_transition_matrix",        # sessionize + window
    "filter_pushdown_conj",           # filter + pushdown
    "impute_group_mean",              # aggregate + join + null
    "interval_overlap_sessions",      # join + range + timeseries
    "join_theta_only",                # bnlj + theta
    "json_agg_by_type",               # functions + json
    "lake_sql_lifecycle",             # sql door: ddl + identity +
                                      #  row-tracking + bloom + vacuum
                                      #  + retention + column-mapping
                                      #  + constraints + metadata
    "lake_tx_check_constraints",      # constraints + dq + versioned
    "lake_tx_update_cdf_images",      # cdc-feed + acid + versioned
    "mv_txlog_ivm",                   # cdc + ivm + mv + rollup
    "order_by_multikey",              # limit + sort
    "pipeline_hybrid_retrieval",      # bm25 + search + text
    "rfm_segments",                   # ntile + window
    "scd2_pit_enrich",                # asof + cdc + scd2
    "search_phrase",                  # phrase + search
    "seasonal_profile_hourly",        # profiling + timeseries
    "set_except",                     # setop
    "sql_lateral_alias",              # projection + scan + sql
    "sql_recursive_forest_rollup",    # recursive
    "stream_stream_left_outer",       # outer + streaming + watermark
    "stream_tx_partitioned_sink",     # sink + source + partition +
                                      #  data-skipping
    "text_tfidf_topk",                # tfidf
    "tpch_q22_shape",                 # anti + subquery + tpch
    "vector_centroid_drift",          # vectors + aggregate
    # --- 3 round-13 conversions (never graded; oracle-verified at
    # sf0.01 AND sf0.1 before rotation) ---
    "multimodal_phash_neardup",       # multimodal + dedup + pandas_udf
                                      #  + decode (integer-dHash twin)
    "sim_mmr_topk",                   # similarity + mmr (6th pinned
                                      #  twin: integer MMR greedy)
    "stream_neardup_dedup_docs",      # streaming + dedup + lsh (md5
                                      #  band mode: stream ≡ batch ≡
                                      #  DuckDB by value)
    # --- 18 staleness re-grades: oracled rows whose latest green
    # grade is the oldest on file (15 x r2, 3 x r3) ---
    "agg_percentiles",
    "agg_variance_corr",
    "filter_date_range",
    "order_by_string",
    "set_intersect",
    "set_union",
    "string_functions",
    "tpch_q14_shape",
    "tpch_q18_shape",
    "tpch_q3_shape",
    "tpch_q5_shape",
    "window_range_frame",
    "window_rank_lag",
    "window_running_sum",
    "window_topk_per_group",
    "agg_grouped_q1",
    "agg_ungrouped_all5",
    "typed_csv_roundtrip",
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
