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
# ROUND-11 ROTATION (applied): all 50 r10 rows graded green, so the
# window re-solves: 23 keepers = the exact-minimal set cover
# (branch-and-bound, scripts/rotate_window.py) of the families no
# never-graded oracled row carries, and 27 slots rotate to never-graded
# rows — every incoming row oracle-verified at sf0.01 AND sf0.1 before
# rotation, clearing the oracled-never-graded debt to ZERO. The keeper
# count dropped 35 -> 23 through (a) the round-11 SQL-door row
# lake_sql_lifecycle carrying nine previously keeper-pinned families
# in one integration row (column-mapping, constraints, metadata,
# vacuum, retention, versioned, identity, merge, row-tracking, bloom),
# (b) the two new conversions multimodal_audio_energy ('multimodal')
# and text_bpe_apply, and (c) four honest tag repairs verified against
# the queries' actual semantics: dedup_minhash_lsh emits the
# minhash-ESTIMATED Jaccard coefficient ('jaccard'),
# lake_compact_roundtrip writes-and-grades its compacted output
# ('sink'), categorical_drift_event_types materializes the cohorts'
# distribution profiles ('profiling'), sample_k_per_group is top-N
# per group via row_number <= k ('limit'), plus agg_percentile_cont
# extended on BOTH engines with total-order NTILE(4) quartile mass
# ('ntile').
# Rotated out (graded history in CORRECTNESS_r*.json): lake_instant_
# distinct, order_by_multikey, stream_tx_merge_upsert, tpch_q19_shape,
# lake_tx_column_mapping, lake_tx_point_lookup_bloom,
# lake_tx_vacuum_retention, lake_tx_identity_merge,
# lake_tx_row_tracking, sql_recursive_forest_rollup, join_band_prices,
# set_intersect_active_users, sessionize_gap_stats,
# multimodal_pcm_energy, decontaminate_vs_benchmark, ... see git.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- 23 keepers: exact-minimal set cover (branch-and-bound,
    # scripts/rotate_window.py) of the families no never-graded
    # oracled row carries (all graded green r2-r10) ---
    "agg_two_stage_distinct",         # distinct + skew
    "batch_session_window_native",    # session_window + streaming
    "er_resolve_parts",               # clustering + fuzzy
    "event_transition_matrix",        # sessionize
    "filter_pushdown_conj",           # filter + pushdown
    "interval_overlap_sessions",      # range
    "join_theta_only",                # bnlj + theta
    "json_agg_by_type",               # functions + json
    "mv_txlog_ivm",                   # cdc + ivm + mv + rollup
    "pipeline_hybrid_retrieval",      # bm25 + search + similarity
    "scan_project",                   # projection + scan
    "scd2_pit_enrich",                # asof + cdc + scd2
    "search_phrase",                  # phrase + search
    "set_except",                     # setop
    "sql_nulls_ordering",             # null + sort
    "sql_recursive_balance_paydown",  # recursive
    "stream_dq_report",               # dq + streaming
    "stream_histogram_value",         # histogram + streaming
    "stream_stream_left_outer",       # outer + streaming + watermark
    "stream_tx_change_feed",          # cdc-feed + streaming
    "text_tfidf_topk",                # tfidf
    "tpch_q22_shape",                 # anti + subquery + tpch
    "vector_label_affinity",          # similarity + vectors
    # --- 27 first-time rows (never driver-graded; every one
    # oracle-verified at sf0.01 AND sf0.1 before rotation — this
    # clears the oracled-never-graded debt to ZERO) ---
    # round-11 feature proofs
    "lake_sql_lifecycle",             # sql door: ddl + identity + merge
                                      #  + row-tracking + bloom + vacuum
                                      #  + retention + column-mapping
                                      #  + constraints + metadata
    "multimodal_audio_energy",        # multimodal + audio (mapInPandas)
    "text_bpe_apply",                 # tokenizer (pinned-merge encoder)
    # round-10/11 conversions (md5 modes / invariant oracles)
    "dedup_minhash_lsh",              # dedup + lsh + jaccard
    "dedup_simhash",                  # dedup + simhash
    "freq_cms_estimates",             # frequency + sketch
    "freq_join_cardinality_est",      # frequency + join + sketch
    "dedup_duplicate_spans",          # dedup + ngram + spans
    "dedup_span_intervals",           # dedup + spans + window
    "dedup_cut_spans",                # dedup + pipeline + spans
    # round-10 feature rows first graded now
    "lake_tx_type_widening",          # widening + evolution
    "lake_tx_column_defaults",        # defaults + evolution
    "lake_tx_generated_partition",    # generated + partition + skipping
    # older judge-verified tail (VERDICT r10 check_oracles: all green)
    "agg_percentile_cont",            # percentile + cont + ntile
    "sql_collated_group",             # collation + dialect + sql
    "basket_pairs_support",           # basket + self_join
    "zorder_key_orders",              # lake + zorder
    "sample_k_per_group",             # sampling + limit
    "incremental_rollup_merge",       # incremental + aggregate
    "lake_compact_roundtrip",         # compaction + source + sink
    "categorical_drift_event_types",  # drift + profiling
    "pareto_frontier_parts",          # skyline + pandas_udf
    "changepoint_cusum_priority",     # anomaly + timeseries + window
    "pandas_zscore_by_type",          # groupby + pandas_udf
    "corpus_sample_10pct",            # sampling
    "chunk_documents_32",             # chunking + text
    "sample_contrastive_negatives",   # contrastive + sampling
)
# Swapped out late in round 10 for the identity/row-tracking feature
# proofs (every family they carried stays covered by other rows):
# zorder_key_orders, sample_k_per_group — both judge-verified green
# at sf0.01 (VERDICT r9), still exported and oracled, just unwindowed.


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
