"""SparkSession factory and session normalization.

Replaces the reference's catalog/session bootstrap
(``DuckDBManager::create``, /root/reference/src/headers/duckdb_manager.cpp:30-39)
with a SparkSession tuned for analytical work. Where the reference
*disables* statistics propagation, we keep Catalyst statistics and
enable AQE so plans re-optimize on runtime stats — the right call at
100 TB, where static stats are stale and skew is the norm.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs every entry point applies, including when a
# SparkSession is handed to us by an external driver (``configure``).
_RUNTIME_CONFS = {
    # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no ns
    # timestamp, so scan them as int64 ns and convert (catalog.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # timestamp[us] with no zone would scan as TIMESTAMP_NTZ; typing it
    # as session-zone TIMESTAMP at the SCAN (instead of a post-scan
    # cast) keeps range predicates on time columns pushable into the
    # parquet reader — at 100 TB that is row-group pruning on every
    # time filter. Session zone is pinned UTC below, so values are
    # identical either way; catalog.load_table keeps a cast fallback
    # for sessions where this conf is absent.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # DuckDB (our oracle) is UTC-naive; pin the session so timestamp
    # functions (date_trunc, window, ...) agree.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any pandas-UDF path (similarity, multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE: runtime coalescing, skew-join splitting, dynamic join strategy.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Runtime bloom-filter join pruning: when a selective dimension
    # feeds a shuffle join over a big fact, build a bloom filter from
    # the dim keys and apply it in the fact's scan — rows that can't
    # join never enter the shuffle. At 100 TB this is the difference
    # between shuffling the whole fact table and shuffling the ~1% that
    # survives (size thresholds keep it off for tiny local inputs;
    # tests lower them to assert the plan shape).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-provided or ours)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable at runtime in this build — leave as-is.
            pass
    return spark


def get_spark(
    app_name: str = "parallel_dbms_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle
    partitions default to the core count — at cluster scale you would
    size these to data volume instead; AQE coalescing papers over the
    difference either way.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
