"""Directory -> catalog registration.

The reference walks an input directory, parses each CSV's typed header,
and registers a schema-only table per file stem
(``initializeTablesFromCSVs``,
/root/reference/src/headers/duckdb_manager.cpp:180-210). Here a table
is a lazy DataFrame + temp view: no data is read until an action runs,
and Catalyst handles pushdown/pruning into the scan.

Two source dialects:
- parquet directories (the driver's testdata): ``load_tables``
- the reference's typed-header CSV dialect: ``sources.typed_csv``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import configure

# Driver-provided testdata tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table, normalizing physical quirks.

    Timestamps have shipped in two physical forms: TIMESTAMP(NANOS)
    (scanned as int64 via nanosAsLong, converted here) and plain
    timestamp[us] with no zone (scanned as TIMESTAMP_NTZ). Both are
    normalized to the session-zone TIMESTAMP type — the session zone is
    pinned to UTC (session.py), so wall-clock values are bit-identical
    to DuckDB's naive reading and downstream epoch casts stay legal.
    """
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


# The sf_dir whose views are CURRENTLY registered, per session — a
# view name can only point at one directory at a time, so this must be
# "current", not "ever registered" (a set would serve stale views when
# callers interleave directories). Re-registering 10 views on every
# run_sql call would be needless work in a hot loop; re-registering on
# a directory SWITCH is required for correctness.
_CURRENT_DIR: dict[int, str] = {}


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load and register every table as a temp view (name = file stem)."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    if set(names) >= set(TABLES):
        _CURRENT_DIR[id(spark)] = sf_dir
    return out


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register the testdata views then run a SQL query.

    The whole reference execution pipeline — parse, bind, optimize,
    physical plan, operator traversal
    (/root/reference/src/headers/duckdb_manager.cpp:236-263 +
    /root/reference/src/main.cpp:622-677) — is this one call: Catalyst
    plans and Tungsten executes.

    The reference's non-standard ``ORDER BY c Asc|Desc`` keywords are
    plain case-insensitive ASC/DESC to Spark's parser, so no dialect
    rewrite is required.
    """
    if _CURRENT_DIR.get(id(spark)) != sf_dir:
        load_tables(spark, sf_dir)
    return spark.sql(sql)
