"""The reference's typed-header CSV dialect as a Spark source/sink.

Dialect (/root/reference/README.md:133-149, header parser
``parseCSVHeader`` /root/reference/src/headers/duckdb_manager.cpp:52-140):
line 1 is ``Name (T|N|D) [(P)]`` per column; ``N`` numeric, ``T`` text,
``D`` date/timestamp (``yyyy-MM-dd`` or ``yyyy-MM-dd HH:mm:ss``),
``(P)`` a primary-key flag that is metadata only — never enforced
(/root/reference/src/headers/duckdb_manager.cpp:111-114).

Type mapping differences from the reference, on purpose (SURVEY §1.2):
- N -> DoubleType (the reference narrows to float32 — an accuracy bug,
  its own DuckDB binding is DOUBLE).
- T -> StringType, variable length (the reference's fixed 50-byte slots,
  /root/reference/src/headers/constants.h:4, are a GPU-layout artifact).
- D -> TimestampType at µs (the reference stores ns since epoch,
  /root/reference/src/headers/table.cpp:73-74; ordering semantics equal).
- NULLs are real: empty cells become NULL instead of throwing
  (/root/reference/src/headers/table.cpp:53-57) or silently skipping
  values (:194-201).

Scale note: parsing the typed header costs one driver-side read of the
first line of ONE file; the data scan itself is Spark's distributed CSV
reader with an explicit schema (no inferSchema pass over 100 TB).
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_HEADER_RE = re.compile(
    r"^\s*(?P<name>.*?)\s*\((?P<tag>[NTD])\)\s*(?P<pk>\(P\))?\s*$"
)


def parse_typed_header(header_line: str) -> list[tuple[str, str, bool]]:
    """``'Id (N) (P),Name (T)'`` -> [(name, tag, is_primary_key), ...]."""
    cols = []
    for raw in header_line.rstrip("\r\n").split(","):
        m = _HEADER_RE.match(raw)
        if not m:
            raise ValueError(f"not a typed-header column: {raw!r}")
        cols.append((m.group("name"), m.group("tag"), m.group("pk") is not None))
    return cols


def _spark_type(tag: str) -> T.DataType:
    return {"N": T.DoubleType(), "T": T.StringType(), "D": T.StringType()}[tag]


def read_typed_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read one typed-header CSV (or a glob of same-schema files).

    Mirrors the lazy ``Table`` registration + batched ``readNextBatch``
    scan (/root/reference/src/headers/table.cpp:83-251): Spark's CSV
    source gives the batching, projection pruning, and filter pushdown
    for free, across any number of files/partitions.
    """
    if os.path.isdir(path):
        # A distributed write's output: every part file carries the
        # header; any one of them yields the schema.
        first = sorted(glob.glob(os.path.join(path, "*.csv")))[0]
    elif any(c in path for c in "*?["):
        first = sorted(glob.glob(path))[0]
    else:
        first = path
    with open(first, encoding="utf-8") as fh:
        cols = parse_typed_header(fh.readline())

    # Read D columns as strings first: the dialect allows both
    # 'yyyy-MM-dd' and 'yyyy-MM-dd HH:mm:ss' (and single-digit hours
    # appear in the golden corpus), so parse leniently afterwards.
    schema = T.StructType(
        [T.StructField(n, _spark_type(tag), True) for n, tag, _ in cols]
    )
    df = (
        spark.read.schema(schema)
        .option("header", "true")  # skips line 1; names come from schema order
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    for name, tag, is_pk in cols:
        if tag == "D":
            df = df.withColumn(
                name,
                F.coalesce(
                    F.try_to_timestamp(F.col(name)),
                    F.try_to_timestamp(F.col(name), F.lit("yyyy-MM-dd H:mm:ss")),
                ),
            )
        if is_pk:
            df = df.withMetadata(name, {"primary_key": True})
    return df


def read_typed_csv_quarantined(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Permissive ingestion: (good_rows, quarantined_rows).

    The reference *silently skips* unparseable numerics, desynchronizing
    the column (/root/reference/src/headers/table.cpp:194-201) — the
    worst possible failure mode. Here every cell is read as a string
    first (cannot fail), then validated with ``try_cast``: a row is
    quarantined if any N cell is non-null but not numeric, or any D
    cell is non-null but not a recognized timestamp. Good rows get the
    real types; bad rows keep their raw strings for repair.

    Scale: two scan-fused filters over one distributed read — no
    ``_corrupt_record`` column (whose filter requires caching the whole
    input), no driver involvement, same pushdown properties as any scan.
    """
    if os.path.isdir(path):
        first = sorted(glob.glob(os.path.join(path, "*.csv")))[0]
    elif any(c in path for c in "*?["):
        first = sorted(glob.glob(path))[0]
    else:
        first = path
    with open(first, encoding="utf-8") as fh:
        cols = parse_typed_header(fh.readline())

    raw_schema = T.StructType(
        [T.StructField(n, T.StringType(), True) for n, _, _ in cols]
    )
    raw = (
        spark.read.schema(raw_schema).option("header", "true").csv(path)
    )

    def parsed(name: str, tag: str):
        if tag == "N":
            return F.col(name).try_cast("double")
        if tag == "D":
            return F.coalesce(
                F.try_to_timestamp(F.col(name)),
                F.try_to_timestamp(F.col(name), F.lit("yyyy-MM-dd H:mm:ss")),
            )
        return F.col(name)

    bad = F.lit(False)
    for name, tag, _ in cols:
        if tag in ("N", "D"):
            bad = bad | (F.col(name).isNotNull() & parsed(name, tag).isNull())

    good = raw.filter(~bad).select(
        *[parsed(n, tag).alias(n) for n, tag, _ in cols]
    )
    for name, _, is_pk in cols:
        if is_pk:
            good = good.withMetadata(name, {"primary_key": True})
    return good, raw.filter(bad)


def register_typed_csv_dir(spark: SparkSession, directory: str) -> dict[str, DataFrame]:
    """Register every ``*.csv`` in a directory as a temp view named by
    file stem — the reference's ``initializeTablesFromCSVs``
    (/root/reference/src/headers/duckdb_manager.cpp:196-210)."""
    out: dict[str, DataFrame] = {}
    for p in sorted(glob.glob(os.path.join(directory, "*.csv"))):
        name = os.path.splitext(os.path.basename(p))[0]
        df = read_typed_csv(spark, p)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_typed_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with the reference's typed header
    (``Table::createCSVHeaders`` /root/reference/src/headers/table.cpp:540-575,
    sink :252-307). Types map back: numeric->N, timestamp->D, else T.

    Distributed write (one file per partition, each with the header);
    ``coalesce(1)`` upstream if a single file is wanted. DESC output is
    the sort order itself — the reference's write-backwards trick
    (/root/reference/src/headers/table.cpp:271-285) is unnecessary.
    """
    tagged = []
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.DoubleType, T.FloatType, T.IntegerType,
                                   T.LongType, T.DecimalType)):
            tag = "N"
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            tag = "D"
            out = out.withColumn(
                f.name, F.date_format(f.name, "yyyy-MM-dd HH:mm:ss")
            )
        else:
            tag = "T"
        pk = " (P)" if (f.metadata or {}).get("primary_key") else ""
        tagged.append(f"{f.name} ({tag}){pk}")
    out = out.toDF(*tagged)
    out.write.mode(mode).option("header", "true").csv(path)
