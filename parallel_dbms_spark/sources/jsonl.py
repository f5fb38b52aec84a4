"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
LLM corpus interchange. The reference has no JSON surface at all; this
is extension surface for the training-data pipeline.

Design rules for 100 TB:

- ALWAYS pass an explicit schema. Inference-style sampling reads the
  data twice and can silently widen types between runs; a corpus
  reader must be reproducible.
- Malformed lines must not kill a 10-hour job OR vanish silently:
  every line lands either in the typed columns or in a ``_corrupt``
  quarantine column for audit.
- Parsing is ``text`` source + ``from_json`` (one JVM-side parse per
  line), NOT ``spark.read.json``: the json source forbids plans whose
  referenced file columns are only the corrupt-record column
  (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — which is
  exactly what a quarantine count is, post column-pruning). The text
  route has no such restriction, costs the same single parse, and
  keeps quarantine/clean splits as ordinary filters.
- JSONL is a *landing* format: one pass to parquet
  (``jsonl_to_parquet``) and all queries hit columnar storage —
  pushdown/pruning don't exist on JSON text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
) -> DataFrame:
    """Schema-explicit JSONL reader with corrupt-record quarantine.

    Returns the user schema's columns plus ``_corrupt``: NULL for
    parsed rows, the raw line for malformed ones (not-JSON, or JSON
    that isn't an object matching the schema shape).
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    lines = spark.read.text(path)
    parsed = lines.select(
        F.from_json(F.col("value"), schema).alias("__r"), F.col("value")
    )
    bad = F.col("__r").isNull() | F.to_json(F.col("__r")).isin("{}", "null")
    return parsed.select(
        "__r.*",
        F.when(bad, F.col("value")).alias(CORRUPT_COL),
    )


def corrupt_records(df: DataFrame, keep: bool = True) -> DataFrame:
    """keep=True -> only the quarantined raw lines; keep=False -> clean
    rows without the capture column."""
    if keep:
        return df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as newline-delimited JSON (one object per line, one file
    per partition — repartition upstream to control file count)."""
    df.write.mode(mode).json(path)


def jsonl_to_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    schema: T.StructType | str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """The landing-zone pass: JSONL -> (clean, quarantined) -> parquet.
    Returns the quarantined lines so the caller can alert/audit."""
    raw = read_jsonl(spark, src, schema)
    clean = corrupt_records(raw, keep=False)
    w = clean.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(dst)
    return corrupt_records(raw, keep=True)
