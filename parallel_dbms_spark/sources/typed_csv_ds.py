"""The typed-header CSV dialect as a REGISTERED Spark data source.

``sources/typed_csv.py`` is the fast path (explicit schema over the
JVM CSV scanner). This module exposes the same dialect as a pluggable
Spark 4 Python DataSource, so the format participates in the normal
reader API:

    spark.dataSource.register(TypedCSVDataSource)
    df = spark.read.format("typed_csv").load("/data/orders.csv")
    feed = spark.readStream.format("typed_csv").load("/data/landing/")

Dialect (/root/reference/README.md:133-149, header parser
``parseCSVHeader`` /root/reference/src/headers/duckdb_manager.cpp:52-140):
header ``Name (T|N|D) [(P)]`` per column; N -> double, T -> string,
D -> µs timestamp; empty cells are NULL; ``(P)`` is metadata only.

Scale shape: ``partitions()`` returns one InputPartition per file, so
a directory of landing files fans out across executors; each partition
parses only its own file (no driver materialization — the driver reads
exactly one header line to derive the schema). The Python-level parse
costs more per row than the JVM scanner — use this surface for dialect
fidelity and pluggability, the explicit-schema path for bulk scans.
"""

from __future__ import annotations

import csv
import datetime
import glob
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from .typed_csv import parse_typed_header


def _files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.csv")))
    return sorted(glob.glob(path)) or [path]


def _schema_for(path: str) -> tuple[T.StructType, list[str]]:
    first = _files(path)[0]
    with open(first, encoding="utf-8") as fh:
        cols = parse_typed_header(fh.readline())
    spark_t = {"N": T.DoubleType(), "T": T.StringType(), "D": T.TimestampType()}
    schema = T.StructType(
        [
            T.StructField(
                name,
                spark_t[tag],
                nullable=True,
                # same (P) metadata convention as the fast path
                metadata={"primary_key": True} if pk else {},
            )
            for name, tag, pk in cols
        ]
    )
    return schema, [tag for _, tag, _ in cols]


def _parse_cell(raw: str, tag: str):
    # malformed N/D cells yield NULL, matching the fast path's
    # PERMISSIVE csv mode + try_to_timestamp (a bad cell must not fail
    # the job); fractional seconds are accepted like try_to_timestamp
    if raw == "":
        return None
    if tag == "N":
        try:
            return float(raw)
        except ValueError:
            return None
    if tag == "D":
        fmt = "%Y-%m-%d %H:%M:%S" if " " in raw else "%Y-%m-%d"
        if "." in raw:
            fmt += ".%f"
        try:
            return datetime.datetime.strptime(raw, fmt)
        except ValueError:
            return None
    return raw


class TypedCSVReader(DataSourceReader):
    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("typed_csv requires a path (.load(path))")
        self.tags = [
            {"double": "N", "string": "T", "timestamp": "D"}[f.dataType.simpleString()]
            for f in schema.fields
        ]

    def partitions(self):
        # one partition per landing file: executor-side parallel parse
        return [InputPartition(f) for f in _files(self.path)]

    def read(self, partition):
        with open(partition.value, encoding="utf-8", newline="") as fh:
            rows = csv.reader(fh)
            next(rows)  # typed header
            for row in rows:
                yield tuple(
                    _parse_cell(raw, tag) for raw, tag in zip(row, self.tags)
                )


class TypedCSVStreamReader(SimpleDataSourceStreamReader):
    """Tail a directory of typed-CSV landing files as a stream.

    Offset = {"n": <number of files consumed>} over the
    lexicographically sorted file list — the standard log-rotation
    contract: files are append-only and named monotonically (e.g.
    ``batch-000123.csv``); a replay between two committed offsets
    re-reads exactly the same file slice, so micro-batches are
    deterministic and checkpoint-recoverable. Parsing matches the
    batch reader cell for cell (same ``_parse_cell``), so
    stream-ingested rows equal a batch read of the same files.
    """

    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("typed_csv stream requires a path")
        self.tags = [
            {"double": "N", "string": "T", "timestamp": "D"}[f.dataType.simpleString()]
            for f in schema.fields
        ]

    def initialOffset(self):
        return {"n": 0}

    def _rows(self, files):
        for path in files:
            with open(path, encoding="utf-8", newline="") as fh:
                rows = csv.reader(fh)
                next(rows)  # typed header per landing file
                for row in rows:
                    yield tuple(
                        _parse_cell(raw, tag) for raw, tag in zip(row, self.tags)
                    )

    def read(self, start):
        # the Simple reader contract ships rows by value (pickled) —
        # materialize the batch. This API is the LOW-THROUGHPUT face
        # (Spark's SimpleDataSourceStreamReader reads on the driver by
        # design); a high-volume landing zone should use the batch
        # reader's per-file partitions behind a file-source stream.
        files = _files(self.path)
        new = files[start["n"] :]
        # a LIST iterator, not a generator: the runner caches the
        # iterator for replay (must pickle) and probes next() when the
        # offset does not advance — list_iterator satisfies both.
        return iter(list(self._rows(new))), {"n": len(files)}

    def readBetweenOffsets(self, start, end):
        files = _files(self.path)[start["n"] : end["n"]]
        return iter(list(self._rows(files)))


class TypedCSVDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "typed_csv"

    def schema(self):
        return _schema_for(self.options.get("path", ""))[0]

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return TypedCSVReader(self.options, schema)

    def simpleStreamReader(self, schema: T.StructType):
        return TypedCSVStreamReader(self.options, schema)

    def writer(self, schema: T.StructType, overwrite: bool):
        return TypedCSVWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        return TypedCSVStreamWriter(self.options, schema)


def register_typed_csv(spark) -> None:
    """Idempotently register the format for this session."""
    spark.dataSource.register(TypedCSVDataSource)


# ---------------------------------------------------------------------------
# Writers: the reference's CSV sink (Table::saveCurrentBatch +
# createCSVHeaders, /root/reference/src/headers/table.cpp:252-307,540-575)
# as the write side of the pluggable data source —
#     df.write.format("typed_csv").mode(...).save(dir)            (batch)
#     df.writeStream.format("typed_csv").option("path", dir)...   (sink)
# Each executor partition writes its own temp file (header + rows);
# COMMIT on the driver renames temps into place, so readers never see a
# half-written file and an aborted job leaves no visible output.
# Streaming file names are keyed (batchId, partitionId): a replayed
# micro-batch rewrites the same names — idempotent restart, same
# contract as streaming/sinks.py's exactly-once foreachBatch sink.
# ---------------------------------------------------------------------------


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_path: str
    final_path: str


def _tag_for(dt: T.DataType) -> str:
    if isinstance(
        dt, (T.DoubleType, T.FloatType, T.IntegerType, T.LongType, T.DecimalType)
    ):
        return "N"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "D"
    return "T"


def _typed_header(schema: T.StructType) -> list[str]:
    out = []
    for f in schema.fields:
        pk = " (P)" if (f.metadata or {}).get("primary_key") else ""
        out.append(f"{f.name} ({_tag_for(f.dataType)}){pk}")
    return out


def _fmt_cell(v, tag: str) -> str:
    if v is None:
        return ""
    if tag == "D":
        # fast-path parity: date_format 'yyyy-MM-dd HH:mm:ss' (micros
        # truncated); date values render midnight like the reference's
        # mktime-of-date encoding
        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S")
        return f"{v.isoformat()} 00:00:00"
    if tag == "N":
        return repr(float(v))
    return str(v)


def _write_partition_file(schema, iterator, tmp_path):
    tags = [_tag_for(f.dataType) for f in schema.fields]
    with open(tmp_path, "w", encoding="utf-8", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(_typed_header(schema))
        n = 0
        for row in iterator:
            w.writerow(_fmt_cell(v, t) for v, t in zip(row, tags))
            n += 1
    return n


class TypedCSVWriter(DataSourceWriter):
    def __init__(self, options, schema: T.StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("typed_csv writer needs a path")
        self.schema = schema
        self.overwrite = overwrite
        self.run_id = uuid.uuid4().hex[:12]

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        final = os.path.join(self.path, f"part-{pid:05d}-{self.run_id}.csv")
        tmp = os.path.join(self.path, f"_tmp-{pid:05d}-{self.run_id}")
        _write_partition_file(self.schema, iterator, tmp)
        return _FileCommit(tmp_path=tmp, final_path=final)

    def commit(self, messages):
        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*.csv")):
                if self.run_id not in old:
                    os.remove(old)
        for m in messages:
            os.replace(m.tmp_path, m.final_path)

    def abort(self, messages):
        for m in messages:
            if m and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class TypedCSVStreamWriter(DataSourceStreamWriter):
    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("typed_csv stream writer needs a path")
        self.schema = schema

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # batch id is not visible executor-side pre-commit; stage to a
        # task-unique temp, commit renames to the (batchId, pid) name
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f"_tmp-{pid:05d}-{uuid.uuid4().hex[:12]}"
        )
        n = _write_partition_file(self.schema, iterator, tmp)
        return _FileCommit(tmp_path=tmp, final_path=f"{pid:05d}")

    def commit(self, messages, batchId: int):
        # deterministic (batchId, partition) names: a replayed batch
        # rewrites the same files instead of duplicating rows
        finals = set()
        for m in messages:
            final = os.path.join(
                self.path, f"part-b{batchId:08d}-p{m.final_path}.csv"
            )
            os.replace(m.tmp_path, final)
            finals.add(final)
        # A replay that repartitioned into FEWER partitions than the
        # failed attempt would otherwise leave the extra attempt-1
        # files in place, duplicating rows: sweep every part file of
        # this batch that this commit did not just write.
        for old in glob.glob(
            os.path.join(self.path, f"part-b{batchId:08d}-p*.csv")
        ):
            if old not in finals:
                os.remove(old)

    def abort(self, messages, batchId: int):
        for m in messages:
            if m and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
