"""The transactional table (sources/txlog.py) as a Structured
Streaming SOURCE — tail the commit log, emit each commit's appended
rows as micro-batches (the Delta streaming-source contract,
re-expressed on the Spark 4 Python DataSource API).

Offsets are COMMIT VERSIONS: offset {"v": N} means "everything up to
and including commit N is consumed". A replay between two committed
offsets re-reads exactly the commits in (start, end] — data files are
immutable and the log is append-only, so micro-batches are
deterministic and checkpoint-recoverable with no extra bookkeeping.

Change semantics (Delta's):
- ``append`` / ``merge``-insert-only commits stream their added rows;
- ``compact`` commits are skipped without reading a byte
  (content-preserving by construction);
- ``delete`` / file-rewriting ``merge`` commits RAISE by default — a
  streaming consumer silently missing deletions is a correctness trap.
  Pass ``ignoreChanges=true`` to stream such commits' ADDED files
  instead (re-emitting rewritten survivor rows, exactly Delta's
  ``ignoreChanges`` contract — consumers must dedup downstream).

Throughput note: ``SimpleDataSourceStreamReader`` ships rows by value
through the driver — Spark's own low-throughput face of the API. It is
the right shape for control-plane-sized feeds (dimension tables, CDC
trickle); a bulk pipeline should batch-read snapshots instead
(``txlog.read_snapshot``) or stream the change feed files through a
file source.
"""

from __future__ import annotations

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)

from . import txlog


def _rows_from_files(
    table: str, rels: list[str], fields: list[str], dvs: dict | None = None
):
    """Read parquet files by value (pyarrow, driver-side) aligned to
    the serve schema: absent columns (pre-evolution files) yield None;
    deletion-vector positions (row order == parquet row index) are
    skipped when ``dvs`` is given.
    """
    import os

    import pyarrow.parquet as pq

    for rel in rels:
        tbl = pq.read_table(os.path.join(table, rel))
        cols = set(tbl.column_names)
        excl = set((dvs or {}).get(rel, ()))
        for i, rec in enumerate(tbl.to_pylist()):
            if i in excl:
                continue
            yield tuple(rec.get(f) if f in cols else None for f in fields)


class TxLogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options, schema: T.StructType):
        self.table = options.get("path")
        if not self.table:
            raise ValueError("txlog stream requires a path option")
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.fields = [f.name for f in schema.fields]

    def initialOffset(self):
        return {"v": 0}

    def _commit_rels(self, lo: int, hi: int) -> list[str]:
        rels: list[str] = []
        for v in txlog.log_versions(self.table):
            if v <= lo or v > hi:
                continue
            rec = txlog.read_commit(self.table, v)
            if rec["action"] == "compact":
                continue  # content-preserving rewrite: nothing to emit
            if (rec["removed"] or rec.get("dv")) and not self.ignore_changes:
                raise ValueError(
                    f"commit {v} ({rec['action']}) rewrote or vectored "
                    "files; a pure append stream cannot represent it. "
                    "Pass ignoreChanges=true to skip/re-emit, or consume "
                    "txlog.tx_changes for a faithful CDC feed"
                )
            rels.extend(rec["added"])
        return rels

    def read(self, start):
        versions = txlog.log_versions(self.table)
        head = versions[-1] if versions else 0
        rels = self._commit_rels(int(start["v"]), head)
        # a LIST iterator (pickles, supports replay probing), as the
        # Simple reader runner requires
        return (
            iter(list(_rows_from_files(self.table, rels, self.fields))),
            {"v": head},
        )

    def readBetweenOffsets(self, start, end):
        rels = self._commit_rels(int(start["v"]), int(end["v"]))
        return iter(list(_rows_from_files(self.table, rels, self.fields)))


class TxLogReader(DataSourceReader):
    """Batch face: the latest snapshot by value — control-plane-sized
    tables only; bulk reads go through ``txlog.read_snapshot`` (real
    distributed parquet scans of the same immutable files)."""

    def __init__(self, options, schema: T.StructType):
        self.table = options.get("path")
        self.fields = [f.name for f in schema.fields]

    def read(self, partition):
        _, files = txlog.snapshot_files(self.table)
        yield from _rows_from_files(
            self.table, files, self.fields, txlog.snapshot_dvs(self.table)
        )


class TxLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "txlog"

    def schema(self):
        table = self.options.get("path")
        schema = txlog.table_schema(table) if table else None
        if schema is None:
            raise ValueError(
                f"no schema-bearing commits under {table!r}; create the "
                "table with txlog.tx_append first"
            )
        return schema

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return TxLogReader(self.options, schema)

    def simpleStreamReader(self, schema: T.StructType):
        return TxLogStreamReader(self.options, schema)


def register_txlog_source(spark) -> None:
    """Idempotently register the ``txlog`` format for this session."""
    spark.dataSource.register(TxLogDataSource)
