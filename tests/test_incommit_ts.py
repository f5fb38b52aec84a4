"""IN-COMMIT timestamps (Delta's inCommitTimestamps): timestamp time
travel resolves from the writer-stamped clock inside the commit
record, not the commit file's mtime — so copying/rsyncing/restoring
the log directory (which rewrites mtimes) can no longer corrupt
history resolution. Monotone across racing writers by per-attempt
clamping against the actual predecessor."""

from __future__ import annotations

import os
import threading
import time

import pytest

from parallel_dbms_spark.sources import txlog


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "t")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, s string")


def test_commits_carry_monotone_timestamps(spark, table):
    t0 = time.time()
    txlog.tx_append(_df(spark, [(1, "a")]), table)
    txlog.tx_append(_df(spark, [(2, "b")]), table)
    txlog.tx_delete_where(spark, table, "k = 1")
    stamps = [
        txlog.commit_timestamp(table, v)
        for v in txlog.log_versions(table)
    ]
    assert stamps == sorted(stamps)
    assert all(s >= t0 for s in stamps)
    assert all(
        "ts" in txlog.read_commit(table, v)
        for v in txlog.log_versions(table)
    )


def test_time_travel_survives_mtime_mangling(spark, table):
    """An rsync/backup-restore of the log rewrites mtimes; in-commit
    timestamps keep TIMESTAMP AS OF exact anyway."""
    txlog.tx_append(_df(spark, [(1, "a")]), table)
    ts_between = time.time() + 0.05
    time.sleep(0.1)
    txlog.tx_append(_df(spark, [(2, "b")]), table)
    # mangle every commit file's mtime far into the future
    for v in txlog.log_versions(table):
        os.utime(txlog._commit_path(table, v), (2**31 - 1, 2**31 - 1))
    assert txlog.version_at_timestamp(table, ts_between) == 1
    assert txlog.version_on_or_after_timestamp(table, ts_between) == 2
    rows = txlog.read_snapshot(
        spark, table, timestamp=ts_between
    ).collect()
    assert [(r.k, r.s) for r in rows] == [(1, "a")]
    # history serves the recorded clock, not the mangled mtime
    hist = {
        r["version"]: r["commit_ts"]
        for r in txlog.tx_history(spark, table).collect()
    }
    assert all(t < 2**31 - 2 for t in hist.values())


def test_racing_writers_stay_monotone(spark, table):
    txlog.tx_append(_df(spark, [(0, "seed")]), table)

    def writer(tag):
        txlog.tx_append(_df(spark, [(hash(tag) % 100, tag)]), table)

    ts = [threading.Thread(target=writer, args=(f"w{i}",)) for i in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    stamps = [
        txlog.commit_timestamp(table, v)
        for v in txlog.log_versions(table)
    ]
    assert stamps == sorted(stamps)
    assert len(set(stamps)) == len(stamps)  # strictly increasing


def test_timestamp_bounds_on_changes_and_restore(spark, table):
    """tx_changes and tx_restore accept wall-clock bounds resolved
    from in-commit timestamps (Delta's table_changes timestamps and
    RESTORE TIMESTAMP AS OF)."""
    txlog.tx_append(_df(spark, [(1, "a")]), table)
    txlog.tx_append(_df(spark, [(2, "b")]), table)
    txlog.tx_delete_where(spark, table, "k = 1")
    ts = [
        txlog.commit_timestamp(table, v)
        for v in txlog.log_versions(table)
    ]
    # changes strictly after commit 1: commit 2's insert + 3's delete
    ch = txlog.tx_changes(
        spark, table, from_timestamp=(ts[0] + ts[1]) / 2
    ).collect()
    got = {(r.k, r._change_type, r._commit_version) for r in ch}
    assert got == {(2, "insert", 2), (1, "delete", 3)}
    # bounded above: only commit 2
    ch2 = txlog.tx_changes(
        spark, table,
        from_timestamp=(ts[0] + ts[1]) / 2,
        to_timestamp=(ts[1] + ts[2]) / 2,
    ).collect()
    assert {(r.k, r._change_type) for r in ch2} == {(2, "insert")}
    with pytest.raises(ValueError, match="not both"):
        txlog.tx_changes(
            spark, table, from_version=1, from_timestamp=ts[0]
        )
    # RESTORE to the pre-delete instant
    txlog.tx_restore(table, timestamp=(ts[1] + ts[2]) / 2)
    got = {
        r.k for r in txlog.read_snapshot(spark, table).collect()
    }
    assert got == {1, 2}
    with pytest.raises(ValueError, match="needs"):
        txlog.tx_restore(table)


def test_mixed_history_mangled_prefeature_mtimes_stay_reachable(spark, table):
    """Mixed history: pre-feature commits (no in-commit ts) resolve by
    mtime. After an rsync/cp their mtimes become COPY time — larger
    than every later in-commit stamp. Resolution must not stop at the
    first too-new mtime: the newer ts-carrying commits stay reachable
    for TIMESTAMP AS OF (this is exactly the scenario in-commit
    timestamps exist for)."""
    import json

    txlog.tx_append(_df(spark, [(1, "a")]), table)
    txlog.tx_append(_df(spark, [(2, "b")]), table)
    txlog.tx_append(_df(spark, [(3, "c")]), table)
    ts3 = txlog.commit_timestamp(table, 3)
    # strip v1/v2 to pre-feature records, then "rsync" them: mtime ->
    # far future, larger than every in-commit stamp
    for v in (1, 2):
        p = txlog._commit_path(table, v)
        with open(p) as fh:
            rec = json.load(fh)
        rec.pop("ts", None)
        with open(p, "w") as fh:
            json.dump(rec, fh)
        os.utime(p, (2**31 - 1, 2**31 - 1))
    assert txlog.version_at_timestamp(table, ts3 + 1) == 3
    rows = txlog.read_snapshot(spark, table, timestamp=ts3 + 1).collect()
    assert {r.k for r in rows} == {1, 2, 3}
