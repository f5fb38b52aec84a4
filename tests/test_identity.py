"""IDENTITY columns on the transaction log (Delta's GENERATED
{ALWAYS | BY DEFAULT} AS IDENTITY): distributed gap-allowed
assignment, watermark monotonicity (appends, merge, SYNC, RESTORE),
ALWAYS enforcement, metadata travel (rename/drop/clone/checkpoint).

Reference parity note: the reference engine has no identity/sequence
generator (fixed typed CSV headers, /root/reference/src/headers/
duckdb_manager.cpp:52-140); this is parity with Delta's identity
columns, the lakehouse ambition of this repo's txlog."""

from __future__ import annotations

import threading

import pytest

from parallel_dbms_spark.sources import txlog


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "t")


def _df(spark, rows, schema="id long, s string"):
    return spark.createDataFrame(rows, schema)


def _ids(spark, table):
    return [
        r["id"] for r in txlog.read_snapshot(spark, table).collect()
    ]


def _seed(spark, table, always=True, start=1, step=1):
    txlog.tx_append(_df(spark, [(100, "seed")]), table)
    txlog.tx_set_identity(
        spark, table, "id", start=start, step=step, always=always
    )


def test_assigned_ids_unique_beyond_watermark_on_lattice(spark, table):
    _seed(spark, table, start=1, step=3)
    wm0 = txlog.identity_watermark(table)["id"]
    assert wm0 == 100
    txlog.tx_append(
        spark.createDataFrame([("a",), ("b",), ("c",)], "s string"), table
    )
    ids = _ids(spark, table)
    fresh = [i for i in ids if i != 100]
    assert len(set(ids)) == len(ids)
    assert all(i > wm0 for i in fresh)
    # on the start + k*step lattice
    assert all((i - 1) % 3 == 0 for i in fresh)
    # watermark advanced to the furthest assigned value
    assert txlog.identity_watermark(table)["id"] == max(fresh)


def test_second_append_strictly_beyond_first(spark, table):
    _seed(spark, table)
    txlog.tx_append(
        spark.createDataFrame([("a",), ("b",)], "s string"), table
    )
    hi1 = txlog.identity_watermark(table)["id"]
    txlog.tx_append(
        spark.createDataFrame([("c",), ("d",)], "s string"), table
    )
    ids = _ids(spark, table)
    assert len(set(ids)) == len(ids)
    assert txlog.identity_watermark(table)["id"] > hi1


def test_negative_step_descends(spark, table):
    txlog.tx_append(_df(spark, [(0, "seed")]), table)
    txlog.tx_set_identity(spark, table, "id", start=-10, step=-5)
    txlog.tx_append(
        spark.createDataFrame([("a",), ("b",)], "s string"), table
    )
    fresh = [i for i in _ids(spark, table) if i != 0]
    assert all(i <= -10 for i in fresh)
    assert all((i + 10) % 5 == 0 for i in fresh)
    assert txlog.identity_watermark(table)["id"] == min(fresh)


def test_always_rejects_supplied_values(spark, table):
    _seed(spark, table, always=True)
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        txlog.tx_append(_df(spark, [(999, "bad")]), table)
    with pytest.raises(ValueError, match="IDENTITY"):
        txlog.tx_update_where(
            spark, table, "s = 'seed'", {"id": "id + 1"}
        )


def test_by_default_accepts_and_sync_realigns(spark, table):
    _seed(spark, table, always=False)
    txlog.tx_append(_df(spark, [(10**9, "manual")]), table)
    # a manual insert does NOT advance the generator (Delta's rule) ...
    assert txlog.identity_watermark(table)["id"] == 100
    txlog.tx_identity_sync(spark, table)
    # ... SYNC IDENTITY does
    assert txlog.identity_watermark(table)["id"] == 10**9
    txlog.tx_append(
        spark.createDataFrame([("fresh",)], "s string"), table
    )
    ids = _ids(spark, table)
    assert len(set(ids)) == len(ids)
    assert max(ids) > 10**9


def test_merge_matched_keeps_id_insert_generates(spark, table):
    _seed(spark, table)
    txlog.tx_append(
        spark.createDataFrame([("x",), ("y",)], "s string"), table
    )
    before = {
        r["s"]: r["id"]
        for r in txlog.read_snapshot(spark, table).collect()
    }
    src = spark.createDataFrame([("x",), ("neo",)], "s string")
    txlog.tx_merge_upsert(spark, table, src, ["s"])
    after = {
        r["s"]: r["id"]
        for r in txlog.read_snapshot(spark, table).collect()
    }
    assert after["x"] == before["x"]  # upsert never re-mints a row's id
    assert after["neo"] not in before.values()
    assert len(set(after.values())) == len(after)
    # merge advanced the watermark past its generated values
    assert txlog.identity_watermark(table)["id"] >= after["neo"]


def test_merge_into_empty_table_generates(spark, table):
    txlog.tx_append(_df(spark, [(1, "tmp")]), table)
    txlog.tx_set_identity(spark, table, "id")
    txlog.tx_delete_where(spark, table, "true")
    src = spark.createDataFrame([("a",), ("b",)], "s string")
    txlog.tx_merge_upsert(spark, table, src, ["s"])
    ids = _ids(spark, table)
    assert len(ids) == 2 and len(set(ids)) == 2
    assert all(i > 1 for i in ids)


def test_merge_source_supplying_always_column_rejected(spark, table):
    _seed(spark, table, always=True)
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        txlog.tx_merge_upsert(
            spark, table, _df(spark, [(7, "x")]), ["s"]
        )


def test_identity_requires_bigint_and_exclusions(spark, table):
    txlog.tx_append(
        spark.createDataFrame([(1, "a")], "n int, s string"), table
    )
    with pytest.raises(ValueError, match="BIGINT"):
        txlog.tx_set_identity(spark, table, "n")
    t2 = table + "2"
    txlog.tx_append(_df(spark, [(1, "a")]), t2)
    txlog.tx_set_default(t2, "id", "0")
    with pytest.raises(ValueError, match="DEFAULT"):
        txlog.tx_set_identity(spark, t2, "id")
    txlog.tx_drop_default(t2, "id")
    txlog.tx_set_identity(spark, t2, "id")
    with pytest.raises(ValueError, match="IDENTITY"):
        txlog.tx_set_default(t2, "id", "0")
    with pytest.raises(ValueError, match="IDENTITY"):
        txlog.tx_set_generated(spark, t2, "id", "1")


def test_rename_and_drop_carry_identity(spark, table):
    _seed(spark, table)
    txlog.tx_rename_column(spark, table, "id", "row_id")
    assert "row_id" in txlog.table_identity(table)
    assert txlog.identity_watermark(table)["row_id"] == 100
    txlog.tx_append(
        spark.createDataFrame([("a",)], "s string"), table
    )
    rows = txlog.read_snapshot(spark, table).collect()
    assert all(r["row_id"] is not None for r in rows)
    txlog.tx_drop_column(spark, table, "row_id")
    assert txlog.table_identity(table) == {}
    assert txlog.identity_watermark(table) == {}


def test_clone_carries_generator_state(spark, table, tmp_path):
    _seed(spark, table)
    txlog.tx_append(
        spark.createDataFrame([("a",)], "s string"), table
    )
    dst = str(tmp_path / "clone")
    txlog.tx_clone(table, dst)
    assert txlog.table_identity(dst) == txlog.table_identity(table)
    assert txlog.identity_watermark(dst) == txlog.identity_watermark(
        table
    )
    txlog.tx_append(
        spark.createDataFrame([("b",)], "s string"), dst
    )
    ids = [r["id"] for r in txlog.read_snapshot(spark, dst).collect()]
    assert len(set(ids)) == len(ids)


def test_restore_keeps_watermark_monotone(spark, table):
    _seed(spark, table)
    v_before = txlog.log_versions(table)[-1]
    txlog.tx_append(
        spark.createDataFrame([("a",), ("b",)], "s string"), table
    )
    wm_hi = txlog.identity_watermark(table)["id"]
    txlog.tx_restore(table, v_before)
    # rows rolled back; the generator's promises did not
    assert txlog.identity_watermark(table)["id"] == wm_hi
    txlog.tx_append(
        spark.createDataFrame([("c",)], "s string"), table
    )
    ids = _ids(spark, table)
    assert all(i == 100 or i > wm_hi for i in ids)


def test_watermark_survives_checkpoint_fold(spark, table):
    _seed(spark, table)
    txlog.tx_append(
        spark.createDataFrame([("a",)], "s string"), table
    )
    wm = txlog.identity_watermark(table)["id"]
    # push past a checkpoint boundary with metadata-only commits
    for i in range(txlog.CHECKPOINT_EVERY + 2):
        txlog.tx_set_constraint(
            spark, table, "c0", f"id IS NOT NULL OR {i} = {i}"
        )
    v = txlog.log_versions(table)[-1]
    assert any(
        x % txlog.CHECKPOINT_EVERY == 0
        for x in txlog.log_versions(table)
    )
    assert txlog.identity_watermark(table)["id"] == wm
    assert txlog.table_identity(table)["id"]["always"] is True
    # version-pinned resolution too
    assert txlog.identity_watermark(table, v)["id"] == wm


def test_streaming_sink_assigns_identity(spark, table, tmp_path):
    """The native sink assigns an OMITTED identity column per
    micro-batch: executor tasks reserve disjoint ranges, the batch
    commit advances the watermark from footer stats, and a later batch
    lands strictly beyond. A stream supplying a GENERATED ALWAYS
    column is rejected before the query starts."""
    from parallel_dbms_spark.sources.txlog_ds import register_txlog_source

    register_txlog_source(spark)
    _seed(spark, table)
    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    spark.createDataFrame(
        [(f"s{i}",) for i in range(7)], "s string"
    ).repartition(3).write.parquet(src)

    def run():
        q = (
            spark.readStream.schema("s string").parquet(src)
            .writeStream.format("txlog")
            .option("path", table).option("app", "ident")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run()
    ids = _ids(spark, table)
    assert len(ids) == 8 and len(set(ids)) == 8
    wm = txlog.identity_watermark(table)["id"]
    assert wm == max(ids)
    spark.createDataFrame([("t1",), ("t2",)], "s string").write.mode(
        "append"
    ).parquet(src)
    run()
    ids2 = _ids(spark, table)
    assert len(ids2) == 10 and len(set(ids2)) == 10
    assert all(i > wm for i in set(ids2) - set(ids))
    with pytest.raises(Exception, match="GENERATED ALWAYS"):
        q = (
            spark.readStream.schema("id long, s string").parquet(src)
            .writeStream.format("txlog")
            .option("path", table).option("app", "bad")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()


def test_concurrent_generating_appends_never_collide(spark, table):
    """Two writers generating from the same watermark: the commit-level
    identity conflict forces the loser to re-run; whatever lands is
    globally unique."""
    _seed(spark, table)
    errs: list = []

    def writer(tag):
        df = spark.createDataFrame([(f"{tag}{i}",) for i in range(3)],
                                   "s string")
        for _ in range(6):
            try:
                txlog.tx_append(df, table)
                return
            except ValueError as e:
                if "identity watermark" not in str(e):
                    errs.append(e)
                    return
                continue  # re-run: fresh watermark
        errs.append(RuntimeError(f"{tag} never landed"))

    ts = [threading.Thread(target=writer, args=(t,)) for t in "ab"]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    ids = _ids(spark, table)
    assert len(ids) == 7
    assert len(set(ids)) == 7


def test_watermark_scan_conflicts_with_racing_plain_append(spark, table):
    """The scan-vs-append conflict class: set_identity/SYNC read the
    column max, then commit a metadata-only watermark. A plain append
    with writer-supplied BY DEFAULT values that lands BETWEEN the scan
    and the commit records no watermark of its own — without this
    conflict the stale watermark would land and the generator could
    re-issue the racer's values. The loser must re-scan."""
    _seed(spark, table, always=False)
    parent = txlog.log_versions(table)[-1]
    wm = dict(txlog.identity_watermark(table))
    # the racer: a plain append with a writer-supplied id beyond the
    # scanned max, carrying NO identity_watermark record
    txlog.tx_append(_df(spark, [(10**6, "racer")]), table)
    assert "identity_watermark" not in txlog.read_commit(
        table, txlog.log_versions(table)[-1]
    )
    # the stale metadata-only watermark commit loses the race
    with pytest.raises(txlog.TxConflict):
        txlog.commit(
            table, "identity_sync", [], [], parent,
            meta={"identity_watermark": wm},
        )
    # the public retry loop resolves it: SYNC re-scans and lands past
    # the racer's value
    txlog.tx_identity_sync(spark, table)
    assert txlog.identity_watermark(table)["id"] == 10**6
    txlog.tx_append(
        spark.createDataFrame([("fresh",)], "s string"), table
    )
    ids = _ids(spark, table)
    assert len(set(ids)) == len(ids) and max(ids) > 10**6
