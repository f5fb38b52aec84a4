"""ROW TRACKING on the transaction log (Delta's row IDs): stable
``_row_id`` / ``_row_commit_version`` assigned from per-file bases,
MATERIALIZED through every rewrite (compact, z-order, update, delete,
repartition), monotone watermark, metadata travel (checkpoint, clone,
restore), and race-safety of the commit-hook base assignment.

Reference parity note: the reference engine has no row-identity
surface (results re-materialize to CSV per query,
/root/reference/src/headers/table.cpp:252-307); this is parity with
Delta's row tracking on this repo's lakehouse log."""

from __future__ import annotations

import threading

import pytest

from parallel_dbms_spark.sources import txlog


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "t")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, s string")


def _rows(spark, table, **kw):
    return {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in txlog.read_snapshot(
            spark, table, with_row_ids=True, **kw
        ).collect()
    }


def _seed(spark, table, n=10):
    txlog.tx_append(_df(spark, [(i, f"r{i}") for i in range(n)]), table)
    txlog.tx_enable_row_tracking(table)


def test_enable_backfills_unique_ids_and_adding_commit(spark, table):
    txlog.tx_append(_df(spark, [(i, f"r{i}") for i in range(6)]), table)
    txlog.tx_append(_df(spark, [(i, f"r{i}") for i in range(6, 10)]), table)
    txlog.tx_enable_row_tracking(table)
    rows = _rows(spark, table)
    assert len({v[0] for v in rows.values()}) == 10
    # _row_commit_version is the commit that ADDED each row's file
    assert {rows[k][1] for k in range(6)} == {1}
    assert {rows[k][1] for k in range(6, 10)} == {2}
    assert txlog.row_id_watermark(table) == 10


def test_requires_enable(spark, table):
    txlog.tx_append(_df(spark, [(1, "a")]), table)
    with pytest.raises(ValueError, match="row tracking"):
        txlog.read_snapshot(spark, table, with_row_ids=True)


def test_appends_extend_never_collide(spark, table):
    _seed(spark, table)
    before = _rows(spark, table)
    txlog.tx_append(_df(spark, [(i, f"n{i}") for i in range(10, 15)]), table)
    after = _rows(spark, table)
    assert len({v[0] for v in after.values()}) == 15
    for k, v in before.items():
        assert after[k] == v
    assert all(after[k][0] >= 10 for k in range(10, 15))


def test_rewrites_preserve_identity(spark, table):
    _seed(spark, table, n=20)
    txlog.tx_append(_df(spark, [(i, f"n{i}") for i in range(20, 25)]), table)
    base = _rows(spark, table)
    txlog.tx_compact(spark, table, num_files=1)
    assert _rows(spark, table) == base, "compact is pure layout"
    txlog.tx_compact(spark, table, num_files=2, zorder_by=["k"])
    assert _rows(spark, table) == base, "z-order is pure layout"
    txlog.tx_repartition_table(spark, table, ["s"])
    assert _rows(spark, table) == base, "partition evolution is pure layout"
    txlog.tx_delete_where(spark, table, "k IN (2, 21)")
    now = _rows(spark, table)
    assert set(now) == set(base) - {2, 21}
    assert all(now[k] == base[k] for k in now), "survivors keep identity"


def test_update_keeps_id_bumps_commit_version(spark, table):
    _seed(spark, table)
    base = _rows(spark, table)
    v, n = txlog.tx_update_where(spark, table, "k = 3", {"s": "'up'"})
    assert n == 1
    now = _rows(spark, table)
    assert now[3][0] == base[3][0], "an update never changes a row's id"
    assert now[3][1] == v, "its commit version is the update's"
    assert all(now[k] == base[k] for k in now if k != 3)


def test_mor_delete_and_merge(spark, table):
    _seed(spark, table)
    base = _rows(spark, table)
    txlog.tx_delete_where_mor(spark, table, "k = 4")
    now = _rows(spark, table)
    assert set(now) == set(base) - {4}
    assert all(now[k] == base[k] for k in now)
    mv, _ = txlog.tx_merge_upsert(
        spark, table, _df(spark, [(3, "m"), (100, "ins")]), ["k"]
    )
    now = _rows(spark, table)
    ids = [v[0] for v in now.values()]
    assert len(set(ids)) == len(ids)
    assert all(now[k] == base[k] for k in now if k not in (3, 100)), (
        "merge survivors keep identity"
    )
    assert now[100][1] == mv
    # the MATCHED key is an UPDATE of the same logical row: its id is
    # the target's, its commit version re-stamps to the merge
    assert now[3][0] == base[3][0], "upsert never re-mints a row's id"
    assert now[3][1] == mv
    assert now[100][0] not in {v[0] for v in base.values()}


def test_merge_matched_rows_inherit_target_ids(spark, table):
    """Delta's row-tracking contract under MERGE: matched keys keep
    the target row's _row_id (an upsert is an UPDATE, not
    delete+insert) with _row_commit_version re-stamped to the merge;
    only unmatched inserts mint fresh ids. Consumers keying
    incremental logic on _row_id must not see matched upserts churn."""
    _seed(spark, table)
    base = _rows(spark, table)
    src = _df(spark, [(2, "up2"), (5, "up5"), (200, "ins")])
    mv, rewritten = txlog.tx_merge_upsert(spark, table, src, ["k"])
    assert rewritten >= 1
    now = _rows(spark, table)
    for k in (2, 5):
        assert now[k][0] == base[k][0], f"matched k={k} changed _row_id"
        assert now[k][1] == mv
    assert now[200][0] not in {v[0] for v in base.values()}
    assert len({v[0] for v in now.values()}) == len(now)
    # a second merge over the SAME keys still serves the original ids
    mv2, _ = txlog.tx_merge_upsert(spark, table, _df(spark, [(2, "again")]), ["k"])
    after = _rows(spark, table)
    assert after[2][0] == base[2][0] and after[2][1] == mv2


def test_time_travel_and_restore_serve_exact_ids(spark, table):
    _seed(spark, table)
    base = _rows(spark, table)
    v0 = txlog.log_versions(table)[-1]
    txlog.tx_update_where(spark, table, "k < 3", {"s": "'x'"})
    txlog.tx_delete_where(spark, table, "k = 7")
    assert _rows(spark, table, version=v0) == base, "TIME TRAVEL"
    txlog.tx_restore(table, v0)
    assert _rows(spark, table) == base, "RESTORE"
    # the watermark never rolled back: fresh rows still mint beyond it
    wm = txlog.row_id_watermark(table)
    txlog.tx_append(_df(spark, [(50, "new")]), table)
    now = _rows(spark, table)
    assert now[50][0] >= wm
    assert len({v[0] for v in now.values()}) == len(now)


def test_clone_carries_ids_and_generator(spark, table, tmp_path):
    _seed(spark, table)
    base = _rows(spark, table)
    dst = str(tmp_path / "clone")
    txlog.tx_clone(table, dst)
    crows = _rows(spark, dst)
    assert {k: v[0] for k, v in crows.items()} == {
        k: v[0] for k, v in base.items()
    }
    # clone history starts at 1: carried rows re-stamp to commit 1
    assert {v[1] for v in crows.values()} == {1}
    txlog.tx_append(_df(spark, [(99, "c")]), dst)
    now = _rows(spark, dst)
    assert len({v[0] for v in now.values()}) == len(now)
    # a source REWRITE before cloning materializes ids into the files:
    # the clone keeps the ids verbatim (stability is the contract);
    # materialized commit versions read as source-history stamps,
    # "modified no later than the clone" (documented zero-copy trade)
    txlog.tx_compact(spark, table, num_files=1)
    src_head = txlog.log_versions(table)[-1]
    dst2 = str(tmp_path / "clone2")
    txlog.tx_clone(table, dst2)
    c2 = _rows(spark, dst2)
    assert {k: v[0] for k, v in c2.items()} == {
        k: v[0] for k, v in base.items()
    }
    assert all(v[1] <= src_head for v in c2.values())


def test_checkpoint_folds_row_tracking_planes(spark, table):
    _seed(spark, table)
    wm = txlog.row_id_watermark(table)
    base_map = txlog.snapshot_base_row_ids(table)
    for i in range(txlog.CHECKPOINT_EVERY + 2):
        txlog.tx_set_constraint(spark, table, "c0", f"k >= 0 OR {i} = {i}")
    assert txlog.table_row_tracking(table) is True
    assert txlog.row_id_watermark(table) == wm
    assert txlog.snapshot_base_row_ids(table) == base_map
    assert _rows(spark, table)


def test_reserved_physical_names_rejected(spark, table):
    _seed(spark, table)
    bad = spark.createDataFrame([(1, "a", 5)], "k long, s string, __row_id long")
    with pytest.raises(ValueError, match="reserved"):
        txlog.tx_append(bad, table, merge_schema=True)


def test_row_ids_survive_column_rename(spark, table):
    _seed(spark, table)
    base = _rows(spark, table)
    txlog.tx_rename_column(spark, table, "s", "label")
    now = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in txlog.read_snapshot(
            spark, table, with_row_ids=True
        ).collect()
    }
    assert now == base
    txlog.tx_compact(spark, table, num_files=1)
    assert _rows(spark, table) == base


def test_concurrent_appends_get_disjoint_ranges(spark, table):
    _seed(spark, table, n=4)
    errs: list = []

    def writer(lo):
        try:
            txlog.tx_append(
                _df(spark, [(lo + i, "w") for i in range(5)]), table
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [
        threading.Thread(target=writer, args=(lo,))
        for lo in (100, 200, 300)
    ]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    rows = _rows(spark, table)
    assert len(rows) == 19
    ids = [v[0] for v in rows.values()]
    assert len(set(ids)) == len(ids), "racing appends must not overlap"
    assert txlog.row_id_watermark(table) == 19


def test_partition_filter_composes_with_row_ids(spark, table):
    txlog.tx_append(
        _df(spark, [(i, "even" if i % 2 == 0 else "odd") for i in range(10)]),
        table, partition_by=["s"],
    )
    txlog.tx_enable_row_tracking(table)
    base = _rows(spark, table)
    part = _rows(spark, table, partition_filter={"s": "even"})
    assert set(part) == {k for k in base if k % 2 == 0}
    assert all(part[k] == base[k] for k in part)


def test_ds_batch_face_serves_row_ids(spark, table):
    """format("txlog").option("withRowIds") — the DS face must agree
    with read_snapshot(with_row_ids=True) bit for bit, through
    materialized rewrites and deletion vectors."""
    from parallel_dbms_spark.sources.txlog_ds import register_txlog_source

    register_txlog_source(spark)
    _seed(spark, table)
    txlog.tx_update_where(spark, table, "k = 3", {"s": "'up'"})
    txlog.tx_delete_where_mor(spark, table, "k = 5")
    txlog.tx_append(_df(spark, [(20, "x")]), table)
    want = _rows(spark, table)
    got = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in spark.read.format("txlog")
        .option("path", table)
        .option("withRowIds", "true")
        .load()
        .collect()
    }
    assert got == want
    # untracked tables reject the option loudly
    t2 = table + "_untracked"
    txlog.tx_append(_df(spark, [(1, "a")]), t2)
    import pytest as _pytest

    with _pytest.raises(Exception, match="row tracking"):
        spark.read.format("txlog").option("path", t2).option(
            "withRowIds", "true"
        ).load().collect()


@pytest.mark.parametrize("simple", [False, True])
def test_stream_face_serves_row_ids(spark, table, tmp_path, simple):
    """readStream.format("txlog").option("withRowIds"): streamed rows
    carry the same _row_id/_row_commit_version the snapshot serves —
    including pre-enable files, whose bases replay from the enabling
    commit's backfill map. Both stream faces agree (the by-value
    simple face resolves the same bases driver-side — face parity, so
    a consumer switching faces never sees ids churn)."""
    from parallel_dbms_spark.sources.txlog_ds import register_txlog_source

    register_txlog_source(spark)
    _seed(spark, table, n=6)
    txlog.tx_append(_df(spark, [(10, "x"), (11, "y")]), table)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    reader = (
        spark.readStream.format("txlog")
        .option("path", table).option("withRowIds", "true")
    )
    if simple:
        reader = reader.option("simple", "true")
    q = (
        reader.load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        r["k"]: (r["_row_id"], r["_row_commit_version"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == _rows(spark, table)


def test_streamed_appends_get_row_ids(spark, table, tmp_path):
    """The native streaming sink publishes through txlog.commit, so
    the hook assigns bases to streamed files too — ingest arrives
    row-tracked with no sink-side changes."""
    from parallel_dbms_spark.sources.txlog_ds import register_txlog_source

    register_txlog_source(spark)
    _seed(spark, table, n=3)
    src = str(tmp_path / "in")
    _df(spark, [(10, "s1"), (11, "s2")]).write.mode("append").parquet(src)
    q = (
        spark.readStream.schema("k long, s string").parquet(src)
        .writeStream.format("txlog")
        .option("path", table).option("app", "rt-test")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = _rows(spark, table)
    assert set(rows) == {0, 1, 2, 10, 11}
    ids = [v[0] for v in rows.values()]
    assert len(set(ids)) == len(ids)
    assert all(v[0] is not None for v in rows.values())
