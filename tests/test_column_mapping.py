"""Column mapping (txlog.tx_rename_column / tx_drop_column): rename
and drop are METADATA-ONLY commits — no data rewrite at any scale —
re-expressing Delta's column-mapping name mode (the reference's fixed
typed headers, /root/reference/src/headers/duckdb_manager.cpp:52-140,
have no comparable surface). Data files keep stable PHYSICAL names;
per-file log metadata (partitionValues, stats, bloom/distinct keys)
is recorded physically and the public snapshot_* faces translate, so
pruning/skipping survive renames untouched."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from parallel_dbms_spark.sources import txlog
from parallel_dbms_spark.sources.txlog_ds import register_txlog_source


def _mk(spark, rows, schema="k long, v string, region string, amt double"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "cm")
    txlog.tx_append(
        _mk(
            spark,
            [
                (1, "a", "eu", 10.0),
                (2, "b", "us", 20.0),
                (3, "a", "us", 30.0),
            ],
        ),
        t,
        partition_by=["v"],
        stats_cols=["k"],
    )
    return t


def test_rename_is_metadata_only_and_serves_new_names(spark, table):
    """The rename commit adds/removes NO files (O(1) regardless of
    table size) and subsequent reads serve the new logical name over
    the untouched bytes."""
    before = set(txlog.snapshot_files(table)[1])
    txlog.tx_rename_column(spark, table, "k", "id")
    rec = txlog.read_commit(table, txlog.log_versions(table)[-1])
    assert rec["action"] == "rename_column"
    assert rec["added"] == [] and rec["removed"] == []
    assert set(txlog.snapshot_files(table)[1]) == before
    snap = txlog.read_snapshot(spark, table)
    assert snap.columns == ["id", "v", "region", "amt"]
    assert {r.id for r in snap.collect()} == {1, 2, 3}
    # old name is gone; re-renaming onto a taken name raises
    with pytest.raises(ValueError, match="not in"):
        txlog.tx_rename_column(spark, table, "k", "x")
    with pytest.raises(ValueError, match="already exists"):
        txlog.tx_rename_column(spark, table, "id", "v")


def test_rename_rebinds_constraints_and_keeps_enforcing(spark, table):
    txlog.tx_set_constraint(spark, table, "k_pos", "k > 0 AND v <> 'k'")
    txlog.tx_rename_column(spark, table, "k", "id")
    # identifier rewrite is word-bounded and skips string literals:
    # the 'k' literal survives, the k column rewrites
    assert txlog.table_constraints(table) == {
        "k_pos": "id > 0 AND v <> 'k'"
    }
    with pytest.raises(ValueError, match="CHECK constraint"):
        txlog.tx_append(
            _mk(spark, [(-1, "z", "ap", 1.0)],
                "id long, v string, region string, amt double"),
            table,
        )
    txlog.tx_append(
        _mk(spark, [(9, "z", "ap", 1.0)],
            "id long, v string, region string, amt double"),
        table,
    )
    assert txlog.read_snapshot(spark, table).count() == 4


def test_rename_partition_column_keeps_pruning(spark, table):
    """Partition values are keyed physically in the log, so renaming
    the PARTITION column costs nothing: the declaration follows the
    rename and every recorded file still prunes."""
    txlog.tx_rename_column(spark, table, "v", "cat")
    assert txlog.table_partition_by(table) == ["cat"]
    assert all(
        set(vals) == {"cat"} for vals in txlog.snapshot_pv(table).values()
    )
    got = {
        r.k
        for r in txlog.read_snapshot(
            spark, table, partition_filter={"cat": "a"}
        ).collect()
    }
    assert got == {1, 3}
    # the OLD name is no longer a partition column anywhere
    with pytest.raises(ValueError, match="not partition column"):
        txlog.read_snapshot(spark, table, partition_filter={"v": "a"})
    # appends AFTER the rename stage value-pure and prune with the rest
    txlog.tx_append(
        _mk(spark, [(7, "a", "ap", 5.0)],
            "k long, cat string, region string, amt double"),
        table,
    )
    got = {
        r.k
        for r in txlog.read_snapshot(
            spark, table, partition_filter={"cat": "a"}
        ).collect()
    }
    assert got == {1, 3, 7}


def test_rename_keeps_stats_skipping_and_bloom(spark, table):
    txlog.tx_bloom(spark, table, ["k"])
    txlog.tx_rename_column(spark, table, "k", "id")
    # stats recorded pre-rename skip under the NEW name
    df, n_read, n_total = txlog.tx_read_skipping(
        spark, table, "id", lo=1000, hi=2000
    )
    assert n_total >= 1 and n_read == 0
    df2, n_read2, _ = txlog.tx_read_skipping(spark, table, "id", lo=1, hi=1)
    assert n_read2 >= 1
    assert {r.id for r in df2.filter("id = 1").collect()} == {1}
    # bloom sidecars built pre-rename answer point lookups post-rename
    hit, nr, nt = txlog.tx_point_lookup(spark, table, "id", 2)
    assert {r.id for r in hit.collect()} == {2}
    assert 0 < nr <= nt
    miss, nr_miss, _ = txlog.tx_point_lookup(spark, table, "id", 999)
    assert miss.count() == 0 and nr_miss < nt
    # metadata-only instant agg serves under the new name too
    agg, _, _ = txlog.tx_instant_agg(spark, table, "id")
    row = agg.collect()[0]
    assert (row.n_rows, row.col_min, row.col_max) == (3, 1, 3)


def test_drop_column_blocks_guards_and_never_resurrects(spark, table):
    txlog.tx_set_constraint(spark, table, "amt_pos", "amt >= 0")
    with pytest.raises(ValueError, match="constraint"):
        txlog.tx_drop_column(spark, table, "amt")
    with pytest.raises(ValueError, match="partition column"):
        txlog.tx_drop_column(spark, table, "v")
    txlog.tx_drop_constraint(table, "amt_pos")
    txlog.tx_drop_column(spark, table, "amt")
    snap = txlog.read_snapshot(spark, table)
    assert snap.columns == ["k", "v", "region"]
    # re-added column mints a FRESH physical name: the old bytes stay
    # dead, old rows read NULL, new rows read their own values
    txlog.tx_append(
        _mk(spark, [(4, "c", "ap", 99.0)]), table, merge_schema=True
    )
    rows = {r.k: r.amt for r in txlog.read_snapshot(spark, table).collect()}
    assert rows[4] == 99.0
    assert rows[1] is None and rows[2] is None and rows[3] is None
    cm = txlog.table_column_mapping(table)
    assert cm is not None
    mapping, retired = cm
    assert retired == ["amt"]
    assert mapping["amt"] != "amt"  # fresh physical name minted


def test_time_travel_and_restore_cross_renames(spark, table):
    v1 = txlog.log_versions(table)[-1]
    txlog.tx_rename_column(spark, table, "k", "id")
    v2 = txlog.log_versions(table)[-1]
    txlog.tx_rename_column(spark, table, "id", "key")
    assert txlog.read_snapshot(spark, table).columns[0] == "key"
    # VERSION AS OF serves each version's own logical names
    assert txlog.read_snapshot(spark, table, version=v1).columns[0] == "k"
    assert txlog.read_snapshot(spark, table, version=v2).columns[0] == "id"
    # RESTORE undoes the later rename (metadata state travels whole)
    txlog.tx_restore(table, v2)
    assert txlog.read_snapshot(spark, table).columns[0] == "id"
    assert {r.id for r in txlog.read_snapshot(spark, table).collect()} == {
        1, 2, 3,
    }
    # partition pruning still intact after the restore
    got = {
        r.id
        for r in txlog.read_snapshot(
            spark, table, partition_filter={"v": "a"}
        ).collect()
    }
    assert got == {1, 3}


def test_clone_carries_mapping(spark, table, tmp_path):
    txlog.tx_rename_column(spark, table, "k", "id")
    dst = str(tmp_path / "clone")
    txlog.tx_clone(table, dst)
    snap = txlog.read_snapshot(spark, dst)
    assert snap.columns == ["id", "v", "region", "amt"]
    assert {r.id for r in snap.collect()} == {1, 2, 3}
    got = {
        r.id
        for r in txlog.read_snapshot(
            spark, dst, partition_filter={"v": "a"}
        ).collect()
    }
    assert got == {1, 3}


def test_dml_and_cdc_under_rename(spark, table):
    """DELETE / UPDATE / MERGE keep working after renames, and the
    change feed serves the END-version logical names across the whole
    range (per-commit diffs run in the stable physical space)."""
    txlog.tx_rename_column(spark, table, "k", "id")
    txlog.tx_delete_where(spark, table, "id = 2", write_cdc=True)
    txlog.tx_update_where(
        spark, table, "id = 3", {"amt": "amt + 1"}, write_cdc=True
    )
    src = _mk(
        spark,
        [(1, "a", "eu", 11.0), (5, "b", "ap", 50.0)],
        "id long, v string, region string, amt double",
    )
    txlog.tx_merge_upsert(spark, table, src, ["id"])
    rows = {r.id: r.amt for r in txlog.read_snapshot(spark, table).collect()}
    assert rows == {1: 11.0, 3: 31.0, 5: 50.0}
    ch = txlog.tx_changes(spark, table, 0)
    assert set(ch.columns) == {
        "id", "v", "region", "amt", "_change_type", "_commit_version",
    }
    # the pre-rename append's inserts appear under the NEW name
    first = {
        r.id
        for r in ch.filter(
            (F.col("_commit_version") == 1)
            & (F.col("_change_type") == "insert")
        ).collect()
    }
    assert first == {1, 2, 3}


def test_checkpoint_folds_mapping(spark, tmp_path):
    """Resolution from a checkpoint (tail replay seeded past the
    rename commit) must still see the mapping."""
    t = str(tmp_path / "ck")
    txlog.tx_append(_mk(spark, [(1, "a", "eu", 1.0)]), t)
    txlog.tx_rename_column(spark, t, "k", "id")
    # push past CHECKPOINT_EVERY so a checkpoint lands AFTER the rename
    for i in range(txlog.CHECKPOINT_EVERY + 1):
        txlog.tx_append(
            _mk(spark, [(10 + i, "b", "us", 2.0)],
                "id long, v string, region string, amt double"),
            t,
        )
    import os

    assert any(
        os.path.exists(txlog._ckpt_path(t, v))
        for v in txlog.log_versions(t)
        if v > 2
    )
    cm = txlog.table_column_mapping(t)
    assert cm is not None and cm[0]["id"] == "k"
    snap = txlog.read_snapshot(spark, t)
    assert snap.columns[0] == "id"
    assert snap.count() == txlog.CHECKPOINT_EVERY + 2


def test_append_racing_rename_raises(spark, table, monkeypatch):
    """An append whose files staged under the pre-rename mapping must
    NOT publish stale physical names: the commit loop detects the
    drift and raises for a clean re-run (same contract as the
    partition re-declaration race)."""
    # seed a mapping so the append takes the mapped path
    txlog.tx_rename_column(spark, table, "k", "id")
    real = txlog._stage_for
    fired = []

    def racing(df, tbl, *a, **kw):
        out = real(df, tbl, *a, **kw)
        if not fired:
            fired.append(1)
            txlog.tx_rename_column(spark, table, "id", "key")
        return out

    monkeypatch.setattr(txlog, "_stage_for", racing)
    # tx_append stages via _stage_partitioned (partitioned table);
    # patch that instead when _stage_for is not on the append path
    real_sp = txlog._stage_partitioned

    def racing_sp(df, tbl, cols, *a, **kw):
        out = real_sp(df, tbl, cols, *a, **kw)
        if not fired:
            fired.append(1)
            txlog.tx_rename_column(spark, table, "id", "key")
        return out

    monkeypatch.setattr(txlog, "_stage_partitioned", racing_sp)
    # the retry loop notices the drift LOUDLY before committing —
    # either as logical schema drift (a rename always changes the
    # logical schema, so validation sees it first) or, when the
    # logical names still conform (drop+re-add races), as the explicit
    # column-mapping drift check. Nothing lands either way.
    with pytest.raises(
        ValueError, match="column mapping|schema drift"
    ):
        txlog.tx_append(
            _mk(spark, [(8, "c", "ap", 3.0)],
                "id long, v string, region string, amt double"),
            table,
        )
    assert {r[0] for r in txlog.read_snapshot(spark, table).collect()} == {
        1, 2, 3,
    }


def test_rewrite_idents_unit():
    rw = txlog._rewrite_idents
    assert rw("k > 0", {"k": "id"}) == "id > 0"
    assert rw("qty > 0 AND qty2 < net_qty", {"qty": "q"}) == (
        "q > 0 AND qty2 < net_qty"
    )
    assert rw("v <> 'k and k'", {"k": "id"}) == "v <> 'k and k'"
    assert rw("`k` > 0", {"k": "id"}) == "`id` > 0"
    assert rw("upper(v) = 'K''s k'", {"k": "id"}) == "upper(v) = 'K''s k'"
    assert rw("a + b", {}) == "a + b"


def test_ds_faces_serve_logical_names(spark, table):
    """All four DataSource read faces serve the renamed schema and
    prune by the renamed partition column; the sink stages physical
    under the mapping (end-to-end proof lives in the registry row
    lake_tx_column_mapping)."""
    register_txlog_source(spark)
    txlog.tx_rename_column(spark, table, "v", "cat")
    txlog.tx_rename_column(spark, table, "k", "id")
    df = (
        spark.read.format("txlog").option("path", table)
        .option("partitionFilter", '{"cat": "a"}').load()
    )
    assert df.columns == ["id", "cat", "region", "amt"]
    assert {r.id for r in df.collect()} == {1, 3}


def test_zorder_compact_and_bloom_backfill_after_rename(spark, tmp_path):
    """Maintenance ops run with LOGICAL names after a rename: a
    Z-order compaction clusters by the renamed column (stats recorded
    physically, skipping served logically), and a Bloom backfill keyed
    by the renamed column prunes point lookups — the full
    stats/bloom/skipping loop survives the mapping."""
    t = str(tmp_path / "zb")
    txlog.tx_append(
        spark.createDataFrame(
            [(i, i % 7, float(i)) for i in range(2000)],
            "k long, g long, x double",
        ).repartition(4),
        t,
    )
    txlog.tx_rename_column(spark, t, "k", "id")
    txlog.tx_compact(
        spark, t, num_files=4, zorder_by=["id"], stats_cols=["id"]
    )
    df, n_read, n_total = txlog.tx_read_skipping(
        spark, t, "id", lo=0, hi=99
    )
    assert n_total == 4 and n_read < n_total, (n_read, n_total)
    assert df.filter("id < 100").count() == 100
    txlog.tx_bloom(spark, t, ["id"])
    hit, nr, nt = txlog.tx_point_lookup(spark, t, "id", 1234)
    assert {r.id for r in hit.collect()} == {1234}
    assert nr < nt, (nr, nt)


def test_stream_serves_pinned_schema_across_rename(spark, tmp_path):
    """A rename landing MID-STREAM (between micro-batches of one
    running query) must not null the column: the reader pinned the
    init-time mapping, physical names are stable, so post-rename
    appends keep serving under the stream's declared (old) names —
    translating with the LATEST mapping instead would rename the file
    column away from the serve schema and silently null it. A DROP
    mid-stream fails loudly instead (Delta's rule)."""
    import pyarrow as pa

    from parallel_dbms_spark.sources.txlog_ds import TxLogStreamReader

    register_txlog_source(spark)
    t = str(tmp_path / "st")
    mk = lambda rows, sch: spark.createDataFrame(rows, sch)
    txlog.tx_append(mk([(1, "a")], "k long, c string"), t)
    # ONE running query: the reader initializes BEFORE the rename
    rdr = TxLogStreamReader({"path": t}, txlog.table_schema(t))
    assert rdr.fields == ("k", "c")
    # rename + append land between micro-batches
    txlog.tx_rename_column(spark, t, "c", "cat")
    txlog.tx_append(mk([(2, "b")], "k long, cat string"), t)
    parts = rdr.partitions({"v": 0}, rdr.latestOffset())
    rows = []
    for p in parts:
        for r in rdr.read(p):
            if isinstance(r, pa.RecordBatch):
                rows.extend(tuple(d.values()) for d in r.to_pylist())
            else:
                rows.append(tuple(r))
    assert sorted(rows) == [(1, "a"), (2, "b")], rows  # NOT (2, None)
    # a drop mid-stream raises with a restart instruction
    txlog.tx_drop_column(spark, t, "cat")
    txlog.tx_append(mk([(3,)], "k long"), t)
    with pytest.raises(ValueError, match="dropped a column"):
        rdr.partitions({"v": 0}, rdr.latestOffset())
    # a FRESH stream (restart against the new schema) serves cleanly
    rdr2 = TxLogStreamReader({"path": t}, txlog.table_schema(t))
    assert rdr2.fields == ("k",)
    parts2 = rdr2.partitions({"v": 0}, rdr2.latestOffset())
    got = []
    for p in parts2:
        for r in rdr2.read(p):
            if isinstance(r, pa.RecordBatch):
                got.extend(tuple(d.values()) for d in r.to_pylist())
            else:
                got.append(tuple(r))
    assert sorted(got) == [(1,), (2,), (3,)], got
