"""Differential fuzz of ROW TRACKING: random interleavings of
appends, compactions, z-orders, partition evolutions, copy-on-write
updates/deletes, merge-on-read deletes, merges, and restores against
a plain Python identity model {business_key: row_id}. The invariant
under test is the whole feature: a surviving row's ``_row_id`` NEVER
changes, ids are globally unique forever (no reuse after any op
sequence, including RESTORE), and ``_row_commit_version`` moves only
when the row's image actually changes."""

from __future__ import annotations

import random

import pytest

from parallel_dbms_spark.sources import txlog


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, val long")


def _snap(spark, t):
    return {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in txlog.read_snapshot(
            spark, t, with_row_ids=True
        ).collect()
    }


@pytest.mark.parametrize("seed", [0] + [
    pytest.param(s, marks=pytest.mark.slow)  # residual: seed 0
    for s in range(1, 5)
])
def test_random_ops_never_change_a_surviving_rows_identity(
    spark, tmp_path, seed
):
    rng = random.Random(7000 + seed)
    t = str(tmp_path / "fz")
    next_id = 0
    ever_ids: set = set()  # every _row_id ever observed, for reuse check

    def fresh(n):
        nonlocal next_id
        rows = [
            (next_id + i, rng.choice("abc"), rng.randrange(100))
            for i in range(n)
        ]
        next_id += n
        return rows

    txlog.tx_append(_mk(spark, fresh(6)), t)
    txlog.tx_enable_row_tracking(t)
    model = _snap(spark, t)  # {id: (row_id, commit_v)}
    ever_ids.update(v[0] for v in model.values())
    restore_points: list[tuple[int, dict]] = []

    for _ in range(9):
        op = rng.choice(
            [
                "append", "compact", "zorder", "repartition", "update",
                "delete", "mor_delete", "merge", "restore", "checkpointish",
            ]
        )
        if op == "append":
            rows = fresh(rng.randrange(2, 5))
            txlog.tx_append(_mk(spark, rows), t)
            now = _snap(spark, t)
            for i, _g, _v in rows:
                assert now[i][0] not in ever_ids, (seed, "id reuse")
            for k, v in model.items():
                assert now[k] == v, (seed, op, k)
            model = now
        elif op == "compact":
            txlog.tx_compact(spark, t, num_files=rng.randrange(1, 3))
            assert _snap(spark, t) == model, (seed, op)
        elif op == "zorder":
            txlog.tx_compact(spark, t, num_files=2, zorder_by=["val"])
            assert _snap(spark, t) == model, (seed, op)
        elif op == "repartition":
            txlog.tx_repartition_table(spark, t, ["grp"])
            assert _snap(spark, t) == model, (seed, op)
        elif op == "update":
            m = rng.randrange(2, 5)
            v, _ = txlog.tx_update_where(
                spark, t, f"id % {m} = 0", {"val": "val + 1000"}
            )
            now = _snap(spark, t)
            for k, (rid, cv) in model.items():
                assert now[k][0] == rid, (seed, op, k)
                if k % m == 0:
                    assert now[k][1] == v, (seed, op, k)
                else:
                    assert now[k][1] == cv, (seed, op, k)
            model = now
        elif op == "delete":
            m = rng.randrange(3, 6)
            txlog.tx_delete_where(spark, t, f"id % {m} = 1")
            now = _snap(spark, t)
            assert set(now) == {k for k in model if k % m != 1}
            for k in now:
                assert now[k] == model[k], (seed, op, k)
            model = now
        elif op == "mor_delete":
            m = rng.randrange(3, 6)
            txlog.tx_delete_where_mor(spark, t, f"id % {m} = 2")
            now = _snap(spark, t)
            assert set(now) == {k for k in model if k % m != 2}
            for k in now:
                assert now[k] == model[k], (seed, op, k)
            model = now
        elif op == "merge":
            if not model:
                continue
            matched = rng.choice(sorted(model))
            rows = [(matched, "z", 777)] + fresh(2)
            mv, _ = txlog.tx_merge_upsert(spark, t, _mk(spark, rows), ["id"])
            now = _snap(spark, t)
            for k, v in model.items():
                if k != matched:
                    assert now[k] == v, (seed, op, k)
            # the matched upsert is an UPDATE of the same logical row:
            # id stable, commit re-stamped to the merge
            assert now[matched][0] == model[matched][0], (
                seed, "merge keeps matched id"
            )
            assert now[matched][1] == mv, (seed, op)
            for i, _g, _v in rows:
                if i != matched:
                    assert now[i][0] not in ever_ids, (seed, "id reuse")
                    assert now[i][1] == mv
            model = now
        elif op == "restore" and restore_points:
            ver, old_model = restore_points[
                rng.randrange(len(restore_points))
            ]
            txlog.tx_restore(t, ver)
            now = _snap(spark, t)
            assert now == old_model, (seed, "restore returns exact ids")
            model = now
        elif op == "checkpointish":
            # burn versions so checkpoint folds happen mid-sequence
            for i in range(3):
                txlog.tx_set_constraint(
                    spark, t, "c", f"val >= -1 OR {i} = {i}"
                )
        ever_ids.update(v[0] for v in model.values())
        ids = [v[0] for v in model.values()]
        assert len(set(ids)) == len(ids), (seed, op, "uniqueness")
        restore_points.append((txlog.log_versions(t)[-1], dict(model)))

    # end state: DS-independent invariants hold one more time
    now = _snap(spark, t)
    assert now == model
    ids = [v[0] for v in now.values()]
    assert len(set(ids)) == len(ids)
