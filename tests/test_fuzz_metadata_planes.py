"""Cross-plane differential fuzz: IDENTITY columns, ROW TRACKING,
COLUMN MAPPING, CHECK constraints, and RESTORE interleaved on one
table. The single-plane fuzzers (test_fuzz_column_mapping,
test_fuzz_row_tracking) prove each plane alone; this one hunts the
INTERACTIONS — a rename that loses the generator, a restore that
resurrects a dropped declaration, a rewrite that re-mints ids under a
fresh mapping, a constraint that stops binding after the identity
column moves."""

from __future__ import annotations

import random

import pytest

from parallel_dbms_spark.sources import txlog


def _mk(spark, rows, id_name="rid"):
    return spark.createDataFrame(
        rows, f"{id_name} long, k long, grp string, val long"
    )


@pytest.mark.parametrize("seed", [0] + [
    pytest.param(s, marks=pytest.mark.slow)  # residual: seed 0
    for s in range(1, 4)
])
def test_planes_interact_without_losing_identity_or_ids(
    spark, tmp_path, seed
):
    rng = random.Random(9000 + seed)
    t = str(tmp_path / "fz")
    next_k = 0
    id_name = "rid"  # current logical name of the identity column
    ever_ident: set = set()  # every identity value ever observed

    def fresh(n):
        nonlocal next_k
        rows = [
            (next_k + i, rng.choice("ab"), rng.randrange(50))
            for i in range(n)
        ]
        next_k += n
        return rows

    def snap():
        out = {}
        for r in txlog.read_snapshot(
            spark, t, with_row_ids=True
        ).collect():
            out[r["k"]] = (r[id_name], r["_row_id"])
        return out

    def append(n):
        df = spark.createDataFrame(
            fresh(n), "k long, grp string, val long"
        )
        txlog.tx_append(df, t)

    # seed the table: identity + row tracking + a constraint
    txlog.tx_append(
        _mk(spark, [(100 + i, *row) for i, row in enumerate(fresh(5))]),
        t,
    )
    txlog.tx_set_identity(spark, t, "rid", start=1, step=2, always=True)
    txlog.tx_enable_row_tracking(t)
    txlog.tx_set_constraint(spark, t, "v_ok", "val >= 0")
    model = snap()
    ever_ident.update(v[0] for v in model.values())
    restore_points: list = []

    for _ in range(8):
        op = rng.choice(
            [
                "append", "rename_ident", "rename_payload", "update",
                "delete", "merge", "compact", "restore", "constraint",
            ]
        )
        if op == "append":
            append(rng.randrange(2, 5))
            now = snap()
            fresh_keys = set(now) - set(model)
            for kk in fresh_keys:
                assert now[kk][0] not in ever_ident, (seed, "ident reuse")
            for kk, v in model.items():
                assert now[kk] == v, (seed, op, kk)
            model = now
        elif op == "rename_ident":
            new = f"rid_{rng.randrange(1000)}"
            txlog.tx_rename_column(spark, t, id_name, new)
            id_name = new
            assert set(txlog.table_identity(t)) == {id_name}, seed
            now = snap()
            assert now == model, (seed, "rename is metadata-only")
            # the generator still fires under the new name
            append(2)
            now = snap()
            assert len({v[0] for v in now.values()}) == len(now)
            model = now
        elif op == "rename_payload":
            txlog.tx_rename_column(spark, t, "val", "val2")
            assert txlog.table_constraints(t) == {"v_ok": "val2 >= 0"}
            txlog.tx_rename_column(spark, t, "val2", "val")
            assert snap() == model, (seed, op)
        elif op == "update":
            m = rng.randrange(2, 4)
            txlog.tx_update_where(
                spark, t, f"k % {m} = 0", {"val": "val + 7"}
            )
            now = snap()
            assert now == model, (seed, "update keeps ident and row id")
        elif op == "delete":
            m = rng.randrange(3, 5)
            txlog.tx_delete_where(spark, t, f"k % {m} = 1")
            now = snap()
            assert set(now) == {kk for kk in model if kk % m != 1}
            assert all(now[kk] == model[kk] for kk in now), (seed, op)
            model = now
        elif op == "merge":
            if not model:
                continue
            matched = rng.choice(sorted(model))
            src = spark.createDataFrame(
                [(matched, "z", 9)] + fresh(1),
                "k long, grp string, val long",
            )
            txlog.tx_merge_upsert(spark, t, src, ["k"])
            now = snap()
            # matched keeps its IDENTITY value (merge looks it up);
            # its row id may re-mint (the row's image changed)
            assert now[matched][0] == model[matched][0], (seed, op)
            for kk, v in model.items():
                if kk != matched:
                    assert now[kk] == v, (seed, op, kk)
            model = now
        elif op == "compact":
            txlog.tx_compact(spark, t, num_files=rng.randrange(1, 3))
            assert snap() == model, (seed, "compact is pure layout")
        elif op == "restore" and restore_points:
            ver, old_model, old_name = restore_points[
                rng.randrange(len(restore_points))
            ]
            txlog.tx_restore(t, ver)
            id_name = old_name
            now = snap()
            assert now == old_model, (seed, "restore exact")
            assert set(txlog.table_identity(t)) == {id_name}, (
                seed, "restore re-binds the declaration's name",
            )
            # the generator never re-issues: fresh rows beyond history
            append(1)
            now = snap()
            fresh_keys = set(now) - set(old_model)
            for kk in fresh_keys:
                assert now[kk][0] not in ever_ident, (seed, "reuse")
            model = now
        elif op == "constraint":
            txlog.tx_drop_constraint(t, "v_ok")
            txlog.tx_set_constraint(spark, t, "v_ok", "val >= 0")
        ever_ident.update(v[0] for v in model.values())
        idents = [v[0] for v in model.values()]
        rowids = [v[1] for v in model.values()]
        assert len(set(idents)) == len(idents), (seed, op, "ident uniq")
        assert len(set(rowids)) == len(rowids), (seed, op, "rowid uniq")
        restore_points.append(
            (txlog.log_versions(t)[-1], dict(model), id_name)
        )

    # terminal cross-check: detail reports every plane consistently
    d = txlog.tx_detail(spark, t).collect()[0]
    assert d["identity_columns"] == [id_name]
    assert d["row_tracking"] is True
    assert d["constraints"] == ["v_ok"]
    # num_rows is the count when every live file carries stats, else
    # honestly NULL (the seed append here rides none)
    assert d["num_rows"] in (len(model), None)
