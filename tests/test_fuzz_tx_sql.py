"""Differential fuzz of the lake SQL door: random statement sequences
(INSERT / UPDATE / DELETE / MERGE / RENAME COLUMN / OPTIMIZE /
RESTORE) driven purely through ``tx_sql`` strings against a plain
Python model, with the surviving rows checked after EVERY statement —
the dispatcher's parsing, routing, and view rewriting must never
change what a statement means. RESTORE targets are sampled from the
model's own per-version history, so time travel through the SQL door
is cross-checked too."""

from __future__ import annotations

import os
import random

import pytest

from parallel_dbms_spark.sources import tx_sql, txlog


@pytest.mark.parametrize("seed", range(5))
def test_sql_door_random_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(8800 + seed)
    base = str(tmp_path)
    t = os.path.join(base, "t")

    def run(stmt):
        return tx_sql(spark, stmt, base_dir=base)

    run("CREATE TABLE t (k BIGINT, grp STRING, val BIGINT)")
    # model: {k: (grp, val)}; val_col tracks the rename state
    model: dict = {}
    val_col = "val"
    next_k = 0
    history: list[tuple[int, dict, str]] = []

    def snap():
        history.append(
            (txlog.log_versions(t)[-1], dict(model), val_col)
        )

    def check(tag):
        got = {
            r["k"]: (r["grp"], r[val_col])
            for r in run(f"SELECT k, grp, {val_col} FROM t").collect()
        }
        assert got == model, (seed, tag, val_col)

    snap()
    for step in range(10):
        op = rng.choice(
            ["insert", "insert", "update", "delete", "merge",
             "gmerge", "rename", "optimize", "restore", "mor_reorg",
             "analyze"]
        )
        if op == "insert":
            n = rng.randrange(1, 5)
            rows = [
                (next_k + i, rng.choice("abc"), rng.randrange(100))
                for i in range(n)
            ]
            next_k += n
            run(
                "INSERT INTO t VALUES "
                + ", ".join(f"({k}, '{g}', {v})" for k, g, v in rows)
            )
            model.update({k: (g, v) for k, g, v in rows})
        elif op == "update":
            g = rng.choice("abc")
            d = rng.randrange(1, 9)
            run(f"UPDATE t SET {val_col} = {val_col} + {d} "
                f"WHERE grp = '{g}'")
            model = {
                k: (gg, vv + d if gg == g else vv)
                for k, (gg, vv) in model.items()
            }
        elif op == "delete":
            m = rng.randrange(2, 5)
            run(f"DELETE FROM t WHERE k % {m} = 0")
            model = {k: r for k, r in model.items() if k % m != 0}
        elif op == "merge":
            upd = rng.sample(sorted(model), min(2, len(model)))
            rows = [(k, "z", 500 + k) for k in upd] + [
                (next_k, "m", 777)
            ]
            next_k += 1
            run(
                f"MERGE INTO t USING (SELECT * FROM (VALUES "
                + ", ".join(f"({k}, '{g}', {v})" for k, g, v in rows)
                + f") AS s(k, grp, {val_col})) ON (k) "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            model.update({k: (g, v) for k, g, v in rows})
        elif op == "gmerge":
            # generalized clause model: conditional matched DELETE,
            # column-level SET, conditional INSERT VALUES, and NOT
            # MATCHED BY SOURCE flagging — the r12 surface, replayed
            # against the model clause by clause
            upd = rng.sample(sorted(model), min(3, len(model)))
            rows = [
                (k, rng.choice("az"), rng.randrange(100)) for k in upd
            ] + [(next_k, rng.choice("mn"), rng.randrange(100))]
            next_k += 1
            thresh = rng.randrange(20, 80)
            kcut = rng.randrange(next_k + 1)
            run(
                "MERGE INTO t USING (SELECT * FROM (VALUES "
                + ", ".join(f"({k}, '{g}', {v})" for k, g, v in rows)
                + f") AS s(k, grp, {val_col})) AS s ON t.k = s.k "
                f"WHEN MATCHED AND s.{val_col} < {thresh} THEN DELETE "
                f"WHEN MATCHED THEN UPDATE SET "
                f"{val_col} = s.{val_col} + t.{val_col} "
                f"WHEN NOT MATCHED AND s.grp = 'm' THEN "
                f"INSERT (k, grp, {val_col}) "
                f"VALUES (s.k, 'M', s.{val_col}) "
                f"WHEN NOT MATCHED BY SOURCE AND t.k < {kcut} THEN "
                "UPDATE SET grp = 'o'"
            )
            src_map = {k: (g, v) for k, g, v in rows}
            new_model = {}
            for k, (g, v) in model.items():
                if k in src_map:
                    sv = src_map[k][1]
                    if sv < thresh:
                        continue  # matched DELETE
                    new_model[k] = (g, sv + v)  # matched UPDATE
                elif k < kcut:
                    new_model[k] = ("o", v)  # NMBS flag
                else:
                    new_model[k] = (g, v)
            for k, (g, v) in src_map.items():
                if k not in model and g == "m":
                    new_model[k] = ("M", v)  # conditional INSERT
            model = new_model
        elif op == "rename":
            new = "price" if val_col == "val" else "val"
            run(f"ALTER TABLE t RENAME COLUMN {val_col} TO {new}")
            val_col = new
        elif op == "optimize":
            run("OPTIMIZE t")
        elif op == "mor_reorg" and model:
            # the r12 soft-delete pair: DV the matches (fast-delete
            # door), then REORG PURGE through SQL — together they must
            # mean exactly what a rewrite delete means
            m = rng.randrange(2, 5)
            txlog.tx_delete_where_mor(spark, t, f"k % {m} = 1")
            run("REORG TABLE t APPLY (PURGE)")
            assert txlog.snapshot_dvs(t) == {}, (seed, step)
            model = {k: r for k, r in model.items() if k % m != 1}
        elif op == "analyze":
            # stats backfill is invisible to every later statement
            run("ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS k")
        elif op == "restore" and len(history) > 1:
            ver, old_model, old_col = history[
                rng.randrange(len(history))
            ]
            run(f"RESTORE TABLE t TO VERSION AS OF {ver}")
            model, val_col = dict(old_model), old_col
        check((step, op))
        snap()

    # closing cross-check: SQL aggregate vs model aggregate
    n, sv = run(
        f"SELECT COUNT(*) AS n, COALESCE(SUM({val_col}), 0) AS s FROM t"
    ).collect()[0]
    assert n == len(model)
    assert sv == sum(v for _, v in model.values())
