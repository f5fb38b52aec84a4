"""Differential fuzz of COLUMN MAPPING: random interleavings of
appends (some evolving), renames, drops, re-adds, row deletes,
compactions, and constraint changes against a plain Python row model
keyed by the CURRENT logical names. Catches translation drift a
hand-picked case would miss: a rename that misses one metadata plane,
a drop whose physical name resurrects on re-add, a rewrite that
re-stages under stale names."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from parallel_dbms_spark.sources import txlog

POOL = ["alpha", "beta", "gamma", "delta", "epsi"]


def _schema(cols: list[str]) -> str:
    return ", ".join(["id long"] + [f"{c} long" for c in cols])


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, _schema(cols))


@pytest.mark.parametrize("seed", range(6))
def test_random_mapping_ops_match_row_model(spark, tmp_path, seed):
    rng = random.Random(5000 + seed)
    t = str(tmp_path / "fz")
    # model: {id: {logical_col: value}}, cols: current logical schema
    cols = ["alpha", "beta"]
    model: dict[int, dict] = {}
    next_id = 0

    def fresh_rows(n):
        nonlocal next_id
        rows = []
        for _ in range(n):
            vals = {c: rng.randrange(100) for c in cols}
            rows.append((next_id, vals))
            next_id += 1
        return rows

    def do_append(evolve: bool):
        nonlocal cols
        if evolve:
            unused = [c for c in POOL if c not in cols]
            if not unused:
                evolve = False
            else:
                cols = cols + [rng.choice(unused)]
        rows = fresh_rows(rng.randrange(2, 6))
        df = _mk(
            spark,
            [(i,) + tuple(v.get(c) for c in cols) for i, v in rows],
            cols,
        )
        txlog.tx_append(df, t, merge_schema=True)
        for i, v in rows:
            model[i] = dict(v)

    # the table exists from op 0
    do_append(evolve=False)

    for _ in range(10):
        op = rng.choice(
            ["append", "evolve", "rename", "drop", "delete", "compact"]
        )
        if op == "append":
            do_append(evolve=False)
        elif op == "evolve":
            do_append(evolve=True)
        elif op == "rename":
            old = rng.choice(cols)
            new = f"{rng.choice(POOL)}_{rng.randrange(1000)}"
            txlog.tx_rename_column(spark, t, old, new)
            cols = [new if c == old else c for c in cols]
            for v in model.values():
                if old in v:
                    v[new] = v.pop(old)
        elif op == "drop":
            if len(cols) < 2:
                continue
            victim = rng.choice(cols)
            txlog.tx_drop_column(spark, t, victim)
            cols = [c for c in cols if c != victim]
            for v in model.values():
                v.pop(victim, None)
        elif op == "delete":
            m = rng.randrange(2, 5)
            txlog.tx_delete_where(spark, t, f"id % {m} = 0")
            model = {i: v for i, v in model.items() if i % m != 0}
        elif op == "compact":
            txlog.tx_compact(spark, t, num_files=2)

    # the snapshot equals the model under the CURRENT logical names
    # (dropped-then-readded columns read NULL for pre-drop rows — the
    # model holds None for them because drop removed the key)
    snap = txlog.read_snapshot(spark, t)
    assert set(snap.columns) == {"id", *cols}, (seed, snap.columns, cols)
    got = {
        r["id"]: {c: r[c] for c in cols} for r in snap.collect()
    }
    want = {i: {c: v.get(c) for c in cols} for i, v in model.items()}
    assert got == want, (seed, cols)

    # the DS batch face agrees with read_snapshot
    from parallel_dbms_spark.sources.txlog_ds import register_txlog_source

    register_txlog_source(spark)
    ds = spark.read.format("txlog").option("path", t).load()
    got_ds = {r["id"]: {c: r[c] for c in cols} for r in ds.collect()}
    assert got_ds == want, seed

    # the change feed's final fold equals the snapshot (signed replay
    # under the end-version names)
    ch = txlog.tx_changes(spark, t, 0)
    ins = {
        r["id"]
        for r in ch.filter(F.col("_change_type") == "insert").collect()
    }
    dels = [
        r["id"]
        for r in ch.filter(F.col("_change_type") == "delete").collect()
    ]
    alive = set(ins)
    for d in dels:
        alive.discard(d)
    # deletes of rows re-inserted by a rewrite cancel via exceptAll;
    # multiset fold: count inserts minus deletes per id
    from collections import Counter

    cnt = Counter(
        r["id"]
        for r in ch.filter(F.col("_change_type") == "insert").collect()
    )
    cnt.subtract(dels)
    fold = {i for i, n in cnt.items() if n > 0}
    assert fold == set(model), (seed, len(fold), len(model))
