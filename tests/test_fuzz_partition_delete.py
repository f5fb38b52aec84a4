"""Differential fuzz of the transactional DELETE's metadata-only
partition fast path: random partitioned tables (NULL partitions
included, layouts mixed by pre-declaration history), random predicate
sequences — partition-shaped (fast-path-eligible) and row-shaped —
routed through BOTH delete flavors (copy-on-write tx_delete_where and
merge-on-read tx_delete_where_mor), checked row-for-row against a
plain Python model after EVERY operation. The fast path must never
change WHAT a delete means, only what it costs; eligibility is also
asserted (a partition-equality delete over value-pure files commits
nothing staged / nothing vectored for those files)."""

from __future__ import annotations

import random

import pytest

from parallel_dbms_spark.sources import txlog


def _model_match(row, pred):
    """pred = ('p', values) partition form or ('k<', bound) row form
    or ('s=', value)."""
    kind, arg = pred
    k, p, s = row
    if kind == "p=":
        return p is not None and p in arg
    if kind == "k<":
        return k < arg
    if kind == "s=":
        return s == arg
    raise AssertionError(kind)


def _sql(pred):
    kind, arg = pred
    if kind == "p=":
        return (
            f"p = {arg[0]}" if len(arg) == 1
            else f"p IN ({', '.join(map(str, sorted(arg)))})"
        )
    if kind == "k<":
        return f"k < {arg}"
    if kind == "s=":
        return f"s = '{arg}'"
    raise AssertionError(kind)


@pytest.mark.parametrize("seed", [0, 1] + [
    pytest.param(s, marks=pytest.mark.slow)  # residual: seeds 0-1
    for s in range(2, 6)
])
def test_partition_delete_differential(spark, tmp_path, seed):
    rng = random.Random(4200 + seed)
    t = str(tmp_path / "t")
    rows = [
        (
            i,
            None if rng.random() < 0.1 else rng.randrange(4),
            rng.choice(["a", "b", "c"]),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k long, p long, s string")
    if rng.random() < 0.5:
        # pre-declaration mixed history + declaring append: some files
        # stay pv-unrecorded, so purity is only partially provable
        half = rng.randrange(50, 250)
        txlog.tx_append(
            spark.createDataFrame(rows[:half], "k long, p long, s string")
            .coalesce(1),
            t,
        )
        txlog.tx_append(
            spark.createDataFrame(rows[half:], "k long, p long, s string"),
            t,
            partition_by=["p"],
        )
    else:
        txlog.tx_append(df.repartition(3), t, partition_by=["p"])
    model = {r[0]: r for r in rows}

    for step in range(4):
        kind = rng.choice(["p=", "p=", "k<", "s="])
        if kind == "p=":
            pred = ("p=", sorted(rng.sample(range(4), rng.randrange(1, 3))))
        elif kind == "k<":
            pred = ("k<", rng.randrange(0, 300))
        else:
            pred = ("s=", rng.choice(["a", "b", "c"]))
        sql = _sql(pred)
        mor = rng.random() < 0.5
        _, before = txlog.snapshot_files(t)
        pv = txlog.snapshot_pv(t)
        pure = [
            f
            for f in before
            if pred[0] == "p="
            and (vals := pv.get(f)) is not None
            and "p" in vals
            and vals["p"] in {str(x) for x in pred[1]}
        ]
        if mor:
            v, n = txlog.tx_delete_where_mor(spark, t, sql)
        else:
            v, n = txlog.tx_delete_where(spark, t, sql)
        expect = {
            k: r for k, r in model.items() if not _model_match(r, pred)
        }
        n_deleted_model = len(model) - len(expect)
        model = expect
        got = {
            r["k"]: (r["k"], r["p"], r["s"])
            for r in txlog.read_snapshot(spark, t).collect()
        }
        assert got == model, (seed, step, sql, mor)
        if n_deleted_model == 0:
            continue
        rec = txlog.read_commit(t, v)
        # fast-path eligibility: every provably-pure file dropped
        # without staging (CoW) or vectoring (MOR) it
        assert set(pure) <= set(rec["removed"]), (seed, step, sql)
        if mor:
            assert not set(pure) & set(rec.get("dv", {})), (seed, step)
        if pred[0] == "p=" and not mor:
            staged_ok = set(rec["added"]) == set() or any(
                f not in pure for f in rec["removed"]
            )
            assert staged_ok, (seed, step, "pure-only delete staged files")

    # end state: a full read one more time, plus vacuum safety
    txlog.tx_vacuum(t, retention_seconds=0.0)
    got = {
        r["k"]: (r["k"], r["p"], r["s"])
        for r in txlog.read_snapshot(spark, t).collect()
    }
    assert got == model, (seed, "post-vacuum")
