"""Differential fuzz of partition-filtered reads: random partitioned
tables (string / int / bool / date columns, NULL partitions, mixed
declarations after evolution, MOR deletes) + random filters — the
pruned-and-backstopped read must equal the plain row filter over the
same snapshot, for every read face. Catches stringification drift
(bool/date rendering), wrong-column pruning, and must-read regressions
that a hand-picked case would miss."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from pyspark.sql import functions as F

from parallel_dbms_spark.sources import txlog
from parallel_dbms_spark.sources.txlog_ds import register_txlog_source

PCOLS = ["tag", "grp", "flag", "day"]


def _gen_rows(rng: random.Random, n: int):
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                rng.choice(["a", "b", "c", None]),
                rng.randrange(3),
                rng.choice([True, False]),
                dt.date(2024, 3, 1 + rng.randrange(3)),
                round(rng.uniform(0, 100), 2),
            )
        )
    return rows


def _gen_filter(rng: random.Random, pcols: list):
    col = rng.choice(pcols)
    base = col[:-2] if col.endswith("_r") else col  # renamed columns
    domain = {
        "tag": ["a", "b", "c", None],
        "grp": [0, 1, 2],
        "flag": [True, False],
        "day": [dt.date(2024, 3, 1 + d) for d in range(3)],
    }[base]
    k = rng.randrange(1, len(domain) + 1)
    vals = rng.sample(domain, k)
    return {col: vals}


@pytest.mark.parametrize("seed", [0, 1] + [
    pytest.param(s, marks=pytest.mark.slow)  # residual: seeds 0-1
    for s in range(2, 8)
])
def test_partition_filter_equals_row_filter(spark, tmp_path, seed):
    rng = random.Random(4000 + seed)
    register_txlog_source(spark)
    t = str(tmp_path / "pf")
    schema = (
        "id long, tag string, grp int, flag boolean, day date, "
        "score double"
    )
    pcols = rng.sample(PCOLS, rng.randrange(1, 3))
    txlog.tx_append(
        spark.createDataFrame(_gen_rows(rng, 300), schema), t,
        partition_by=pcols,
    )
    txlog.tx_append(spark.createDataFrame(_gen_rows(rng, 200), schema), t)
    if rng.random() < 0.5:
        txlog.tx_delete_where_mor(spark, t, f"id % 7 = {rng.randrange(7)}")
    if rng.random() < 0.5:
        # partition EVOLUTION mid-history: old-declaration files stay
        # live with mixed-column recorded values (must-read, exact)
        pcols = rng.sample([c for c in PCOLS if c not in pcols], 1)
        txlog.tx_repartition_table(spark, t, pcols)
        txlog.tx_append(
            spark.createDataFrame(_gen_rows(rng, 100), schema), t
        )
    if rng.random() < 0.5:
        # COLUMN MAPPING mid-history: rename one declared partition
        # column — pruning metadata is keyed physically, so every
        # face must keep pruning recorded files under the NEW name
        ren = rng.choice(pcols)
        txlog.tx_rename_column(spark, t, ren, f"{ren}_r")
        pcols = [f"{ren}_r" if c == ren else c for c in pcols]
        assert txlog.table_partition_by(t) == pcols
    flt = _gen_filter(rng, pcols)

    def row_filter(df):
        for c, vals in flt.items():
            nn = [x for x in vals if x is not None]
            cond = F.col(c).isin(nn) if nn else F.lit(False)
            if any(x is None for x in vals):
                cond = cond | F.col(c).isNull()
            df = df.filter(cond)
        return df

    expect = sorted(
        (r.id, r.score)
        for r in row_filter(txlog.read_snapshot(spark, t)).collect()
    )
    # face 1: read_snapshot(partition_filter=)
    got = sorted(
        (r.id, r.score)
        for r in txlog.read_snapshot(
            spark, t, partition_filter=flt
        ).collect()
    )
    assert got == expect, (seed, flt)
    # face 2: the batch DataSource with the partitionFilter option
    import json as _json

    def _js(v):
        if isinstance(v, dt.date):
            return v.isoformat()
        return v

    opt = _json.dumps({c: [_js(x) for x in vals] for c, vals in flt.items()})
    got_ds = sorted(
        (r.id, r.score)
        for r in spark.read.format("txlog").option("path", t)
        .option("partitionFilter", opt).load().collect()
    )
    assert got_ds == expect, (seed, flt)
