"""Differential fuzz of the round-11 write surface as ONE system:
random interleavings of appends, COPY INTO (fresh landings AND
re-runs), REPLACE WHERE, partition deletes (both flavors), TRUNCATE,
ADD COLUMN, and RESTORE against a Python model, rows checked after
every operation. The properties under test are the composition laws:
COPY idempotence must survive restores and truncates (loaded-set
monotonicity — Delta's contract: truncate/restore remove ROWS, not
load history), replaceWhere must never leak outside its predicate,
and whole-file drops must mean exactly what the row-level path means.
"""

from __future__ import annotations

import glob
import os
import random

import pytest

from parallel_dbms_spark.sources import txlog


def _mk(spark, rows, cols="k long, p long, v string"):
    return spark.createDataFrame(rows, cols)


@pytest.mark.parametrize("seed", range(5))
def test_write_surface_random_sequences(spark, tmp_path, seed):
    rng = random.Random(9900 + seed)
    t = str(tmp_path / "t")
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    next_k = 0
    n_landed = 0
    model: dict = {}  # {k: (p, v)}
    history: list[tuple[int, dict]] = []

    def fresh(n):
        nonlocal next_k
        rows = [
            (next_k + i, rng.randrange(3), rng.choice("xyz"))
            for i in range(n)
        ]
        next_k += n
        return rows

    txlog.tx_append(_mk(spark, fresh(6)), t, partition_by=["p"])
    model = {
        r["k"]: (r["p"], r["v"])
        for r in txlog.read_snapshot(spark, t).collect()
    }
    history.append((txlog.log_versions(t)[-1], dict(model)))

    def check(tag):
        got = {
            r["k"]: (r["p"], r["v"])
            for r in txlog.read_snapshot(spark, t).collect()
        }
        assert got == model, (seed, tag)

    for step in range(8):
        op = rng.choice(
            ["append", "copy", "copy_rerun", "replace", "pdelete",
             "truncate", "restore", "add_column_probe", "reorg_purge",
             "analyze"]
        )
        if op == "append":
            rows = fresh(rng.randrange(1, 4))
            txlog.tx_append(_mk(spark, rows), t)
            model.update({k: (p, v) for k, p, v in rows})
        elif op == "copy":
            rows = fresh(rng.randrange(1, 3))
            nonce = f"land{n_landed}"
            n_landed += 1
            _mk(spark, rows).coalesce(1).write.parquet(
                os.path.join(landing, nonce)
            )
            # flatten: COPY INTO globs one directory level
            for f in glob.glob(os.path.join(landing, nonce, "*.parquet")):
                os.rename(
                    f, os.path.join(landing, f"{nonce}.parquet")
                )
            _, n = txlog.tx_copy_into(spark, t, landing)
            assert n >= 1
            model.update({k: (p, v) for k, p, v in rows})
        elif op == "copy_rerun":
            _, n = txlog.tx_copy_into(spark, t, landing)
            assert n == 0, (
                seed, step, "COPY re-run must load nothing — load "
                "history survives truncate/restore (Delta's contract)",
            )
        elif op == "replace" and model:
            pv = rng.randrange(3)
            # rebuild the model by predicate semantics: the partition's
            # rows swap for exactly the replacement frame
            txlog.tx_replace_where(
                spark, t,
                _mk(spark, [(next_k + i, pv, "R") for i in range(2)]),
                f"p = {pv}",
            )
            model = {
                k: r for k, r in model.items() if r[0] != pv
            }
            model.update({next_k + i: (pv, "R") for i in range(2)})
            next_k += 2
        elif op == "pdelete" and model:
            pv = rng.randrange(3)
            if rng.random() < 0.5:
                txlog.tx_delete_where(spark, t, f"p = {pv}")
            else:
                txlog.tx_delete_where_mor(spark, t, f"p = {pv}")
            model = {k: r for k, r in model.items() if r[0] != pv}
        elif op == "truncate":
            txlog.tx_truncate(t)
            model = {}
        elif op == "restore" and history:
            ver, old = history[rng.randrange(len(history))]
            txlog.tx_restore(t, ver)
            model = dict(old)
        elif op == "reorg_purge":
            # maintenance is INVISIBLE to the model: purging vectors
            # (or a no-op when none exist) must never change a row
            had_dvs = bool(txlog.snapshot_dvs(t))
            _, n = txlog.tx_reorg_purge(spark, t)
            assert (n > 0) == had_dvs, (seed, step)
            assert txlog.snapshot_dvs(t) == {}
        elif op == "analyze":
            # stats backfill is metadata-only: rows unchanged, and
            # afterwards every live file is skippable on k
            txlog.tx_analyze(t, ["k"])
            st = txlog.snapshot_stats(t)
            _, live = txlog.snapshot_files(t)
            missing = [
                f for f in live if "k" not in st.get(f, {}).get("c", {})
            ]
            assert not missing, (seed, step, missing)
        elif op == "add_column_probe":
            # additive evolution mid-sequence: new column serves NULL
            # everywhere, then drops again — the surrounding ops must
            # be oblivious
            col = f"probe{step}"
            txlog.tx_add_column(t, col, "bigint")
            vals = {
                r[col]
                for r in txlog.read_snapshot(spark, t).collect()
            }
            assert vals <= {None}
            txlog.tx_drop_column(spark, t, col)
        check((step, op))
        history.append((txlog.log_versions(t)[-1], dict(model)))

    # the log's full history replays: every recorded version's
    # snapshot still resolves
    for ver, _m in history[-3:]:
        txlog.read_snapshot(spark, t, version=ver).count()
