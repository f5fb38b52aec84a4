"""TWAP / OHLC: pandas-reference differentials on randomized series
(the registry oracles cover the fixture exactly; these pin semantics
on adversarial shapes — ties, singletons, zero-duration runs)."""

from __future__ import annotations

import datetime
import random

import pandas as pd
from pyspark.sql import functions as F


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_twap_matches_pandas_reference(spark):
    from parallel_dbms_spark.operators import twap

    rng = random.Random(3)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(12):
        n = rng.randint(1, 40)  # includes single-obs users (must drop)
        t = base
        for _ in range(n):
            # duplicate timestamps exercised via zero increments
            t = t + datetime.timedelta(seconds=rng.choice([0, 7, 60, 3600]))
            rows.append((eid, uid, t, round(rng.uniform(0, 500), 2)))
            eid += 1
    got = {
        r["user_id"]: (r["twap"], r["total_secs"], r["n_obs"])
        for r in twap(_mk_events(spark, rows)).collect()
    }

    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cents = (g["value"] * 100).round().astype("int64").to_numpy()
        secs = (g["ts"].astype("int64") // 10**9).to_numpy()
        dur = secs[1:] - secs[:-1]
        total = int(dur.sum())
        if total == 0:
            assert uid not in got  # singleton or all-duplicate stamps
            continue
        want = float((cents[:-1] * dur).sum()) / total / 100.0
        assert got[uid][0] == want and got[uid][1] == total
        # n_obs counts the weighted observations (those WITH a successor,
        # zero-duration ones included)
        assert got[uid][2] == len(dur)


def test_ohlc_matches_pandas_reference(spark):
    from parallel_dbms_spark.operators import ohlc_resample

    rng = random.Random(9)
    base = datetime.datetime(2024, 3, 1)
    rows = [
        (
            i,
            0,
            base + datetime.timedelta(seconds=rng.randint(0, 6 * 3600)),
            round(rng.uniform(1, 100), 2),
        )
        for i in range(500)
    ]
    got = {
        r["bucket_ts"]: (r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in ohlc_resample(_mk_events(spark, rows), bucket="1 hour").collect()
    }

    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    pdf["bucket"] = pdf["ts"].dt.floor("h")
    for b, g in pdf.groupby("bucket"):
        g = g.sort_values(["ts", "event_id"])
        want = (
            float(g["value"].iloc[0]),
            float(g["value"].max()),
            float(g["value"].min()),
            float(g["value"].iloc[-1]),
            len(g),
        )
        assert got[b.to_pydatetime()] == want, b
