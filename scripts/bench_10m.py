"""Baseline-scale benchmark: the reference's published numbers are for
10M-row single-column workloads (BASELINE.md / reference README.md:44-62):

    AVG(float)  10M rows  -> 12.2 s end-to-end
    MAX(date)   10M rows  -> 28 s
    ORDER BY    10M rows  -> 300 s (GPU radix path), 42 s CPU-sort-only

This script materializes a deterministic 10M-row table (double value
with 2 decimals, timestamp, a group key) as parquet in /tmp, then
times the same three workloads end-to-end (scan included, noop sink,
best of 2) plus a grouped aggregate and a 10M-row top-N. Prints one
JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parallel_dbms_spark.session import get_spark

N = int(os.environ.get("BENCH10M_ROWS", 10_000_000))
DATA = os.environ.get("BENCH10M_PATH", f"/tmp/bench_{N}")


def build(spark):
    if not os.path.exists(os.path.join(DATA, "_SUCCESS")):
        (
            spark.range(N)
            .select(
                F.col("id"),
                F.round(F.rand(seed=1) * 100000, 2).alias("value"),
                F.timestamp_micros(
                    (F.lit(820454400_000_000) + (F.rand(seed=2) * 126_230_400_000_000).cast("long"))
                ).alias("ts"),
                (F.col("id") % 1000).alias("grp"),
            )
            .write.mode("overwrite")
            .parquet(DATA)
        )
    return spark.read.parquet(DATA)


def build_csv(spark, df):
    """Same table as headerless CSV — the reference's input format, so
    the avg-over-CSV row is apples-to-apples with its 12.2s (which is
    dominated by CSV parse)."""
    path = DATA + "_csv"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df.write.mode("overwrite").option("header", False).csv(path)
    return spark.read.schema("id long, value double, ts timestamp, grp long").csv(path)


def main():
    spark = get_spark(app_name="bench10m")
    df = build(spark)
    df_csv = build_csv(spark, df)

    def noop(d):
        d.write.format("noop").mode("overwrite").save()

    workloads = {
        "agg_avg_10m": lambda: noop(df.agg(F.avg("value").alias("a"))),
        "agg_avg_10m_csv_input": lambda: noop(df_csv.agg(F.avg("value").alias("a"))),
        "agg_max_ts_10m": lambda: noop(df.agg(F.max("ts").alias("m"))),
        "orderby_10m": lambda: noop(df.orderBy("value")),
        "groupby_1k_10m": lambda: noop(
            df.groupBy("grp").agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("a"))
        ),
        "topn_10m": lambda: noop(df.orderBy(F.col("value").desc()).limit(100)),
    }
    times = {}
    for name, fn in workloads.items():
        best = None
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best or 1e9, time.time() - t0)
        times[name] = round(best, 3)

    ref = {"agg_avg_10m": 12.2, "agg_max_ts_10m": 28.0, "orderby_10m": 300.0}
    speedup = {k: round(ref[k] / times[k], 1) for k in ref}
    print(
        json.dumps(
            {
                "metric": "baseline_scale_10m",
                "unit": "sec",
                "rows": N,
                "queries": times,
                "reference_end_to_end_sec": ref,
                "speedup_vs_reference": speedup,
            }
        )
    )


if __name__ == "__main__":
    main()
