"""Interactive optimization workbench (round 13) — run under
``python -i`` in tmux so one warm SparkSession serves many interleaved
A/B measurements (host speed drifts between sessions; comparisons are
only valid inside one).

Helpers:
    t(fn, n=3)        -> list of seconds for n noop-sink executions
    q(name)           -> the registry query's DataFrame at sf0.1
    plan(df)          -> formatted physical plan string
    save_plan(df, p)  -> write plan to plans/r13/<p>.txt
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: F401

from parallel_dbms_spark.catalog import load_table  # noqa: F401
from parallel_dbms_spark.queries import REGISTRY
from parallel_dbms_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="opt_workbench",
    cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
)


def _exec(df):
    df.write.format("noop").mode("overwrite").save()


def t(mk, n=3, label=None):
    """mk: callable returning a DataFrame (fresh plan per run)."""
    out = []
    for i in range(n):
        if label:
            spark.sparkContext.setJobDescription(f"{label}#{i}")
        t0 = time.time()
        _exec(mk())
        out.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    print(out, flush=True)
    return out


def q(name):
    return REGISTRY[name].fn(spark, SF)


def plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def save_plan(df, name):
    p = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLAN_ROUND", "r14"), f"{name}.txt",
    )
    with open(p, "w") as f:
        f.write(plan(df))
    print("wrote", p, flush=True)


print("workbench ready", flush=True)
