"""Bucketed co-located join: the sort-merge join over two tables
bucketed by the join key must show NO shuffle Exchange on either join
input — bucketing pre-paid the shuffle at write time. Plus full MERGE
(I/U/D) and transition-matrix semantics unit checks that share the
session."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from parallel_dbms_spark.catalog import load_table
from parallel_dbms_spark.operators.cdc import merge_apply_cdc
from parallel_dbms_spark.operators.sessionize import transition_counts
from parallel_dbms_spark.plans import formatted_plan
from parallel_dbms_spark.sources.lake import write_bucketed_table


def test_bucketed_smb_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    write_bucketed_table(
        orders, "t_smb_o", "o_custkey", 4, str(tmp_path / "o"), sort_by="o_custkey"
    )
    write_bucketed_table(
        cust, "t_smb_c", "c_custkey", 4, str(tmp_path / "c"), sort_by="c_custkey"
    )
    o, c = spark.table("t_smb_o"), spark.table("t_smb_c")
    j = o.join(c.hint("merge"), o["o_custkey"] == c["c_custkey"])
    plan = formatted_plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # both sides read pre-bucketed

    # and it's still the right answer
    n_plain = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).count()
    assert j.count() == n_plain


def test_merge_apply_cdc_full_semantics(spark):
    tgt = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", "U"),  # update present key
            (3, None, "D"),  # delete present key
            (5, "e", "I"),  # insert new key
            (6, "f", "U"),  # U on absent key -> insert (merge-star)
            (1, "a2", "I"),  # I on present key -> replace
        ],
        "k long, v string, op string",
    )
    got = {
        r["k"]: r["v"]
        for r in merge_apply_cdc(tgt, changes, keys=["k"]).collect()
    }
    assert got == {1: "a2", 2: "b2", 4: "d", 5: "e", 6: "f"}


def test_transition_counts_probabilities(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, 1, "a"),
            (2, 1, 2, "b"),
            (3, 1, 3, "a"),
            (4, 1, 4, "b"),
            (5, 2, 1, "a"),
            (6, 2, 2, "a"),
        ],
        "event_id long, user_id long, t long, event_type string",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_seconds(F.col("t")).alias("ts"),
        "event_type",
    )
    rows = {
        (r["from_state"], r["to_state"]): (r["n"], r["p_e6"])
        for r in transition_counts(ev).collect()
    }
    # user1: a->b, b->a, a->b ; user2: a->a
    assert rows[("a", "b")] == (2, 666666)  # 2 of 3 from 'a'
    assert rows[("a", "a")] == (1, 333333)
    assert rows[("b", "a")] == (1, 1000000)
