"""Bloom semi-join pre-filter (operators/bloom_join.py): no false
negatives ever, real pruning on a selective build side, and exact
join-equivalence once the downstream join removes false positives."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from parallel_dbms_spark.catalog import load_table
from parallel_dbms_spark.operators.bloom_join import (
    bloom_build_words,
    bloom_might_contain,
    bloom_semi_filter,
)


def test_no_false_negatives(spark):
    # every key that went INTO the filter must pass it
    keys = spark.range(0, 2000).select((F.col("id") * 7 + 3).alias("k"))
    words = bloom_build_words(keys, "k", m_bits=1 << 14, k=4)
    kept = keys.filter(bloom_might_contain(words, "k", 1 << 14, k=4)).count()
    assert kept == 2000


def test_prunes_non_members(spark):
    # disjoint probe set: tiny FP residue only (m=2^16, n=1000 -> ~1e-5)
    members = spark.range(0, 1000).select(F.col("id").alias("k"))
    probes = spark.range(1_000_000, 1_100_000).select(F.col("id").alias("k"))
    words = bloom_build_words(members, "k")
    survivors = probes.filter(bloom_might_contain(words, "k", 1 << 16)).count()
    assert survivors < 100  # 100k probes, expect ~1 FP at 1e-5


def test_join_equivalence_and_pruning(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select("o_custkey", "o_orderkey")
    dim = (
        load_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    pre = bloom_semi_filter(orders, dim, "o_custkey", "c_custkey")
    n_total, n_pre = orders.count(), pre.count()
    assert n_pre < n_total  # the filter actually cuts the fact side

    plain = orders.join(dim, orders["o_custkey"] == dim["c_custkey"])
    bloomed = pre.join(dim, pre["o_custkey"] == dim["c_custkey"])
    assert sorted(r["o_orderkey"] for r in bloomed.collect()) == sorted(
        r["o_orderkey"] for r in plain.collect()
    )


def test_build_is_bounded_by_m_not_n(spark):
    # 50k keys into a 2^10-bit filter: word list is <= 16 longs no
    # matter the key count (the collect contract)
    keys = spark.range(0, 50_000).select(F.col("id").alias("k"))
    words = bloom_build_words(keys, "k", m_bits=1 << 10, k=2)
    assert len(words) == (1 << 10) // 64
