"""Sampling + sharding: determinism, stratification, shard contract."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from parallel_dbms_spark.catalog import load_table
from parallel_dbms_spark.functions.sampling import (
    deterministic_sample,
    stratified_sample,
    write_training_shards,
)


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_deterministic_sample_partition_invariant(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in deterministic_sample(docs, 0.2).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(13), 0.2).select("doc_id").collect()
    }
    assert a == b
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n  # ~20%, loose band for 500 docs


def test_deterministic_sample_salts_are_independent(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in deterministic_sample(docs, 0.5, salt="s0").collect()}
    b = {r.doc_id for r in deterministic_sample(docs, 0.5, salt="s1").collect()}
    assert a != b
    # nested property: frac=0.2 sample is a subset of frac=0.5 (same salt)
    small = {r.doc_id for r in deterministic_sample(docs, 0.2, salt="s0").collect()}
    assert small <= a


def test_stratified_sample_respects_fractions(spark):
    docs = _docs(spark)
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep, drop = langs[0], langs[1:]
    out = stratified_sample(docs, "lang", {keep: 1.0}, seed=1)
    got_langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert got_langs == {keep}  # absent strata dropped
    assert out.count() == docs.filter(F.col("lang") == keep).count()  # frac 1.0 exact


def test_write_training_shards_contract(spark, tmp_path):
    docs = _docs(spark).select("doc_id", "source", "n_chars")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=4, sort_col="doc_id")
    files = glob.glob(path + "/part-*.parquet")
    assert len(files) == 4
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    for f in files:  # per-shard sortedness
        ids = [r.doc_id for r in spark.read.parquet(f).collect()]
        assert ids == sorted(ids)


def test_train_val_test_split_disjoint_exhaustive_and_stable(spark):
    from parallel_dbms_spark.functions.sampling import train_val_test_split

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = train_val_test_split(docs).collect()
    labels = {r.doc_id: r.split for r in s1}
    # exhaustive: every row labeled with one of the three classes
    assert len(labels) == 2000
    assert set(labels.values()) == {"train", "val", "test"}
    # proportions near 80/10/10
    from collections import Counter

    c = Counter(labels.values())
    assert 0.75 < c["train"] / 2000 < 0.85
    assert 0.06 < c["val"] / 2000 < 0.14
    # partition-invariant: a different partitioning yields identical labels
    s2 = train_val_test_split(docs.repartition(13)).collect()
    assert {r.doc_id: r.split for r in s2} == labels
    # a different salt draws an independent assignment
    s3 = train_val_test_split(docs, salt="other").collect()
    assert {r.doc_id: r.split for r in s3} != labels
