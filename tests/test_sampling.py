"""Sampling + sharding: determinism, stratification, shard contract."""

from __future__ import annotations

import glob

import pytest
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


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from parallel_dbms_spark.functions.sampling import (
        weighted_sample_k_per_group,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", F.length("text").alias("w")
    )
    a = weighted_sample_k_per_group(docs, "lang", "doc_id", "w", k=10)
    b = weighted_sample_k_per_group(docs, "lang", "doc_id", "w", k=10)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    # per-group quota respected
    counts = a.groupBy("lang").count().collect()
    assert all(r["count"] <= 10 for r in counts)
    # a different salt draws a different sample
    c = weighted_sample_k_per_group(docs, "lang", "doc_id", "w", k=10, salt="w1")
    assert sorted(r["doc_id"] for r in c.collect()) != sorted(
        r["doc_id"] for r in a.collect()
    )


def test_weighted_sample_zero_weight_never_beats_positive(spark):
    from parallel_dbms_spark.functions.sampling import (
        weighted_sample_k_per_group,
    )

    rows = [(i, "g", 1.0 if i < 5 else 0.0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    got = weighted_sample_k_per_group(df, "g", "doc_id", "w", k=5)
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1, 2, 3, 4]


def test_quantile_buckets_close_to_exact_ntile(spark):
    from parallel_dbms_spark.operators import ntile_distributed
    from parallel_dbms_spark.operators.relational import bucket_by_quantiles

    o = load_table(spark, SF_SMOKE, "orders").select("o_totalprice", "o_orderkey")
    n = o.count()
    approx = bucket_by_quantiles(o, "o_totalprice", n_buckets=10)
    counts = {
        r["bucket"]: r["count"]
        for r in approx.groupBy("bucket").count().collect()
    }
    # all 10 buckets present, populations within 20% of n/10 at this SF
    assert set(counts) == set(range(1, 11))
    assert sum(counts.values()) == n
    for c in counts.values():
        assert abs(c - n / 10) < 0.2 * n / 10, counts
    # value-ordering: max of bucket i <= min of bucket i+1
    stats = {
        r["bucket"]: (r["lo"], r["hi"])
        for r in approx.groupBy("bucket")
        .agg(
            F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
        )
        .collect()
    }
    for i in range(1, 10):
        assert stats[i][1] <= stats[i + 1][0]


def test_weighted_sample_sps_md5_mode(spark):
    """The oracle-replayable SPS mode: deterministic, partition-
    invariant, weight-sensitive, zero-weight-excluding — the same laws
    as ES, plus cross-engine replay (graded by the registry oracle in
    test_correctness; here we pin the Spark-side laws)."""
    from parallel_dbms_spark.functions.sampling import (
        weighted_sample_k_per_group,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", F.length("text").alias("w")
    )
    a = weighted_sample_k_per_group(
        docs, "lang", "doc_id", "w", k=10, mode="sps_md5"
    )
    picked = sorted(r["doc_id"] for r in a.collect())
    # partition-invariant: the draw is a pure function of the row
    b = weighted_sample_k_per_group(
        docs.repartition(17), "lang", "doc_id", "w", k=10, mode="sps_md5"
    )
    assert sorted(r["doc_id"] for r in b.collect()) == picked
    # independent of the ES draw (different key construction)
    es = weighted_sample_k_per_group(docs, "lang", "doc_id", "w", k=10)
    assert sorted(r["doc_id"] for r in es.collect()) != picked
    # zero-weight rows are excluded, never padded in
    rows = [(i, "g", 1.0 if i < 3 else 0.0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    got = weighted_sample_k_per_group(
        df, "g", "doc_id", "w", k=5, mode="sps_md5"
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1, 2]


def test_weighted_sample_sps_weight_monotone(spark):
    """Inclusion odds rise with weight: in a pool where half the rows
    weigh 10x the rest, the heavy half must dominate the sample (SPS
    key = u/w, so 10x weight divides the key by 10)."""
    from parallel_dbms_spark.functions.sampling import (
        weighted_sample_k_per_group,
    )

    rows = [(i, "g", 10.0 if i % 2 == 0 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    got = weighted_sample_k_per_group(
        df, "g", "doc_id", "w", k=40, mode="sps_md5"
    ).collect()
    heavy = sum(1 for r in got if r["doc_id"] % 2 == 0)
    assert heavy > 28, heavy  # E[heavy] ~ 36 of 40; 28 is ~5 sigma slack


def test_weighted_sample_unknown_mode_raises(spark):
    from parallel_dbms_spark.functions.sampling import (
        weighted_sample_k_per_group,
    )

    df = spark.createDataFrame([(1, "g", 1.0)], "doc_id long, g string, w double")
    with pytest.raises(ValueError, match="mode"):
        weighted_sample_k_per_group(df, "g", "doc_id", "w", k=1, mode="nope")


def test_weighted_sample_never_pads_with_zero_weight_rows(spark):
    from parallel_dbms_spark.functions.sampling import (
        weighted_sample_k_per_group,
    )

    rows = [(i, "g", 1.0 if i < 3 else 0.0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    got = weighted_sample_k_per_group(df, "g", "doc_id", "w", k=5)
    # only the 3 positive-weight rows qualify — no zero-weight filler
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1, 2]


def test_mix_corpus_fraction_one_keeps_entire_stratum(spark):
    from parallel_dbms_spark.functions.sampling import mix_corpus

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source"
    )
    n_src0 = docs.filter("source = 'src0'").count()
    mixed = mix_corpus(docs, {"src0": 1.0})
    assert mixed.count() == n_src0  # no 1-in-65536 'ffff' dropout


def test_grouped_quantile_buckets_are_per_group(spark):
    from parallel_dbms_spark.operators.relational import (
        bucket_by_quantiles_grouped,
    )

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    b = bucket_by_quantiles_grouped(
        o, "o_totalprice", "o_orderpriority", n_buckets=4
    )
    counts = (
        b.groupBy("o_orderpriority", "bucket").count().collect()
    )
    per_group = {}
    for r in counts:
        per_group.setdefault(r["o_orderpriority"], {})[r["bucket"]] = r["count"]
    for grp, buckets in per_group.items():
        n = sum(buckets.values())
        assert set(buckets) == {1, 2, 3, 4}, (grp, buckets)
        for c in buckets.values():
            assert abs(c - n / 4) < 0.25 * n / 4 + 2, (grp, buckets)


def test_negative_samples_invariants(spark):
    from pyspark.sql import functions as F

    from parallel_dbms_spark.functions.sampling import negative_samples

    df = spark.range(0, 200).select(F.col("id").alias("vec_id"))
    out = negative_samples(df, k=4, salt=7)
    rows = out.collect()
    assert len(rows) == 800  # k per anchor
    assert all(r.neg_id != r.anchor_id for r in rows)  # never self
    assert all(0 <= r.neg_id < 200 for r in rows)  # stays in id space
    # pure function of (id, j): identical under any partitioning
    again = sorted(map(tuple, negative_samples(df.repartition(9), k=4, salt=7).collect()))
    assert sorted(map(tuple, rows)) == again
    # a different salt draws a different (still valid) sample
    other = negative_samples(df, k=4, salt=8)
    assert sorted(map(tuple, other.collect())) != sorted(map(tuple, rows))


def test_pipeline_pretrain_mix_invariants(spark):
    from conftest import SF_SMOKE
    from parallel_dbms_spark.queries import REGISTRY

    out = REGISTRY["pipeline_pretrain_mix"].fn(spark, SF_SMOKE).collect()
    assert out, "pipeline should keep a nonempty corpus"
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids))  # dedup stage: no doc twice
    # packing: no bin exceeds the budget within (source, bin)
    bins = {}
    for r in out:
        bins.setdefault((r.source, r.bin_id), 0)
        bins[(r.source, r.bin_id)] += r.n_tokens
    oversized = {k: v for k, v in bins.items() if v > 512}
    # a single doc longer than the budget gets its own bin; only
    # multi-doc bins must respect it
    from collections import Counter

    per_bin = Counter((r.source, r.bin_id) for r in out)
    for k in oversized:
        assert per_bin[k] == 1
    # odd sources are downsampled to ~50%: strictly fewer docs kept
    # than evens on this corpus
    n_even = sum(1 for r in out if int(r.source[3:]) % 2 == 0)
    n_odd = sum(1 for r in out if int(r.source[3:]) % 2 == 1)
    assert n_odd < n_even
    # determinism under re-invocation
    again = REGISTRY["pipeline_pretrain_mix"].fn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_mix_corpus_token_budget_invariants(spark):
    from pyspark.sql import functions as F

    from parallel_dbms_spark.catalog import load_table
    from parallel_dbms_spark.functions.sampling import mix_corpus_token_budget

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = mix_corpus_token_budget(
        docs, default_budget=300, overrides={"src0": 100}
    ).cache()
    rows = out.collect()
    assert rows, "empty mix"
    # per-source: total tokens may exceed budget only by the boundary
    # doc; tokens-before-last-doc must be under budget
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r["n_tok"])
    for src, toks in per_src.items():
        budget = 100 if src == "src0" else 300
        assert sum(toks) - max(toks) < budget, src
    # deterministic: same call -> same rows; different salt -> different draw
    again = mix_corpus_token_budget(
        docs, default_budget=300, overrides={"src0": 100}
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    other = mix_corpus_token_budget(
        docs, default_budget=300, overrides={"src0": 100}, salt="other"
    )
    assert sorted(r["doc_id"] for r in rows) != sorted(
        r["doc_id"] for r in other.collect()
    )
    # partition invariance
    reparted = mix_corpus_token_budget(
        docs.repartition(13), default_budget=300, overrides={"src0": 100}
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, reparted.collect()))
    out.unpersist()
