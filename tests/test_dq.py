"""Data-quality expectations (operators/dq.py): every rule type on a
frame with planted violations, plus the all-green path."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from parallel_dbms_spark.operators.dq import check_expectations


def _frame(spark):
    return spark.createDataFrame(
        [
            Row(id=1, status="O", price=10.0, email="a@x.com"),
            Row(id=2, status="F", price=-5.0, email="b@x.com"),   # price < 0
            Row(id=2, status="O", price=20.0, email="bad"),       # dup id, bad email
            Row(id=None, status="Z", price=30.0, email="c@x.com"), # null id, bad status
            Row(id=4, status="O", price=None, email=None),        # nulls not range/regex violations
        ]
    )


def test_every_rule_type_counts_planted_violations(spark):
    df = _frame(spark)
    dim = spark.createDataFrame([Row(k=1), Row(k=2)])
    out = {r.rule: (r.n_violations, r.n_rows, r.passed) for r in
           check_expectations(df, [
               {"type": "not_null", "col": "id"},
               {"type": "in_range", "col": "price", "lo": 0.0},
               {"type": "in_set", "col": "status", "values": ["O", "F", "P"]},
               {"type": "regex", "col": "email", "pattern": r"^[^@]+@[^@]+$"},
               {"type": "predicate", "expr": "price IS NULL OR price < 100"},
               {"type": "unique", "cols": ["id"]},
               {"type": "ref_integrity", "col": "id", "ref": dim, "ref_col": "k"},
           ]).collect()}
    assert out["not_null(id)"] == (1, 5, False)
    assert out["in_range(price)"] == (1, 5, False)      # NULL price not a violation
    assert out["in_set(status)"] == (1, 5, False)
    assert out["regex(email)"] == (1, 5, False)         # NULL email not a violation
    assert out["predicate(price IS NULL OR price < 100)"] == (0, 5, True)
    assert out["unique(id)"] == (2, 5, False)           # both rows of the dup pair
    assert out["ref_integrity(id)"] == (1, 5, False)    # id=4 orphan; NULL exempt


def test_clean_frame_passes_everything(spark):
    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(10)])
    out = check_expectations(df, [
        {"type": "not_null", "col": "id"},
        {"type": "unique", "cols": ["id"]},
        {"type": "in_range", "col": "v", "lo": 0.0, "hi": 9.0},
    ])
    assert out.filter(~F.col("passed")).count() == 0
    assert out.count() == 3


def test_unknown_rule_raises(spark):
    import pytest as _pytest

    df = spark.range(1)
    with _pytest.raises(ValueError, match="unknown expectation"):
        check_expectations(df, [{"type": "nope", "col": "id"}])


def test_k_anonymity_counts_reidentifiable_rows(spark):
    df = spark.createDataFrame(
        [Row(zip="100", age=30)] * 5
        + [Row(zip="200", age=40)] * 2
        + [Row(zip="300", age=50)]  # singleton: re-identifiable
    )
    out = {r.rule: (r.n_violations, r.passed) for r in check_expectations(
        df, [{"type": "k_anonymity", "cols": ["zip", "age"], "k": 3}]
    ).collect()}
    # groups of size 2 and 1 violate k=3 -> 3 rows re-identifiable
    assert out["k_anonymity(zip,age,k=3)"] == (3, False)
    ok = check_expectations(
        df, [{"type": "k_anonymity", "cols": ["zip", "age"], "k": 1}]
    ).head()
    assert ok.passed and ok.n_violations == 0


def test_table_checksum_layout_invariant_and_mutation_sensitive(spark):
    from parallel_dbms_spark.operators.dq import table_checksum

    df = spark.range(0, 5000).withColumn("v", F.col("id") * 3)
    base = table_checksum(df).head()
    # layout-invariant: repartition/order changes nothing
    assert table_checksum(df.repartition(13)).head() == base
    assert table_checksum(df.orderBy(F.desc("id"))).head() == base
    # mutation-sensitive: one changed value, one dropped row, one dup
    mut = df.withColumn("v", F.when(F.col("id") == 42, 0).otherwise(F.col("v")))
    assert table_checksum(mut).head().checksum != base.checksum
    assert table_checksum(df.filter("id <> 7")).head().checksum != base.checksum
    dup = df.unionAll(df.filter("id = 9"))
    assert table_checksum(dup).head().checksum != base.checksum
    # column subset checks just that projection
    sub = table_checksum(df, ["id"]).head()
    assert sub.checksum != base.checksum and sub.n_rows == base.n_rows
