"""The reference's typed-header CSV dialect (README.md:133-149):
header parsing, both timestamp formats, NULL handling (an upgrade over
the reference, which throws/skips), primary-key metadata, and a
write->read roundtrip."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from parallel_dbms_spark.sources import read_typed_csv, write_typed_csv
from parallel_dbms_spark.sources.typed_csv import parse_typed_header

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "SampleTest", "data")


def test_parse_typed_header():
    cols = parse_typed_header("Id (N) (P),Name (T),When (D)\n")
    assert cols == [("Id", "N", True), ("Name", "T", False), ("When", "D", False)]


def test_read_employees(spark):
    df = read_typed_csv(spark, os.path.join(FIX, "Employees.csv"))
    assert [f.name for f in df.schema.fields] == ["Employees_id", "Name", "Salary", "JoinedDate"]
    assert isinstance(df.schema["Salary"].dataType, T.DoubleType)
    assert isinstance(df.schema["JoinedDate"].dataType, T.TimestampType)
    assert df.schema["Employees_id"].metadata.get("primary_key") is True
    assert df.count() == 5


def test_read_both_timestamp_formats(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("Id (N),D1 (D)\n1,2021-01-02\n2,2021-01-02 03:04:05\n3,\n")
    df = read_typed_csv(spark, str(p))
    rows = {r.Id: r.D1 for r in df.collect()}
    assert rows[1.0].day == 2 and rows[1.0].hour == 0
    assert rows[2.0].hour == 3
    assert rows[3.0] is None  # NULL, not a crash (reference throws)


def test_roundtrip(spark, tmp_path):
    df = read_typed_csv(spark, os.path.join(FIX, "Products.csv"))
    out = str(tmp_path / "out")
    write_typed_csv(df.coalesce(1), out)
    back = read_typed_csv(spark, out + "/*.csv")
    orig = sorted(map(tuple, df.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == orig


def test_quarantined_read_splits_good_and_bad(spark, tmp_path):
    from parallel_dbms_spark.sources.typed_csv import read_typed_csv_quarantined

    p = tmp_path / "dirty.csv"
    p.write_text(
        "Id (N) (P),Name (T),Joined (D)\n"
        "1,alice,2020-01-02\n"
        "2,bob,2020-01-03 04:05:06\n"
        "not_a_number,carol,2020-01-04\n"      # bad N cell
        "4,dave,not_a_date\n"                  # bad D cell
        "5,,\n"                                # empty cells are NULL, not bad
    )
    good, bad = read_typed_csv_quarantined(spark, str(p))
    assert good.count() == 3
    assert bad.count() == 2
    assert dict(good.dtypes) == {"Id": "double", "Name": "string", "Joined": "timestamp"}
    # bad rows keep raw strings for repair
    bad_ids = {r.Id for r in bad.collect()}
    assert bad_ids == {"not_a_number", "4"}
    # the NULL-celled row is good, with real NULLs
    row5 = good.filter("Id = 5").collect()[0]
    assert row5.Name is None and row5.Joined is None


def test_python_datasource_matches_fast_path(spark):
    from parallel_dbms_spark.sources.typed_csv import read_typed_csv
    from parallel_dbms_spark.sources.typed_csv_ds import register_typed_csv

    register_typed_csv(spark)
    for fname in sorted(os.listdir(FIX)):
        if not fname.endswith(".csv"):
            continue
        path = os.path.join(FIX, fname)
        ds = spark.read.format("typed_csv").load(path)
        fast = read_typed_csv(spark, path)
        assert ds.schema == fast.schema, fname
        a = sorted(map(tuple, ds.collect()))
        b = sorted(map(tuple, fast.collect()))
        assert a == b, f"datasource != fast path for {fname}"


def test_python_datasource_matches_fast_path_on_dirty_input(spark, tmp_path):
    # Malformed N/D cells must yield NULL in BOTH paths (the fast
    # path's PERMISSIVE mode and the DataSource's per-cell try/except)
    # — one bad cell never fails the job; fractional seconds parse.
    from parallel_dbms_spark.sources.typed_csv import read_typed_csv
    from parallel_dbms_spark.sources.typed_csv_ds import register_typed_csv

    p = tmp_path / "dirty.csv"
    p.write_text(
        "Id (N),Name (T),When (D)\n"
        "1,ok,2021-01-02 03:04:05\n"
        "oops,bad-number,2021-01-02\n"
        "3,frac,2021-01-02 03:04:05.250000\n"
        "4,bad-date,not-a-date\n"
        "5,,\n"
    )
    register_typed_csv(spark)
    ds = spark.read.format("typed_csv").load(str(p))
    fast = read_typed_csv(spark, str(p))
    a = sorted(map(tuple, ds.collect()), key=str)
    b = sorted(map(tuple, fast.collect()), key=str)
    assert a == b
    byname = {r.Name: r for r in ds.collect()}
    assert byname["bad-number"].Id is None
    assert byname["bad-date"].When is None
    assert byname["frac"].When.microsecond == 250000


def test_python_datasource_streams_typed_csv_incrementally(spark, tmp_path):
    # The streaming face of the dialect: tail a landing directory; a
    # checkpointed restart consumes ONLY newly landed files, and the
    # accumulated stream output equals a batch read of the same files.
    from parallel_dbms_spark.sources.typed_csv import read_typed_csv
    from parallel_dbms_spark.sources.typed_csv_ds import register_typed_csv

    land = tmp_path / "landing"
    land.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    header = "Id (N),Name (T),When (D)\n"
    (land / "batch-000.csv").write_text(
        header + "1,a,2021-01-01\n2,b,2021-01-02 03:00:00\n"
    )
    register_typed_csv(spark)

    def run():
        feed = spark.readStream.format("typed_csv").load(str(land))
        q = (
            feed.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    got1 = sorted(map(tuple, spark.read.parquet(out).collect()), key=str)
    want1 = sorted(map(tuple, read_typed_csv(spark, str(land)).collect()), key=str)
    assert got1 == want1 and len(got1) == 2

    # a second landing file, incl. a malformed numeric cell -> NULL
    (land / "batch-001.csv").write_text(header + "3,c,2021-01-03\nbad,d,\n")
    run()
    got2 = sorted(map(tuple, spark.read.parquet(out).collect()), key=str)
    want2 = sorted(map(tuple, read_typed_csv(spark, str(land)).collect()), key=str)
    assert got2 == want2 and len(got2) == 4
    assert any(r[0] is None and r[1] == "d" for r in got2)

    # restart with nothing new: no new rows
    run()
    assert spark.read.parquet(out).count() == 4


def test_datasource_batch_writer_roundtrip(spark, tmp_path):
    import glob as _glob

    from pyspark.sql import functions as F

    from parallel_dbms_spark.sources.typed_csv import read_typed_csv
    from parallel_dbms_spark.sources.typed_csv_ds import register_typed_csv

    register_typed_csv(spark)
    df = (
        spark.range(50)
        .select(
            F.col("id").cast("double").alias("amount"),
            F.concat(F.lit("name_"), F.col("id")).alias("label"),
            F.timestamp_seconds(F.col("id") * 3600).alias("when"),
        )
        .withColumn(
            "amount",
            F.when(F.col("amount") % 7 == 0, None).otherwise(F.col("amount")),
        )
    )
    out = str(tmp_path / "sink")
    df.repartition(3).write.format("typed_csv").mode("overwrite").save(out)
    files = sorted(_glob.glob(out + "/part-*.csv"))
    assert len(files) == 3
    header = open(files[0], encoding="utf-8").readline().strip()
    assert header == "amount (N),label (T),when (D)"
    # read back through BOTH read paths; values must match the source
    back_ds = spark.read.format("typed_csv").load(out)
    back_fast = read_typed_csv(spark, out + "/part-*.csv")
    want = sorted(map(tuple, df.collect()), key=repr)
    assert sorted(map(tuple, back_ds.collect()), key=repr) == want
    assert sorted(map(tuple, back_fast.collect()), key=repr) == want

    # overwrite replaces, never appends
    df.limit(5).repartition(1).write.format("typed_csv").mode("overwrite").save(out)
    assert spark.read.format("typed_csv").load(out).count() == 5


def test_datasource_stream_writer_lands_batch_keyed_files(spark, tmp_path):
    import glob as _glob

    from pyspark.sql import functions as F

    from parallel_dbms_spark.sources.typed_csv import read_typed_csv
    from parallel_dbms_spark.sources.typed_csv_ds import register_typed_csv

    register_typed_csv(spark)
    # landing dir with two parquet files -> two micro-batches
    src_dir = str(tmp_path / "landing")
    base = spark.range(40).select(
        F.col("id").cast("double").alias("v"),
        F.concat(F.lit("u"), F.col("id") % 5).alias("u"),
    )
    base.filter("v < 20").coalesce(1).write.mode("append").parquet(src_dir)
    base.filter("v >= 20").coalesce(1).write.mode("append").parquet(src_dir)

    out = str(tmp_path / "csv_sink")
    q = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.format("typed_csv")
        .option("path", out)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    files = sorted(_glob.glob(out + "/part-b*.csv"))
    assert files, "stream writer produced no files"
    batches = {f.rsplit("/part-b", 1)[1].split("-")[0] for f in files}
    assert len(batches) == 2, f"expected 2 micro-batches, got {batches}"
    back = read_typed_csv(spark, out + "/part-*.csv")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, base.collect()))


def test_stream_writer_replay_sweeps_orphan_partitions(spark, tmp_path):
    """Exactly-once replay contract: a replayed micro-batch that lands
    FEWER partitions than the failed first attempt must sweep the
    extra attempt-1 files, not leave them duplicating rows."""
    import os

    from pyspark.sql import types as T

    from parallel_dbms_spark.sources.typed_csv_ds import (
        TypedCSVStreamWriter,
        _FileCommit,
    )

    out = str(tmp_path / "replayed")
    os.makedirs(out)
    schema = T.StructType([T.StructField("x", T.LongType())])
    w = TypedCSVStreamWriter({"path": out}, schema)
    # attempt 1 landed two partitions for batch 3
    for pid in (0, 1):
        open(os.path.join(out, f"part-b{3:08d}-p{pid:05d}.csv"), "w").write(
            f"x (N)\n{pid}\n"
        )
    # replay commits only ONE partition
    tmp = os.path.join(out, "_tmp-replay")
    open(tmp, "w").write("x (N)\n42\n")
    w.commit([_FileCommit(tmp_path=tmp, final_path="00000")], batchId=3)
    left = sorted(os.listdir(out))
    assert left == ["part-b00000003-p00000.csv"], left
    assert "42" in open(os.path.join(out, left[0])).read()
    # other batches' files are untouched
    open(os.path.join(out, "part-b00000004-p00000.csv"), "w").write("x (N)\n7\n")
    w.commit([], batchId=5)
    assert "part-b00000004-p00000.csv" in os.listdir(out)
