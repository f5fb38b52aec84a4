"""Streaming near-duplicate dedup — MinHash LSH applied per
micro-batch against durable band state.

The batch near-dup pass (functions/dedup.py: signatures -> bands ->
bucket join) assumes it can see the whole corpus at once. A live
ingestion pipeline can't: documents arrive continuously and each must
be admitted or dropped NOW, against everything admitted so far. The
streaming form keeps the LSH *band registry* — (band, bucket) pairs,
a few dozen longs per doc, not the documents — as the running state,
and each micro-batch:

  1. computes the batch docs' band buckets with the SAME
     ``minhash_bands`` the batch path uses (identical bucketing);
  2. drops docs with any band already registered by an earlier batch
     (semi-join against state) or claimed by a lower-id doc within
     this batch (greedy-by-id, the same deterministic order
     ``similarity.semantic_dedup`` uses);
  3. registers ALL arriving docs' bands (kept and dropped — a dropped
     duplicate's bands still witness its cluster, so later members of
     the same near-dup chain are also dropped) and appends the
     survivors to the output, keyed by batch id.

Greedy-vs-everything-earlier gives a well-defined global semantics:
a doc survives iff none of its bands was produced by any lower-id doc
across the whole (id-ordered) stream — which is exactly the batch
reference ``neardup_reference_kept`` below, so stream≡batch is
testable (tests/test_streaming.py).

Exactly-once: the survivor output is batch-id partitioned with
per-batch overwrite (the sinks.py recipe), so a replayed batch
rewrites itself. State appends are at-least-once, but the state is a
SET under semi-join — re-appending the same (band, bucket) rows
changes no decision, so replays are semantically idempotent.

Scale: state grows one (band, bucket) row per band per doc — bounded,
tiny rows, natural key for compaction (sources/lake.py compact_table).
The per-batch work is one signature pass over the batch plus a
semi-join batch-bands ⋈ state; partition state by pmod(bucket, P) on
write and the semi-join prunes (the band registry is the same shape as
a bloom filter, but exact and mergeable).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..functions.dedup import minhash_bands


def _batch_verdict(
    bands_df: DataFrame, state: DataFrame | None
) -> DataFrame:
    """(id, keep) for one batch's band rows against optional state."""
    claims = bands_df.groupBy("band", "bucket").agg(F.min("id").alias("first_id"))
    dup_in_batch = (
        bands_df.join(claims, ["band", "bucket"])
        .filter(F.col("first_id") < F.col("id"))
        .select("id")
    )
    dups = dup_in_batch
    if state is not None:
        dup_in_state = bands_df.join(
            state.select("band", "bucket"), ["band", "bucket"], "leftsemi"
        ).select("id")
        dups = dups.unionByName(dup_in_state)
    return dups.distinct()


def stream_neardup_dedup(
    docs_stream: DataFrame,
    out_path: str,
    state_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    trigger_available_now: bool = True,
    hash_fn: str = "xxhash64",
):
    """Run the streaming near-dup dedup over ``docs_stream``; survivors
    land under ``out_path/batch_id=N/``, the band registry under
    ``state_path``. Returns the finished StreamingQuery.

    ``hash_fn="md5"`` buckets bands by md5 hex string (the
    oracle-replayable mode ``minhash_bands`` already carries — the
    registry state then stores string buckets); xxhash64 stays the
    scale default. The dedup DECISIONS are identical whenever the
    bucketings collide identically — candidacy only needs bucket
    equality."""
    bucket_type = "string" if hash_fn == "md5" else "long"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        bands_df = minhash_bands(
            batch_df, text_col, id_col, num_perm, bands, shingle_n,
            hash_fn=hash_fn,
        ).select("id", "band", "bucket")
        # foreachBatch re-plans per batch; the band rows feed three
        # consumers (claims, dups, registry append) — localCheckpoint
        # computes the signatures once.
        bands_df = bands_df.localCheckpoint(eager=True)
        state = None
        if os.path.exists(os.path.join(state_path, "_SUCCESS")) or any(
            f.endswith(".parquet") for f in _ls(state_path)
        ):
            state = spark.read.schema(
                f"band int, bucket {bucket_type}"
            ).parquet(state_path)
        drop_ids = _batch_verdict(bands_df, state)
        kept = batch_df.join(
            drop_ids, batch_df[id_col] == drop_ids["id"], "left_anti"
        )
        kept.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")
        (
            bands_df.select("band", "bucket")
            .dropDuplicates()
            .write.mode("append")
            .parquet(state_path)
        )

    w = (
        docs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    q = w.start()
    q.awaitTermination()
    return q


def _ls(path: str) -> list[str]:
    try:
        return os.listdir(path)
    except FileNotFoundError:
        return []


def neardup_reference_kept(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Batch reference for the streaming semantics: a doc survives iff
    none of its band buckets is claimed by a lower-id doc anywhere in
    the corpus. With id-ordered arrival this is exactly what the
    streaming pass computes — the stream≡batch oracle."""
    bands_df = minhash_bands(
        docs, text_col, id_col, num_perm, bands, shingle_n,
        hash_fn=hash_fn,
    )
    claims = bands_df.groupBy("band", "bucket").agg(F.min("id").alias("first_id"))
    dup = (
        bands_df.join(claims, ["band", "bucket"])
        .filter(F.col("first_id") < F.col("id"))
        .select("id")
        .distinct()
    )
    return docs.join(dup, docs[id_col] == dup["id"], "left_anti")
