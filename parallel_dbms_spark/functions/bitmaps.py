"""Exact distinct counting via mergeable bitmap indexes.

The reference answers ``COUNT(DISTINCT ...)`` by a full re-shuffle of
the raw values every time the question is asked (its aggregates are
one-shot kernels over the scanned column — src/operators/aggregate.h).
At 100 TB that re-shuffle is the whole job, and it buys nothing
reusable: next week's "weekly uniques" re-reads last week's days.

The warehouse-native fix (Druid/ClickHouse segment bitmaps, Spark 3.5's
``bitmap_*`` builtins) is to aggregate each fine-grained cell ONCE into
a bitmap of the ids seen, then answer every coarser rollup by OR-ing
bitmaps — an exact, associative, re-aggregatable summary:

  raw -> (cell key, bucket, bitmap)   one shuffle, ever
  coarser rollup -> OR-merge bitmaps  shuffles bitmaps (<=4 KB each),
                                      never the raw ids again
  count -> sum over buckets of bitmap_count

Spark's bitmap model: each bitmap covers one 32768-id "bucket"
(``bitmap_bucket_number``), the id's offset within it is
``bitmap_bit_position``; a distinct count is the SUM over buckets of
per-bucket popcounts, which is exact because buckets partition the id
space. All three stages are JVM codegen aggregates — no UDFs, no
approximation, and daily bitmaps persist as ordinary binary parquet
columns for incremental week/month/quarter rollups.

The bucket layout covers the FULL signed int64 range (negative ids get
their own buckets: 0 holds -32768..0, -1 the next block down, ...), so
exactness holds for any integer id — asserted across bucket boundaries
and signed ranges in tests/test_operators_extra.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

BUCKET = "__bm_bucket"
BITMAP = "__bm_bits"


def build_bitmaps(
    df: DataFrame, keys: Sequence[str], id_col: str
) -> DataFrame:
    """One bitmap row per (keys..., bucket): the distinct ``id_col``
    values seen in that cell, as a 4 KB bitset.

    This is the ONLY pass that shuffles raw data, and it benefits from
    map-side partial aggregation (bitmaps OR locally before the
    exchange). Output is tiny: |cells| x |occupied buckets| rows.
    """
    return (
        df.select(
            *keys,
            F.bitmap_bucket_number(F.col(id_col)).alias(BUCKET),
            F.bitmap_bit_position(F.col(id_col)).alias(BITMAP + "_pos"),
        )
        .groupBy(*keys, BUCKET)
        .agg(F.bitmap_construct_agg(F.col(BITMAP + "_pos")).alias(BITMAP))
    )


def merge_bitmaps(bitmaps: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Re-aggregate fine-grained bitmaps to coarser ``keys`` by OR.

    Exact by construction: OR of per-cell bitsets is the bitset of the
    union, per bucket. The shuffle moves bitmaps, not ids — at
    100 TB / 1e9 uniques that is ~122 MB of bitset per cell ceiling
    versus re-shuffling every raw event row.
    """
    return bitmaps.groupBy(*keys, BUCKET).agg(
        F.bitmap_or_agg(F.col(BITMAP)).alias(BITMAP)
    )


def count_distinct(bitmaps: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Exact distinct count per ``keys`` from (already-merged) bitmaps:
    popcount each bucket, sum buckets. Column: ``n_distinct``."""
    return (
        bitmaps.select(*keys, F.bitmap_count(F.col(BITMAP)).alias("__c"))
        .groupBy(*keys)
        .agg(F.sum("__c").alias("n_distinct"))
    )


def rollup_distinct(
    df: DataFrame,
    fine_keys: Sequence[str],
    coarse_keys: Sequence[str],
    id_col: str,
) -> DataFrame:
    """End-to-end: build bitmaps at ``fine_keys`` grain, OR-merge to
    ``coarse_keys``, return exact ``n_distinct`` per coarse cell.

    Equivalent to ``df.groupBy(coarse_keys).agg(countDistinct(id))``
    but the fine-grained bitmaps are the reusable artifact — persist
    them once and every coarser question is a bitmap merge.
    """
    fine = build_bitmaps(df, fine_keys, id_col)
    return count_distinct(merge_bitmaps(fine, coarse_keys), coarse_keys)
