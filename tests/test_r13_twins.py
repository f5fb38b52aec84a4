"""Round-13 pinned-twin semantics: each exact twin must reproduce the
qualitative behavior of its float serving default on hand-built
fixtures (the value-hash grading vs DuckDB lives in the registry; these
pin the ALGORITHMIC behavior on inputs the fixtures don't cover)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_mmr_topk_exact_prefers_diverse(spark):
    # q = e0; docs: two near-identical high-relevance vectors (1, 2)
    # and one orthogonal-ish lower-relevance vector (3). Pure
    # relevance ranks (1, 2, 3); MMR with lambda=1/2 must pick the
    # diverse 3 before the redundant 2.
    from parallel_dbms_spark.functions.similarity import mmr_topk_exact

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),
        (2, [0.98, 0.12, 0.0]),
        (3, [0.5, 0.0, 0.8]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = emb.filter(F.col("vec_id") == 0)
    out = mmr_topk_exact(emb, queries, k=3, shortlist=3)
    got = {
        r["rank"]: r["neighbor_id"]
        for r in out.filter("query_id = 0").collect()
    }
    assert got[1] == 1  # most relevant first (zero redundancy term)
    assert got[2] == 3  # diverse beats redundant
    assert got[3] == 2


def test_pagerank_exact_ranks_star_hub_highest(spark):
    from parallel_dbms_spark.functions.graph import pagerank_exact

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    out = {r["id"]: r["rank_e12"] for r in pagerank_exact(edges).collect()}
    assert out[0] > max(v for k, v in out.items() if k != 0)
    # leaves are symmetric -> identical integer ranks
    assert len({v for k, v in out.items() if k != 0}) == 1


def test_semantic_dedup_exact_drops_planted_dup(spark):
    from parallel_dbms_spark.functions.similarity import semantic_dedup_exact

    rows = [(i, [float(i % 7 + 1), float((3 * i) % 5 + 1), 1.0])
            for i in range(40)]
    rows.append((100, rows[5][1]))  # exact duplicate of id 5, higher id
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = {r["id"]: r for r in semantic_dedup_exact(emb, nlist=4).collect()}
    assert len(out) == 41  # every row classified
    assert not out[100]["keep"], "higher-id exact duplicate must drop"
    assert out[100]["max_cos_e6"] >= 999_999
    assert out[5]["cell"] == out[100]["cell"]


def test_power_iteration_pc1_exact_finds_dominant_axis(spark):
    from parallel_dbms_spark.functions.similarity import (
        power_iteration_pc1_exact,
    )

    # cloud stretched 10x along axis 0: PC1 must load axis 0 maximally
    rows = [
        (i, [10.0 * ((i % 5) - 2), 1.0 * ((i % 3) - 1), 0.5 * ((i % 2))])
        for i in range(30)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    x = power_iteration_pc1_exact(emb, iters=6)
    assert abs(x[0]) == 10_000  # renormalized max component
    assert abs(x[1]) < 5_000 and abs(x[2]) < 5_000


def test_image_pooled_intensity_hand_ppm(spark):
    from parallel_dbms_spark.functions.multimodal import (
        encode_ppm, image_pooled_intensity,
    )
    import numpy as np

    # 2x2 RGB image with known channel sums per pixel
    img = np.array(
        [[[10, 20, 30], [1, 2, 3]], [[0, 0, 0], [255, 255, 255]]],
        dtype=np.uint8,
    )
    payload = encode_ppm(img)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    out = {
        r["pos"]: (r["s3_sum"], r["n_px"])
        for r in image_pooled_intensity(df, dim=2).collect()
    }
    # pixel order row-major: sums 60, 6 | 0, 765; dim=2 buckets of 2
    assert out == {0: (66, 2), 1: (765, 2)}


def test_stream_neardup_md5_mode_matches_reference(spark, tmp_path):
    import os

    from parallel_dbms_spark.streaming.dedup import (
        neardup_reference_kept, stream_neardup_dedup,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # dup of 1
        (3, "totally different words here now ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "feed")
    docs.coalesce(1).write.parquet(src)
    feed = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    stream_neardup_dedup(
        feed,
        str(tmp_path / "kept"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        hash_fn="md5",
    )
    kept = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "kept")).collect()
    )
    ref = sorted(
        r["doc_id"]
        for r in neardup_reference_kept(docs, hash_fn="md5").collect()
    )
    assert kept == ref == [1, 3]
    # md5 mode registers STRING buckets
    state = spark.read.parquet(str(tmp_path / "state"))
    assert dict(state.dtypes)["bucket"] == "string"
