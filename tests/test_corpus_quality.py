"""Tests for repetition stats, decontamination, and document chunking."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from parallel_dbms_spark.functions.dedup import decontaminate
from parallel_dbms_spark.functions.text import chunk_documents, repetition_stats


def test_repetition_stats_planted(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam"),
            Row(doc_id=2, text="all four tokens differ"),
        ]
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    # doc 1: one token repeated 4x -> every fraction maxes out
    assert got[1].n_tokens == 4
    assert got[1].top_token_frac == 1.0
    assert got[1].top_bigram_frac == 1.0  # "spam spam" x3
    assert got[1].dup_token_frac == 1.0
    # doc 2: all distinct -> no repetition, no duplicate mass
    assert got[2].top_token_frac == 0.25
    assert got[2].top_bigram_frac == 1.0 / 3.0
    assert got[2].dup_token_frac == 0.0


def test_decontaminate_planted_overlap(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="alpha beta gamma delta epsilon zeta eta theta")]
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark's full 8-gram verbatim
            Row(doc_id=1, text="intro alpha beta gamma delta epsilon zeta eta theta outro"),
            # shares 7 tokens but never a full 8-token run
            Row(doc_id=2, text="alpha beta gamma delta epsilon zeta eta DIFFERENT theta"),
            Row(doc_id=3, text="completely unrelated words here padding more tokens now"),
        ]
    )
    got = {r.doc_id: r.n_hits for r in decontaminate(corpus, bench, n=8).collect()}
    assert got == {1: 1}


def test_chunk_documents_shapes(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(f"t{i}" for i in range(10)))]
    )
    chunks = sorted(
        (r.chunk_idx, r.n_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    )
    # stride 2 over 10 tokens -> starts 0,2,4,6,8; last chunk truncated
    assert [c[0] for c in chunks] == [0, 1, 2, 3, 4]
    assert [c[1] for c in chunks] == [4, 4, 4, 4, 2]
    assert chunks[0][2] == "t0 t1 t2 t3"
    assert chunks[4][2] == "t8 t9"
    # consecutive chunks overlap by exactly `overlap` tokens
    assert chunks[0][2].split()[-2:] == chunks[1][2].split()[:2]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    docs = spark.createDataFrame([Row(doc_id=1, text="a b")])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_sentence_udtf_matches_explode(spark):
    from pyspark.sql import functions as F

    from parallel_dbms_spark.functions.text import sentence_udtf

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="First one. Second two. Third"),
            Row(doc_id=2, text="Only sentence"),
        ]
    )
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("split_sentences", sentence_udtf())
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT d.doc_id, s.sent_idx, s.sentence "
                "FROM udtf_docs d, LATERAL split_sentences(d.text) s"
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            docs.select(
                "doc_id",
                F.posexplode(F.split("text", r"\. ")).alias("sent_idx", "sentence"),
            )
            .filter(F.trim("sentence") != "")
            .select("doc_id", "sent_idx", F.trim("sentence").alias("sentence"))
            .collect(),
        )
    )
    assert got == want


def test_weighted_mean_udaf_matches_exact(spark):
    from pyspark.sql import functions as F

    from conftest import SF_SMOKE
    from parallel_dbms_spark.catalog import load_table
    from parallel_dbms_spark.functions.pandas_ops import weighted_mean_by_group

    li = load_table(spark, SF_SMOKE, "lineitem")
    got = {
        r[0]: r.weighted_mean
        for r in weighted_mean_by_group(
            li, "l_returnflag", "l_extendedprice", "l_quantity"
        ).collect()
    }
    exact = {
        r[0]: r.wm
        for r in li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_quantity").cast("decimal(18,2)")
                ).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            ).alias("wm")
        )
        .collect()
    }
    for k in exact:
        assert abs(got[k] - exact[k]) <= 1e-9 * abs(exact[k])


def test_bm25_ranks_planted_relevant_doc_first(spark):
    from parallel_dbms_spark.functions.text import bm25_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark spark join filter"),
            Row(doc_id=2, text="spark appears once in a much longer document "
                               "with many other words diluting its relevance"),
            Row(doc_id=3, text="nothing relevant here at all"),
            Row(doc_id=4, text="join filter"),
        ]
    )
    got = bm25_topk(docs, terms=("spark", "join", "filter"), k=10).collect()
    by_id = {r.doc_id: r for r in got}
    # doc 3 matches no query term -> absent
    assert 3 not in by_id
    # doc 1 hits all three terms with high tf in a short doc -> rank 1
    assert by_id[1].rk == 1 and by_id[1].n_terms == 3
    # ranks are dense, ordered by the quantized score
    ordered = sorted(got, key=lambda r: r.rk)
    scores = [r.score_e6 for r in ordered]
    assert scores == sorted(scores, reverse=True)
    assert [r.rk for r in ordered] == list(range(1, len(got) + 1))
    # length normalization: doc 2's single diluted hit scores below
    # doc 4's two exact hits
    assert by_id[4].score_e6 > by_id[2].score_e6


def test_compression_ratio_separates_repetitive_from_varied(spark):
    from parallel_dbms_spark.functions.text import compression_ratio

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam " * 200),
            Row(doc_id=2, text=" ".join(f"w{i}x{i * 7 % 97}" for i in range(200))),
            Row(doc_id=3, text=""),
        ]
    )
    got = {r.doc_id: r.z_ratio for r in compression_ratio(docs).collect()}
    assert got[1] < 0.1            # pure repetition deflates to almost nothing
    assert got[2] > got[1] * 3     # varied text compresses far less
    assert got[3] == 1.0           # empty doc convention
    # deterministic across partitionings
    again = {r.doc_id: r.z_ratio
             for r in compression_ratio(docs.repartition(3)).collect()}
    assert again == got


def test_bigram_surprisal_semantics_planted(spark):
    # Corpus: the phrase "a b" dominates, so P(b|a) is high and a doc
    # made of it scores LOW avg surprisal; a doc whose bigrams are all
    # unique scores HIGH. Docs under 2 tokens produce no row.
    from parallel_dbms_spark.functions.text import bigram_surprisal

    rows = [
        (1, "a b a b a b a b"),     # the dominant phrase: P(b|a) high
        (2, "a c a d a e a f"),     # same context 'a', rare successors
        (3, "a b a b"),             # more of the phrase
        (4, "solo"),                # 1 token -> no bigrams -> no row
        (5, ""),                    # empty -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_surprisal(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_bigrams"] == 7
    assert out[2]["n_bigrams"] == 7
    # predictable phrase scores lower than rare continuations
    assert out[1]["avg_surprisal_e6"] < out[2]["avg_surprisal_e6"]
    # exactness: c(a)=10 total a-contexts, c(a,b)=6 -> P(b|a)=0.6;
    # (b,a) is b's only successor -> P=1 -> surprisal 0
    import math

    s_ab = math.floor(-math.log(6 / 10) * 1e6)
    assert out[3]["surprisal_e6"] == 2 * s_ab  # (a,b)x2 + (b,a)x1 at 0
