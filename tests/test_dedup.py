"""Dedup-operator quality tests on planted fixtures: exact dedup finds
exact copies, MinHash-LSH and SimHash find near-duplicates and their
estimates track exact jaccard, and the jaccard df-cap only ever drops
pairs (never invents them)."""

from __future__ import annotations
import pytest

import random

from pyspark.sql import Row, functions as F

from parallel_dbms_spark.functions import dedup

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega red blue green".split()
)


def _corpus(spark, n_docs=60, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        rows.append(Row(doc_id=i, text=" ".join(rng.choice(WORDS) for _ in range(40))))
    # planted exact duplicates: 100/101 copy docs 0/1
    rows.append(Row(doc_id=100, text=rows[0].text))
    rows.append(Row(doc_id=101, text=rows[1].text))
    # planted near-duplicates: 200/201 edit one word of docs 2/3
    for nd, src in ((200, 2), (201, 3)):
        toks = rows[src].text.split()
        toks[5] = "EDITED"
        rows.append(Row(doc_id=nd, text=" ".join(toks)))
    return spark.createDataFrame(rows)


def test_exact_duplicates_finds_planted(spark):
    df = _corpus(spark)
    got = {(r.keep_id, r.n_dups) for r in dedup.exact_duplicates(df).collect()}
    assert got == {(0, 2), (1, 2)}


def test_minhash_lsh_finds_near_dups(spark):
    df = _corpus(spark)
    pairs = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(df, threshold=0.5).collect()}
    # exact copies and one-word edits must all surface
    assert {(0, 100), (1, 101), (2, 200), (3, 201)} <= pairs


def test_minhash_estimate_tracks_exact_jaccard(spark):
    df = _corpus(spark)
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(df, threshold=0.0).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.0, max_shingle_df=None).collect()
    }
    for pair in [(0, 100), (1, 101), (2, 200), (3, 201)]:
        assert est[pair] == pytest.approx(exact[pair], abs=0.25)
    # exact copies estimate 1.0
    assert est[(0, 100)] == 1.0


def test_simhash_identical_and_near(spark):
    df = _corpus(spark)
    pairs = {(r.id_a, r.id_b): r.hamming for r in dedup.simhash_pairs(df, max_hamming=10).collect()}
    assert pairs[(0, 100)] == 0
    assert pairs[(1, 101)] == 0
    assert (2, 200) in pairs  # one-word edit within hamming 10


def test_jaccard_df_cap_only_drops_pairs(spark):
    df = _corpus(spark)
    uncapped = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(df, threshold=0.5, max_shingle_df=None).collect()}
    capped = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(df, threshold=0.5, max_shingle_df=3).collect()}
    assert capped <= uncapped


def test_word_shingles_short_text(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="one two")])
    sh = df.select(dedup.word_shingles(F.col("text"), 3).alias("sh")).collect()[0].sh
    assert sh == ["one two"]  # shorter than n -> whole text is the shingle


def test_duplicate_clusters_transitive_chain(spark):
    # A~B and B~C but never A~C: one cluster {1,2,3} labeled by min id;
    # {7,8} a separate component.
    from pyspark.sql import Row
    pairs = spark.createDataFrame(
        [Row(id_a=2, id_b=3), Row(id_a=1, id_b=2), Row(id_a=7, id_b=8)]
    )
    got = {(r.id, r.cluster_id) for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}


@pytest.mark.slow  # residual: test_duplicate_clusters (short-path) + dedup_clusters oracle row
def test_duplicate_clusters_long_path_converges(spark):
    # Worst-case diameter: a 12-node path; label must propagate end to end.
    from pyspark.sql import Row
    pairs = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(12)])
    got = dedup.duplicate_clusters(pairs).collect()
    assert {r.cluster_id for r in got} == {0}
    assert len(got) == 13


def test_fuzzy_pairs_planted_typos(spark):
    from pyspark.sql import Row

    from parallel_dbms_spark.functions.dedup import fuzzy_pairs

    rows = [
        Row(id=1, name="jonathan smith"),
        Row(id=2, name="jonathan smyth"),   # 1 substitution of 1
        Row(id=3, name="jonathan smithe"),  # 1 insertion of 1
        Row(id=4, name="entirely different"),
        Row(id=5, name="jon smith"),        # distance 5 from 1 — excluded
    ]
    got = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_pairs(
            spark.createDataFrame(rows), "id", "name", max_dist=1
        ).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1}


def test_keep_canonical_picks_longest_and_covers_all_docs(spark):
    from pyspark.sql import Row

    from parallel_dbms_spark.functions.dedup import keep_canonical

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="short dup text"),
            Row(doc_id=2, text="short dup text plus richer longer content"),
            Row(doc_id=3, text="a lone singleton document"),
            Row(doc_id=4, text="short dup text"),
        ]
    )
    clusters = spark.createDataFrame(
        [Row(id=1, cluster_id=1), Row(id=2, cluster_id=1), Row(id=4, cluster_id=1)]
    )
    got = {r.cluster_id: r for r in keep_canonical(docs, clusters).collect()}
    # cluster 1: doc 2 has the most tokens -> canonical; 3 members
    assert got[1].kept_doc_id == 2 and got[1].n_members == 3
    # singleton doc 3 forms its own cluster and keeps itself
    assert got[3].kept_doc_id == 3 and got[3].n_members == 1
    # every doc accounted for exactly once across clusters
    assert sum(r.n_members for r in got.values()) == 4


def test_duplicate_spans_finds_planted_passage(spark):
    from parallel_dbms_spark.functions.dedup import duplicate_spans

    passage = "the quick brown fox jumps over the lazy dog again today"
    rows = [
        (1, f"intro words here {passage} tail one"),
        (2, f"{passage} completely different ending text follows now"),
        (3, "no shared content in this document at all whatsoever yes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = duplicate_spans(df, n=8, min_docs=2)
    hits = got.collect()
    assert {r["doc_id"] for r in hits} == {1, 2}
    assert all(r["n_docs"] == 2 for r in hits)
    # doc 2's shared passage starts at token position 1
    assert min(r["pos"] for r in hits if r["doc_id"] == 2) == 1
    # doc 1's copy starts after its 3 intro tokens -> position 4
    assert min(r["pos"] for r in hits if r["doc_id"] == 1) == 4
    # a doc shorter than n produces no spans
    tiny = spark.createDataFrame([(9, "just three words")], "doc_id long, text string")
    assert duplicate_spans(tiny, n=8).count() == 0


def test_merge_span_intervals_collapses_consecutive_positions(spark):
    from parallel_dbms_spark.functions.dedup import merge_span_intervals

    spans = spark.createDataFrame(
        [(1, 4), (1, 5), (1, 6), (1, 10), (2, 1)],
        "doc_id long, pos int",
    )
    got = {
        (r["doc_id"], r["start_pos"]): (r["end_pos"], r["n_tokens"])
        for r in merge_span_intervals(spans, n=8).collect()
    }
    # positions 4-6 merge into one island covering tokens 4..13
    assert got[(1, 4)] == (13, 10)
    # isolated position 10 is its own island (tokens 10..17)
    assert got[(1, 10)] == (17, 8)
    assert got[(2, 1)] == (8, 8)


def test_cut_spans_removes_planted_passage(spark):
    from parallel_dbms_spark.functions.dedup import (
        cut_spans,
        duplicate_spans,
        merge_span_intervals,
    )

    passage = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, f"keep one two {passage} keep three"),
        (2, f"{passage} unique suffix here for document two"),
        (3, "entirely original words that appear nowhere else at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(df, n=8, min_docs=2)
    iv = merge_span_intervals(spans, n=8)
    out = {r["doc_id"]: r for r in cut_spans(df, iv).collect()}
    assert out[1]["clean_text"] == "keep one two keep three"
    assert out[1]["n_tokens_cut"] == 8
    assert out[2]["clean_text"] == "unique suffix here for document two"
    assert out[3]["clean_text"] == rows[2][1]
    assert out[3]["n_tokens_cut"] == 0


# ---------------------------------------------------------------------------
# prefix-filtered set-similarity join (PPJoin-lite)
# ---------------------------------------------------------------------------
def test_prefix_jaccard_equals_sharing_based_join(spark):
    # Same pairs, same jaccard values as the share-one-shingle
    # baseline, at two thresholds (prefix filtering is lossless).
    df = _corpus(spark)
    for t in (0.5, 0.8):
        a = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in dedup.prefix_jaccard_pairs(df, threshold=t).collect()
        }
        b = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in dedup.ngram_jaccard_pairs(
                df, threshold=t, max_shingle_df=None
            ).collect()
        }
        assert a == b and len(a) >= 4


def test_prefix_jaccard_finds_planted(spark):
    df = _corpus(spark)
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.prefix_jaccard_pairs(df, threshold=0.5).collect()
    }
    assert {(0, 100), (1, 101), (2, 200), (3, 201)} <= pairs


def test_prefix_filter_prunes_candidates(spark):
    # The point of the prefix: the candidate join touches strictly
    # fewer (id, shingle) rows than the full explode. Count the rows
    # each design would feed its self-join with.
    df = _corpus(spark)
    sh = df.select(
        F.col("doc_id").alias("id"),
        dedup.word_shingles(F.col("text"), 3).alias("sh"),
    ).select("id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))
    full_rows = sh.count()

    t = 0.8
    plen = (
        sh.select(
            "id",
            (F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh")) + 1).alias("p"),
        )
        .groupBy("id")
        .agg(F.first("p").alias("p"))
        .agg(F.sum("p").alias("total"))
        .collect()[0]["total"]
    )
    # prefix rows are ~(1-t) of the full explode
    assert plen < 0.35 * full_rows
