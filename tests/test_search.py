"""Full-text search surface (functions/search.py): postings, phrase
positional-intersection, trigram substring pruning, served layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_dbms_spark.functions.search import (
    build_postings,
    build_trigram_index,
    conjunctive_search,
    phrase_search,
    read_postings_for_terms,
    substring_search,
    write_postings,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "quick brown foxes are quick brown animals"),
    (3, "a slow red fox naps all day"),
    (4, "brown the quick"),  # all words, wrong order -> no phrase match
    (5, "value value value"),  # repeated-token phrase target
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings_positions_are_token_offsets(docs):
    p = build_postings(docs).filter(F.col("doc_id") == 1).orderBy("pos")
    rows = [(r["pos"], r["term"]) for r in p.collect()]
    assert rows[:3] == [(0, "the"), (1, "quick"), (2, "brown")]
    assert rows[-1] == (8, "dog")


def test_conjunctive_search_and_semantics(docs):
    got = {
        r["doc_id"]: r["n_hits"]
        for r in conjunctive_search(docs, ["quick", "brown"]).collect()
    }
    # doc1: 1+1 hits, doc2: 2+2, doc4: 1+1; doc3 lacks both terms.
    assert got == {1: 2, 2: 4, 4: 2}


def test_phrase_search_orders_and_counts(docs):
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(docs, "quick brown").collect()
    }
    # doc4 has both words but never consecutively in phrase order.
    assert got == {1: 1, 2: 2}


def test_phrase_search_three_tokens(docs):
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(docs, "the quick brown").collect()
    }
    assert got == {1: 1}


def test_phrase_search_repeated_token_phrase(docs):
    # "value value" in "value value value" matches at starts 0 and 1 —
    # the slot-vote logic must not collapse the two identical terms.
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(docs, "value value").collect()
    }
    assert got == {5: 2}


def test_substring_search_equals_full_scan_and_prunes(docs):
    needle = "wn the qui"  # crosses word boundaries inside doc4 only
    got = sorted(r["doc_id"] for r in substring_search(docs, needle).collect())
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.contains(F.lower("text"), F.lit(needle))).collect()
    )
    assert got == want == [4]
    # the trigram candidate set must actually prune: docs 3/5/6 share
    # no trigram with the needle
    idx = build_trigram_index(docs)
    tris = sorted({needle[i : i + 3] for i in range(len(needle) - 2)})
    cands = (
        idx.filter(F.col("tri").isin(tris))
        .groupBy("doc_id")
        .agg(F.count_distinct("tri").alias("n"))
        .filter(F.col("n") == len(tris))
    )
    assert cands.count() < len(DOCS)


def test_substring_search_short_needle_falls_back(docs):
    got = sorted(r["doc_id"] for r in substring_search(docs, "ox").collect())
    assert got == [1, 2, 3]


def test_served_postings_prune_buckets_and_match_inline(docs, tmp_path, spark):
    path = str(tmp_path / "idx")
    write_postings(docs, path, n_buckets=8)
    terms = ["quick", "fox"]
    served = read_postings_for_terms(spark, path, terms, n_buckets=8)
    # partition pruning: the scan must read fewer than all 8 bucket dirs
    files = [f.rsplit("/bucket=", 1)[1].split("/")[0]
             for f in served.select(F.input_file_name().alias("f")).distinct()
             .collect()
             for f in [f["f"]]]
    assert len(set(files)) <= 2
    inline = conjunctive_search(docs, terms)
    via_index = conjunctive_search(
        docs, terms, postings=served.select("term", "doc_id", "pos")
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, via_index.collect())
    )


def test_phrase_search_empty_phrase_raises(docs):
    with pytest.raises(ValueError):
        phrase_search(docs, "   ")
    with pytest.raises(ValueError):
        conjunctive_search(docs, [])


def test_containment_pairs_planted(spark):
    from parallel_dbms_spark.functions.search import containment_pairs

    rows = [
        (1, "the quick brown fox"),
        (2, "xx the quick brown fox yy"),        # contains doc1
        (3, "quick brown"),                      # inside 1 and 2
        (4, "completely different text here"),
        (5, "ck bro"),                           # cross-word substring of 1,2,3
        (6, ""),                                 # empty: excluded (len<3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["inner_id"], r["outer_id"])
        for r in containment_pairs(df).collect()
    }
    want = {(1, 2), (3, 1), (3, 2), (5, 1), (5, 2), (5, 3)}
    assert got == want


def test_served_trigram_index_prunes_and_matches_inline(docs, tmp_path, spark):
    from parallel_dbms_spark.functions.search import (
        read_trigram_index_for,
        write_trigram_index,
    )

    path = str(tmp_path / "tri_idx")
    write_trigram_index(docs, path, n_buckets=8)
    needle = "wn the qui"
    served = read_trigram_index_for(spark, path, needle, n_buckets=8)
    buckets = {
        f["f"].rsplit("/bucket=", 1)[1].split("/")[0]
        for f in served.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert len(buckets) < 8  # directory pruning really happened
    got = sorted(
        r["doc_id"]
        for r in substring_search(docs, needle, index=served).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in substring_search(docs, needle).collect()
    )
    assert got == want == [4]


def test_conjunctive_search_mixed_case_and_duplicate_terms(docs):
    base = {
        r["doc_id"]: r["n_hits"]
        for r in conjunctive_search(docs, ["quick", "brown"]).collect()
    }
    # duplicates / case variants of the SAME term must not change the
    # match set (the index is lowercased and term-distinct)
    dup = {
        r["doc_id"]: r["n_hits"]
        for r in conjunctive_search(docs, ["quick", "Quick", "BROWN"]).collect()
    }
    assert dup == base


def test_served_postings_read_is_case_insensitive(docs, tmp_path, spark):
    path = str(tmp_path / "idx_case")
    write_postings(docs, path, n_buckets=8)
    lower = read_postings_for_terms(spark, path, ["quick", "fox"], n_buckets=8)
    mixed = read_postings_for_terms(spark, path, ["Quick", "FOX"], n_buckets=8)
    assert lower.count() > 0
    got = sorted(tuple(r) for r in mixed.select("doc_id", "term", "pos").collect())
    want = sorted(tuple(r) for r in lower.select("doc_id", "term", "pos").collect())
    assert got == want
