"""Differential fuzz for the search surface: seeded random term sets,
phrases, and substrings over the real documents fixture, each checked
against DuckDB computing the same semantics in SQL — the same
oracle-differential discipline as test_fuzz_sql.py, pointed at the
index-backed operators (which must agree with a plain scan EXACTLY,
pruning being lossless)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from parallel_dbms_spark.catalog import load_table
from parallel_dbms_spark.functions.search import (
    conjunctive_search,
    phrase_search,
    substring_search,
)

SF = "/root/testdata/sf0.001"
VOCAB = (
    "spark table value row scan fast slow batch window merge join group "
    "order sort hash part line query stream data column agg key big small "
    "the a customer vector filter"
).split()


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def duck_docs(duck):
    return duck


def test_fuzz_conjunctive_terms(docs, duck):
    rng = random.Random(0xC0FFEE)
    for trial in range(12):
        terms = rng.sample(VOCAB, rng.randint(1, 3))
        got = sorted(
            r["doc_id"] for r in conjunctive_search(docs, terms).collect()
        )
        in_list = ", ".join(f"'{t}'" for t in terms)
        want = sorted(
            r[0]
            for r in duck.execute(
                f"""WITH tok AS (SELECT doc_id,
                        unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
                        FROM documents)
                    SELECT doc_id FROM tok WHERE term IN ({in_list})
                    GROUP BY doc_id HAVING COUNT(DISTINCT term) = {len(terms)}"""
            ).fetchall()
        )
        assert got == want, f"trial {trial}: terms={terms}"


def test_fuzz_phrases(docs, duck):
    rng = random.Random(0xBEEF)
    texts = [
        r[0]
        for r in duck.execute(
            "SELECT text FROM documents ORDER BY doc_id LIMIT 40"
        ).fetchall()
    ]
    for trial in range(12):
        # draw a REAL phrase from a random doc so hits are plausible,
        # or a random vocab phrase (usually a miss) on odd trials
        if trial % 2 == 0:
            words = texts[rng.randrange(len(texts))].split()
            k = rng.randint(2, min(4, len(words)))
            start = rng.randrange(len(words) - k + 1)
            phrase_words = words[start : start + k]
        else:
            phrase_words = [rng.choice(VOCAB) for _ in range(rng.randint(2, 3))]
        phrase = " ".join(phrase_words)
        got = {
            (r["doc_id"], r["n_matches"])
            for r in phrase_search(docs, phrase).collect()
        }
        conds = " AND ".join(
            f"t{i}.term = '{w}'" for i, w in enumerate(phrase_words)
        )
        joins = " ".join(
            f"JOIN tok t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i}"
            for i in range(1, len(phrase_words))
        )
        want = {
            (r[0], r[1])
            for r in duck.execute(
                f"""WITH tok AS (SELECT doc_id,
                        unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term,
                        unnest(generate_series(0,
                            len(regexp_split_to_array(lower(trim(text)), '\\s+')) - 1)) AS pos
                        FROM documents)
                    SELECT t0.doc_id, COUNT(*) AS n
                    FROM tok t0 {joins}
                    WHERE {conds}
                    GROUP BY t0.doc_id"""
            ).fetchall()
        }
        assert got == want, f"trial {trial}: phrase={phrase!r}"


def test_fuzz_substrings(docs, duck):
    rng = random.Random(0xF00D)
    texts = [
        r[0]
        for r in duck.execute(
            "SELECT text FROM documents ORDER BY doc_id LIMIT 40"
        ).fetchall()
    ]
    for trial in range(15):
        t = texts[rng.randrange(len(texts))]
        ln = rng.randint(2, 15)  # incl. <3 fallback and cross-word slices
        start = rng.randrange(max(1, len(t) - ln))
        needle = t[start : start + ln]
        if not needle.strip():
            continue
        got = sorted(
            r["doc_id"] for r in substring_search(docs, needle).collect()
        )
        esc = needle.replace("'", "''")
        want = sorted(
            r[0]
            for r in duck.execute(
                f"SELECT doc_id FROM documents WHERE contains(lower(text), lower('{esc}'))"
            ).fetchall()
        )
        assert got == want, f"trial {trial}: needle={needle!r}"
        # index path must equal the engine's own full scan too
        full = sorted(
            r["doc_id"]
            for r in docs.filter(
                F.contains(F.lower("text"), F.lit(needle.lower()))
            ).collect()
        )
        assert got == full
