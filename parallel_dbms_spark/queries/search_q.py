"""Registered queries for the full-text search surface
(`functions/search.py`): conjunctive term search, positional phrase
search, trigram-pruned substring search, and the served (bucketed)
postings layout. All four have DuckDB oracles — the token semantics
are re-expressed in SQL with regexp_split_to_array/unnest, and the
substring query's oracle is the plain full scan the index path must
exactly reproduce.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.search import (
    build_postings,
    conjunctive_search,
    phrase_search,
    read_postings_for_terms,
    substring_search,
    write_postings,
)
from .registry import register


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


_TOK = (
    "SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term "
    "FROM documents"
)
_TOK_POS = (
    "SELECT doc_id, "
    "unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term, "
    "unnest(generate_series(0, len(regexp_split_to_array(lower(trim(text)), '\\s+')) - 1)) AS pos "
    "FROM documents"
)


@register(
    "search_and_terms",
    oracle=f"""WITH tok AS ({_TOK})
              SELECT doc_id, COUNT(*) AS n_hits
              FROM tok
              WHERE term IN ('spark', 'vector')
              GROUP BY doc_id
              HAVING COUNT(DISTINCT term) = 2""",
    tags=("search", "text", "index"),
)
def search_and_terms(spark, sf_dir):
    # AND-semantics term search: docs containing BOTH terms, with total
    # occurrence count. One postings pass + one groupBy(doc_id) — the
    # term IN-list pushes into the scan.
    return conjunctive_search(_docs(spark, sf_dir), ["spark", "vector"])


@register(
    "search_phrase",
    oracle=f"""WITH tok AS ({_TOK_POS}),
                   starts AS (
                     SELECT t0.doc_id, t0.pos
                     FROM tok t0
                     JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
                     WHERE t0.term = 'table' AND t1.term = 'value'
                   )
              SELECT doc_id, COUNT(*) AS n_matches
              FROM starts GROUP BY doc_id""",
    tags=("search", "text", "index", "phrase"),
)
def search_phrase(spark, sf_dir):
    # Exact consecutive-token phrase match with occurrence counts.
    # Spark side: positional-intersection (token i votes for start
    # pos-i; a start with all k votes is a match) — one groupBy, no
    # k-way join chain. The oracle spells out the same semantics as a
    # positional self-join.
    return phrase_search(_docs(spark, sf_dir), "table value")


@register(
    "search_substring_trigram",
    oracle="""SELECT doc_id FROM documents
              WHERE contains(lower(text), 'sort table')""",
    tags=("search", "text", "index", "trigram"),
)
def search_substring_trigram(spark, sf_dir):
    # LIKE-'%needle%' answered index-first: intersect the needle's
    # trigram posting lists to a candidate set, verify contains() on
    # candidates only. The oracle is the full scan — the index path
    # must reproduce it exactly (pruning is lossless by construction;
    # that it actually prunes is pytest-asserted).
    return substring_search(_docs(spark, sf_dir), "sort table")


@register(
    "search_served_postings",
    oracle=f"""WITH tok AS ({_TOK})
              SELECT doc_id, COUNT(*) AS n_hits
              FROM tok
              WHERE term IN ('merge', 'window')
              GROUP BY doc_id
              HAVING COUNT(DISTINCT term) = 2""",
    tags=("search", "text", "index", "lake"),
)
def search_served_postings(spark, sf_dir):
    # The serving path: postings written bucketed-by-term-hash
    # (partitionBy(bucket) directories), then the query reads ONLY its
    # terms' buckets (partition pruning) and runs the same conjunctive
    # search. Build-once/query-many — the index build is the one
    # expensive shuffle; each lookup touches len(terms) directories.
    import tempfile

    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="postings_") + "/idx"
    write_postings(docs, path, n_buckets=16)
    terms = ["merge", "window"]
    p = read_postings_for_terms(spark, path, terms, n_buckets=16)
    return conjunctive_search(docs, terms, postings=p.select("term", "doc_id", "pos"))


@register(
    "search_containment_pairs",
    oracle="""SELECT a.doc_id AS inner_id, b.doc_id AS outer_id
              FROM documents a JOIN documents b
                ON a.doc_id <> b.doc_id
               AND strlen(a.text) >= 3
               AND contains(lower(b.text), lower(a.text))""",
    tags=("search", "dedup", "containment", "trigram"),
)
def search_containment_pairs(spark, sf_dir):
    # Sub-document containment dedup, exact vs the oracle's quadratic
    # contains() join: rare-trigram blocking makes the Spark side
    # near-linear (one probe row per doc, keyed on its globally
    # rarest trigram), the residual contains() keeps it lossless.
    from ..functions.search import containment_pairs

    return containment_pairs(_docs(spark, sf_dir))
