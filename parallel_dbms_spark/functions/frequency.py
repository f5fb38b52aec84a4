"""Heavy hitters (frequent items) at scale — two-pass
candidates-then-verify with bounded per-task state.

The naive top-k-by-count (groupBy(term).count().orderBy().limit(k))
shuffles one row per DISTINCT term. For web-scale text that key space
is billions of rows of long-tail garbage shuffled only to be thrown
away. The classic fix (Misra-Gries 1982; SpaceSaving) bounds state:

  pass 1 — every partition runs a Misra-Gries summary of capacity
      ``cap`` over its rows (mapInPandas, O(cap) state, no shuffle),
      emitting <= cap candidate terms per partition. MG guarantee:
      any term with global frequency > n_part/cap survives its
      partition's summary, so the union of partition candidates is a
      SUPERSET of every term with global freq > n/cap.
  pass 2 — exact counts for candidates only: semi-join the corpus
      against the (tiny, broadcast) candidate set, then an exact
      map-side-combined groupBy + TakeOrdered(k).

Result: EXACT top-k (counts included) whenever the true k-th count
exceeds n/cap — at Zipfian text frequencies that bound is loose by
orders of magnitude (cap 4096 over 1B tokens covers every term with
>244k occurrences). The shuffle carries candidates only; the long
tail never leaves its partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term")
    )


def _mg_candidates(terms: DataFrame, cap: int) -> DataFrame:
    """Per-partition Misra-Gries summaries -> distinct candidate terms."""

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for t in pdf["term"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < cap:
                    counters[t] = 1
                else:
                    # decrement-all step, dropping zeroed counters
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        if counters:
            yield pd.DataFrame({"term": list(counters.keys())})

    return terms.mapInPandas(summarize, schema="term string").dropDuplicates()


def heavy_hitters(
    df: DataFrame,
    k: int = 20,
    cap: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Exact top-``k`` terms by count (term, n), ties broken on term.
    Exactness holds when the true k-th count > n_rows/cap — see module
    docstring; tests verify equality against the full groupBy."""
    terms = _tokens(df, text_col)
    cands = _mg_candidates(terms, cap)
    exact = (
        terms.join(F.broadcast(cands), "term", "leftsemi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return exact.orderBy(F.col("n").desc(), F.col("term").asc()).limit(k)
