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


# ------------------------------------------------------------------ CMS
# Count-min sketch (Cormode & Muthukrishnan 2005): a mergeable
# fixed-size frequency summary. The sketch IS a DataFrame of
# (d, w, cnt) counter cells — depth*width rows regardless of corpus
# size — built with ONE map-side-combined aggregation. Complements
# ``heavy_hitters`` (exact two-pass): CMS answers point-frequency
# queries over streams/shards you can no longer rescan, and sketches
# from different days/shards merge by cell-wise addition (exactly —
# tested), the same re-aggregation discipline as the HLL surface.
# Estimates overcount only: err <= n*e/width with prob 1-(1/2)^depth.


def _cms_hashes(term_col: str, depth: int, width: int, hash_fn: str):
    """Per-seed cell index expressions. ``xxhash64`` (default) is the
    scale path — one 64-bit JVM hash per seed. ``md5`` places cells
    from a 5-hex-digit prefix of the seeded digest (0..2^20-1, pmod
    width) — slower per row but still whole-stage codegen, and
    REPLAYABLE by any engine with md5 (DuckDB included), which makes a
    sketch query value-hash-checkable end to end. Same trade as the
    sampling surface's md5 ranks: determinism across engines is the
    feature. md5 mode requires width <= 2^20."""
    if hash_fn == "md5":
        if width > 1 << 20:
            raise ValueError("md5 cell placement supports width <= 2^20")
        return [
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.encode(
                            F.concat(
                                F.lit(f"{i}:"),
                                F.col(term_col).cast("string"),
                            ),
                            "UTF-8",
                        )),
                        1, 5,
                    ),
                    16, 10,
                ).cast("long"),
                F.lit(width),
            )
            for i in range(depth)
        ]
    if hash_fn != "xxhash64":
        raise ValueError(f"unknown cms hash_fn {hash_fn!r}")
    return [
        F.pmod(F.xxhash64(F.col(term_col), F.lit(i)), F.lit(width))
        for i in range(depth)
    ]


def _cms_cells(df: DataFrame, term_col: str, depth: int, width: int,
               hash_fn: str = "xxhash64"):
    """One (d, w) cell coordinate per (row, hash-seed)."""
    hashes = F.array(*_cms_hashes(term_col, depth, width, hash_fn))
    return df.select(F.posexplode(hashes).alias("d", "w"))


def cms_build(
    df: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 2048,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Sketch the multiset of ``term_col`` values into (d, w, cnt)
    counters. Zero cells are omitted (they read as 0 downstream).
    Sketches merge only at equal (depth, width, hash_fn)."""
    return (
        _cms_cells(df, term_col, depth, width, hash_fn)
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shaped sketches — the linearity that makes
    CMS shard/day re-aggregable: merge(build(A), build(B)) ==
    build(A ++ B) EXACTLY, not approximately (counters are sums)."""
    if not sketches:
        raise ValueError("cms_merge: need at least one sketch")
    acc = sketches[0]
    for s in sketches[1:]:
        acc = acc.unionByName(s)
    return acc.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 2048,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Point-frequency estimates for ``terms``: (term, est). The
    estimate is min over the depth counters the term hashes to —
    never an undercount. The sketch (depth*width rows, bounded) is
    broadcast; the probe is an equi-join, no shuffle of ``terms``."""
    probes = terms.select(
        F.col(term_col).alias("term"),
        F.posexplode(
            F.array(*_cms_hashes(term_col, depth, width, hash_fn))
        ).alias("d", "w"),
    )
    hits = probes.join(F.broadcast(sketch), on=["d", "w"], how="left").select(
        "term", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return hits.groupBy("term").agg(F.min("cnt").alias("est"))


def cms_inner_product(a: DataFrame, b: DataFrame) -> DataFrame:
    """Join-cardinality estimation from two count-min sketches — the
    CMS inner-product estimator (Cormode & Muthukrishnan §4.2):
    |A ⋈_k B| = Σ_k fa(k)·fb(k), estimated as min over the depth rows
    of Σ_w a[d,w]·b[d,w]. Like point estimates it never undercounts
    (hash collisions only add), so it is a safe admission check before
    launching an expensive join: plan for AT LEAST the true output.

    Inputs are ``cms_build`` outputs over each side's join key at the
    SAME (depth, width). The estimate touches only sketch cells —
    2·depth·width counters — never the tables; at 100 TB that is the
    entire point (the query optimizer's ndv-product heuristic, done
    with one cheap pre-pass each side and zero assumptions about
    independence). Returns a single row (est bigint).
    """
    aa = a.select("d", "w", F.col("cnt").alias("a_cnt"))
    bb = b.select("d", "w", F.col("cnt").alias("b_cnt"))
    per_row = (
        aa.join(bb, on=["d", "w"])  # absent cells are zero -> drop out
        .groupBy("d")
        .agg(F.sum(F.col("a_cnt") * F.col("b_cnt")).alias("ip"))
    )
    return per_row.agg(F.min("ip").alias("est"))
