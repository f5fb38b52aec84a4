"""Relational operator library — the reference's operator inventory
(SURVEY §2.1 O1-O18) re-expressed as declarative DataFrame transforms.

Every function returns a lazy DataFrame: Catalyst fuses these into
whole-stage-codegen pipelines, pushes filters/projections into the
scan, and picks join/aggregate physical strategies. Nothing here
materializes intermediates — unlike the reference, which writes a CSV
between every pair of operators (/root/reference/src/main.cpp:325-335).

Scale notes are inline per operator; the common theme is: no
driver-side loops, no collect(), shuffles only where the algebra
requires one (groupBy keys, join keys, global sort), broadcast for
small build sides.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

# The reference's six comparison ops (/root/reference/src/headers/enums.h:19-26,
# evaluate /root/reference/src/headers/column.cpp:236-264).
CMP_OPS = {
    "=": Column.__eq__,
    "==": Column.__eq__,
    "!=": Column.__ne__,
    "<>": Column.__ne__,
    "<": Column.__lt__,
    "<=": Column.__le__,
    ">": Column.__gt__,
    ">=": Column.__ge__,
}


def _to_condition(df: DataFrame, cond) -> Column:
    """(col, op, value) triple | SQL string | Column -> boolean Column."""
    if isinstance(cond, Column):
        return cond
    if isinstance(cond, str):
        return F.expr(cond)
    col, op, value = cond
    return CMP_OPS[op](df[col], F.lit(value))


def filter_rows(df: DataFrame, *conds, disjunction: bool = False) -> DataFrame:
    """Filter — real, including the cases the reference dropped.

    The reference only filters inside the scan for CONSTANT_COMPARISON
    pushdowns (/root/reference/src/main.cpp:64-200); its FILTER plan
    node is a stub that returns the input unchanged (:201-212) and
    OR-composed table filters throw (:152-163). Here AND/OR compose
    natively and Catalyst still pushes eligible conjuncts into the
    parquet scan (visible as PushedFilters in explain()).
    """
    if not conds:
        return df
    cols = [_to_condition(df, c) for c in conds]
    out = cols[0]
    for c in cols[1:]:
        out = (out | c) if disjunction else (out & c)
    return df.filter(out)


def project(df: DataFrame, *cols) -> DataFrame:
    """Projection — column refs AND computed expressions.

    The reference records projected column indices only; computed
    SELECT expressions are never evaluated
    (/root/reference/src/main.cpp:378-403). Strings are parsed as SQL
    expressions so arithmetic/CASE/functions work.
    """
    return df.select(*[F.expr(c) if isinstance(c, str) else c for c in cols])


_AGG_FNS = {
    "count": F.count,
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
}


def aggregate(
    df: DataFrame,
    aggs: Sequence[tuple[str, str, str]],
    group_by: Sequence[str] = (),
) -> DataFrame:
    """COUNT/SUM/AVG/MIN/MAX, ungrouped or grouped.

    Ungrouped matches the reference's GPU reduction path
    (/root/reference/src/operators/aggregate.cpp:50-242 + warp-shuffle
    kernels /root/reference/src/cuda/aggregate.cu:88-242); Spark's
    HashAggregateExec does the same partial-per-partition + final-merge
    split, including the AVG = SUM/COUNT rewrite the reference driver
    hand-rolls (/root/reference/src/main.cpp:563-566,600-610). GROUP BY
    is the reference's biggest gap (no HASH_GROUP_BY case,
    /root/reference/src/main.cpp:636-674) and is native here.

    ``aggs``: (fn, column, alias) triples; fn in count/sum/avg/min/max,
    column "*" allowed for count.
    """
    exprs = [_AGG_FNS[fn.lower()](col).alias(alias) for fn, col, alias in aggs]
    return df.groupBy(*group_by).agg(*exprs) if group_by else df.agg(*exprs)


def join_tables(
    left: DataFrame,
    right: DataFrame,
    conds: Sequence[tuple[str, str, str]] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi/theta join with conjunctive conditions — correct AND fold.

    The reference routes both HASH_JOIN and NESTED_LOOP_JOIN plan nodes
    to one block-nested-loop CUDA kernel
    (/root/reference/src/main.cpp:654-665, kernel
    /root/reference/src/Join/join.cu:161-336) and supports only inner
    emission. Its CPU twin has a real bug: the multi-condition loop
    overwrites instead of AND-ing, so only the last condition applies
    (/root/reference/src/operators/join.cpp:166-175). We fold with
    ``&`` (the GPU kernel's correct semantics, join.cu:74) and let
    Catalyst split equi-conjuncts into a hash/sort-merge join with the
    theta remainder as a post-join filter. All join types, not just
    inner.

    Scale: ``broadcast_right`` pins the reference's shared-memory
    small-side idea (/root/reference/src/Join/join.cu:197-245) to a
    broadcast hash join; otherwise AQE picks strategy from runtime
    stats.
    """
    if isinstance(conds, Column):
        on = conds
    else:
        cols = [CMP_OPS[op](left[lc], right[rc]) for lc, op, rc in conds]
        on = cols[0]
        for c in cols[1:]:
            on = on & c
    if broadcast_right:
        right = F.broadcast(right)
    return left.join(right, on=on, how=how)


def order_by(df: DataFrame, *keys: tuple[str, bool]) -> DataFrame:
    """Multi-key, unlimited-size ORDER BY. keys = (column, ascending).

    Replaces the reference's single-column, FIRST-BATCH-ONLY sort
    (only orders[0] consulted and only one readNextBatch,
    /root/reference/src/main.cpp:405-544; 4-way LSD radix kernel
    /root/reference/src/RadixSort/sort.cu:240-307; CPU std::sort for
    strings /root/reference/src/operators/cpu_sort.cpp:3-78). Spark
    range-partitions by sampled key quantiles then sorts partitions
    with spill — a total order over any data size, strings included.
    """
    cols = [F.col(c).asc() if asc else F.col(c).desc() for c, asc in keys]
    return df.orderBy(*cols)


def limit(df: DataFrame, n: int) -> DataFrame:
    """LIMIT/TOP-N — planned but absent in the reference (physical_top_n
    included, no dispatch case: /root/reference/src/main.cpp:22,636-674).
    After orderBy, Catalyst collapses sort+limit into TakeOrderedAndProject
    (a distributed top-N, no global sort)."""
    return df.limit(n)


def top_k_per_group(
    df: DataFrame, group: Sequence[str], order: Sequence[tuple[str, bool]], k: int
) -> DataFrame:
    """Top-K per group via window row_number — partial per partition,
    no global sort. Gap feature (SURVEY §2.3 windows/limits)."""
    w = Window.partitionBy(*group).orderBy(
        *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in order]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def set_op(left: DataFrame, right: DataFrame, op: str) -> DataFrame:
    """UNION [ALL] / INTERSECT / EXCEPT — absent in the reference
    (SURVEY §2.3)."""
    return {
        "union": lambda: left.unionByName(right).distinct(),
        "union_all": lambda: left.unionByName(right),
        "intersect": lambda: left.intersect(right),
        "except": lambda: left.exceptAll(right),
    }[op]()


def grouping_agg(
    df: DataFrame,
    dims: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    mode: str = "rollup",
) -> DataFrame:
    """ROLLUP / CUBE over ``dims`` — absent in the reference (SURVEY
    §2.3). ``aggs`` as in :func:`aggregate`. Physically one expanded
    hash aggregate (Expand + partial/final HashAggregate), not one
    pass per grouping set."""
    grouped = {"rollup": df.rollup, "cube": df.cube}[mode](*dims)
    return grouped.agg(*[_AGG_FNS[fn.lower()](col).alias(a) for fn, col, a in aggs])


def join_skew_salted(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi join with manual salting for a skewed LEFT key.

    The hot key's rows are spread over ``salt`` synthetic sub-keys;
    the (smaller) right side is replicated ``salt`` times so every
    sub-key still finds its match. Use when one key holds a large
    fraction of the rows — a single shuffle partition would otherwise
    serialize the whole join. (AQE's skew-join split handles moderate
    skew automatically; salting is the explicit tool for the
    pathological case, and the one you'd reach for on a 1000-executor
    cluster before resorting to per-key special-casing.)
    """
    l = left.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l.join(
        r,
        (l[left_key] == r[right_key]) & (l["__salt"] == r["__salt"]),
        how=how,
    )
    return out.drop("__salt")
