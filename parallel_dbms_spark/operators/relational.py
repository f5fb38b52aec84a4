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


def cumulative_offsets(
    counts: DataFrame,
    pid_col: str = "__pid",
    cnt_col: str = "__cnt",
    off_col: str = "__off",
) -> DataFrame:
    """Exclusive prefix sum over a tiny one-row-per-partition frame
    WITHOUT a window: pack the rows into one sorted array, cumulate
    with array built-ins, explode back to rows.

    Why not a window: even a P-row global window plans as a
    single-partition WindowExec and logs the "No Partition Defined"
    scale warning, and a constant partition key gets constant-folded
    back to the same empty spec. This stays warning-free by
    construction. Cost is O(P²) additions inside array expressions —
    microseconds for any realistic partition count.
    """
    packed = counts.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(pid_col).alias("p"), F.col(cnt_col).alias("c")
                )
            )
        ).alias("arr")
    )
    cum = packed.select(
        F.explode(
            F.transform(
                F.col("arr"),
                lambda x, i: F.struct(
                    x["p"].alias(pid_col),
                    F.aggregate(
                        F.slice(F.col("arr"), F.lit(1), i),
                        F.lit(0).cast("bigint"),
                        lambda acc, y: acc + y["c"],
                    ).alias(off_col),
                ),
            )
        ).alias("s")
    )
    return cum.select(f"s.{pid_col}", f"s.{off_col}")


def _range_partitioned_rn(
    df: DataFrame, order_by: Sequence, num_partitions: int | None
):
    """Shared machinery for :func:`global_row_number` /
    :func:`ntile_distributed`: range-partition on the total order,
    number rows inside each range partition, and produce the
    per-partition counts needed to turn local numbers into global ones.

    Returns ``(numbered, counts)`` where ``numbered`` carries
    ``__pid`` (materialized range-partition id) and ``__rn_local``,
    and ``counts`` is one ``(__pid, __cnt)`` row per partition.

    The partition assignment is EAGERLY materialized
    (``localCheckpoint``) before fan-out: ``spark_partition_id()`` is
    nondeterministic under re-execution, and the frame is consumed
    twice (count aggregation + local window) — without the pin, AQE
    re-planning or a downstream re-shuffle (e.g. feeding this
    operator's output into another range exchange, as chained RFM
    quartiles do) can re-execute the subtree with different partition
    ids for each consumer, silently desynchronizing offsets from
    local numbers (observed as an impossible bucket n+1 at sf0.1).
    One in-memory materialization of the already-shuffled frame is
    the price of determinism here; the checkpoint also truncates
    lineage for downstream iterative use.
    """
    p = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    ranged = (
        df.repartitionByRange(p, *order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_local = Window.partitionBy("__pid").orderBy(*order_by)
    numbered = ranged.withColumn("__rn_local", F.row_number().over(w_local))
    return numbered, counts


def global_row_number(
    df: DataFrame,
    order_by: Sequence,
    num_partitions: int | None = None,
    row_col: str = "rn",
) -> DataFrame:
    """Distributed ``ROW_NUMBER() OVER (ORDER BY ...)`` — the scalable
    form of the global-rank pattern.

    An unpartitioned window moves EVERY row into one partition
    (WindowExec "No Partition Defined" — one task ranks 100 TB). This
    computes identical numbers in parallel, the textbook way:

    1. ``repartitionByRange`` on the order keys — Spark samples the
       key distribution, so range partitions are balanced, and range
       partition ``i`` holds keys strictly before partition ``i+1``'s;
    2. per-partition local ``row_number`` (window PARTITIONED by the
       materialized range-partition id — every partition ranks
       concurrently);
    3. per-partition counts (one row per partition) cumulated into
       start offsets — a P-row window, broadcast-joined back;
       ``global rn = offset(pid) + local rn``.

    ``order_by`` must be a TOTAL order (include a unique tiebreak
    column) for deterministic output — same requirement the
    single-partition form has.
    """
    numbered, counts = _range_partitioned_rn(df, order_by, num_partitions)
    offsets = cumulative_offsets(counts)
    return (
        numbered.join(F.broadcast(offsets), "__pid")
        .withColumn(
            row_col,
            (F.col("__off") + F.col("__rn_local")).cast("bigint"),
        )
        .drop("__pid", "__rn_local", "__off")
    )


def ntile_distributed(
    df: DataFrame,
    order_by: Sequence,
    n_buckets: int,
    num_partitions: int | None = None,
    out_col: str = "bucket",
) -> DataFrame:
    """Distributed ``NTILE(n) OVER (ORDER BY ...)`` — exact standard
    semantics (first ``n_rows % n`` buckets get one extra row) without
    the single-partition global window.

    Built on :func:`global_row_number`; the total row count comes from
    summing the per-partition counts (a broadcast scalar), and the
    bucket is closed-form in (rn, n): with q = n_rows // n and
    r = n_rows % n, rows 1..r*(q+1) land in buckets of size q+1, the
    rest in buckets of size q.
    """
    numbered, counts = _range_partitioned_rn(df, order_by, num_partitions)
    offsets = cumulative_offsets(counts)
    total = counts.agg(F.sum("__cnt").cast("bigint").alias("__n"))
    rn = F.col("__off") + F.col("__rn_local")
    q = F.floor(F.col("__n") / n_buckets)
    r = F.col("__n") % n_buckets
    head = r * (q + 1)  # rows in the oversized leading buckets
    bucket = (
        F.when(rn <= head, F.floor((rn - 1) / (q + 1)))
        # greatest(q,1): the branch is unreachable when q == 0 (every
        # rn <= head then), but ANSI mode would still reject a /0 expr
        .otherwise(r + F.floor((rn - head - 1) / F.greatest(q, F.lit(1))))
        + 1
    )
    return (
        numbered.join(F.broadcast(offsets), "__pid")
        .crossJoin(F.broadcast(total))
        .withColumn(out_col, bucket.cast("int"))
        .drop("__pid", "__rn_local", "__off", "__n")
    )


def bucket_by_quantiles(
    df: DataFrame,
    col: str,
    n_buckets: int,
    rel_err: float = 0.001,
    out_col: str = "bucket",
) -> DataFrame:
    """Value-based quantile bucketing — the APPROXIMATE, fully
    scan-parallel alternative to exact :func:`ntile_distributed`.

    One ``approx_percentile`` aggregation (mergeable sketch, bounded
    memory) produces the B-1 boundary values; they broadcast to every
    task and each row's bucket is ``1 + #boundaries below its value``
    — a pure projection, no range shuffle, no rank at all. Bucket
    POPULATIONS are approximate (off by the sketch's rank error at the
    boundaries); bucket MEMBERSHIP is exact w.r.t. the boundaries. At
    100 TB this is the decile formulation to prefer whenever "equal
    count" can tolerate sketch error, because it reads the data twice
    and shuffles nothing.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        F.percentile_approx(
            col, probs, max(int(1.0 / rel_err), n_buckets)
        ).alias("__bounds")
    )
    bucket = F.lit(1) + F.size(
        F.filter(F.col("__bounds"), lambda b: b < F.col(col))
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, bucket.cast("int"))
        .drop("__bounds")
    )


def rank_small_result(
    df: DataFrame,
    key_col: str,
    id_col: str,
    rank_col: str = "rank",
    descending: bool = True,
) -> DataFrame:
    """Rank a SMALL result frame (top-k shortlist, a few hundred rows
    at most) by (key, id asc) without any window operator: pack into
    one sorted array (key negated for descending order so the
    tie-break id stays ascending), posexplode, rank = position + 1.

    This is the companion of :func:`cumulative_offsets` — the
    window-free idiom for frames already reduced to driver-scale
    cardinality, immune to the single-partition WindowExec shape.
    All non-key columns ride along unchanged; the rank is INT."""
    others = [c for c in df.columns if c not in (key_col, id_col)]
    key = F.col(key_col)
    packed = df.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-key if descending else key).alias("k"),
                    F.col(id_col).alias("i"),
                    *[F.col(c).alias(c) for c in others],
                )
            )
        ).alias("arr")
    )
    x = packed.select(F.posexplode("arr").alias("pos", "s"))
    return x.select(
        F.col("s.i").alias(id_col),
        *[F.col(f"s.{c}").alias(c) for c in others],
        (-F.col("s.k") if descending else F.col("s.k")).alias(key_col),
        (F.col("pos") + 1).cast("integer").alias(rank_col),
    )


def bucket_by_quantiles_grouped(
    df: DataFrame,
    col: str,
    group_col: str,
    n_buckets: int,
    rel_err: float = 0.001,
    out_col: str = "bucket",
) -> DataFrame:
    """Per-group :func:`bucket_by_quantiles`: each group gets its OWN
    quantile boundaries (one grouped ``approx_percentile`` pass), so
    bucket 3 of a small-valued group and bucket 3 of a large-valued
    group each hold ~1/B of their group.

    Scale: boundaries are one row per group — broadcast when group
    count is dimension-like (the normal case); for millions of groups
    drop the broadcast hint and let AQE shuffle the tiny side. Bucket
    assignment stays a projection either way.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.groupBy(group_col).agg(
        F.percentile_approx(
            col, probs, max(int(1.0 / rel_err), n_buckets)
        ).alias("__bounds")
    )
    bucket = F.lit(1) + F.size(
        F.filter(F.col("__bounds"), lambda b: b < F.col(col))
    )
    return (
        df.join(F.broadcast(bounds), group_col)
        .withColumn(out_col, bucket.cast("int"))
        .drop("__bounds")
    )
