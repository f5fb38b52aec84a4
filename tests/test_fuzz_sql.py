"""Seeded random-SQL differential harness (sqllogictest-lite).

A bounded ANSI-SQL grammar generates queries over lineitem; each query
text runs VERBATIM through both Spark (catalog.run_sql) and DuckDB on
the same parquet — engine-vs-engine differential testing, the direct
scale-up of the reference's CPU-vs-GPU differential harnesses
(/root/reference/src/RadixSort/main_signed.cu:118-155,
/root/reference/src/cuda/aggregate_all.cu:300-398) applied to the whole
SQL surface instead of single kernels.

Determinism rules baked into the grammar (same conventions as the
registered query surface): additive aggregates go through exact
DECIMAL(18,2) before the final DOUBLE cast; MIN/MAX/COUNT are
order-free; no LIMIT without a total order; no bare double sums.
Seeds are fixed → the corpus is stable across runs.
"""

from __future__ import annotations

import random

import pytest

from conftest import SF_SMOKE
from oracle_compare import run_compare

from parallel_dbms_spark.catalog import run_sql

DIMS = ["l_returnflag", "l_linestatus"]
NUMS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
INTS = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]


def _pred(rng: random.Random) -> str:
    kind = rng.randrange(4)
    op = rng.choice(["<", "<=", "=", "!=", ">", ">="])
    if kind == 0:
        return f"l_quantity {op} {rng.randint(1, 50)}"
    if kind == 1:
        return f"l_discount {op} 0.0{rng.randint(1, 9)}"
    if kind == 2:
        return f"l_returnflag {rng.choice(['=', '!='])} '{rng.choice('ANR')}'"
    return (
        f"l_shipdate {op} TIMESTAMP "
        f"'199{rng.randint(5, 8)}-{rng.randint(1, 12):02d}-01 00:00:00'"
    )


def _where(rng: random.Random) -> str:
    n = rng.randint(0, 3)
    if n == 0:
        return ""
    parts = [_pred(rng) for _ in range(n)]
    glue = rng.choice([" AND ", " OR "])
    return " WHERE " + ("(" + glue.join(parts) + ")")


def _agg_exprs(rng: random.Random) -> list[str]:
    out = ["COUNT(*) AS n"]
    for i, c in enumerate(rng.sample(NUMS, rng.randint(1, 3))):
        fn = rng.choice(["SUM", "MIN", "MAX"])
        if fn == "SUM":
            out.append(
                f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS a{i}"
            )
        else:
            out.append(f"{fn}({c}) AS a{i}")
    return out


def gen_query(seed: int) -> str:
    rng = random.Random(seed)
    if rng.random() < 0.6:
        keys = rng.sample(DIMS + ["l_linenumber"], rng.randint(1, 2))
        sel = ", ".join(keys + _agg_exprs(rng))
        return (
            f"SELECT {sel} FROM lineitem{_where(rng)} "
            f"GROUP BY {', '.join(keys)}"
        )
    cols = rng.sample(INTS + DIMS + NUMS, rng.randint(2, 5))
    return f"SELECT {', '.join(cols)} FROM lineitem{_where(rng)}"


def gen_query_v2(seed: int) -> str:
    """Wider shapes: join, HAVING, DISTINCT, ORDER BY + LIMIT.

    ORDER BY sorts every output column with explicit NULLS FIRST (Spark
    defaults NULLS FIRST on ASC, DuckDB NULLS LAST — the one dialect
    divergence in this subset), making the order total up to full-row
    duplicates, which LIMIT then treats identically in both engines.
    """
    rng = random.Random(10_000 + seed)
    kind = rng.randrange(3)
    if kind == 0:  # join + aggregate [+ HAVING]
        keys = rng.sample(["o_orderpriority", "o_orderstatus"] + DIMS, rng.randint(1, 2))
        sel = ", ".join(keys + _agg_exprs(rng))
        having = f" HAVING COUNT(*) > {rng.randint(0, 20)}" if rng.random() < 0.5 else ""
        return (
            f"SELECT {sel} FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
            f"{_where(rng)} GROUP BY {', '.join(keys)}{having}"
        )
    if kind == 1:  # DISTINCT projection
        cols = rng.sample(DIMS + ["l_linenumber", "l_quantity"], rng.randint(1, 3))
        return f"SELECT DISTINCT {', '.join(cols)} FROM lineitem{_where(rng)}"
    # ORDER BY every column + LIMIT
    cols = rng.sample(INTS + DIMS + NUMS, rng.randint(2, 4))
    order = ", ".join(
        f"{c} {rng.choice(['ASC', 'DESC'])} NULLS FIRST" for c in cols
    )
    return (
        f"SELECT {', '.join(cols)} FROM lineitem{_where(rng)} "
        f"ORDER BY {order} LIMIT {rng.randint(1, 500)}"
    )


@pytest.mark.parametrize("seed", range(40))
def test_random_sql_differential(spark, duck, seed):
    q = gen_query(seed)
    res = run_compare(
        spark, duck, f"fuzz_{seed}", lambda s, sf: run_sql(s, sf, q), q, SF_SMOKE
    )
    assert res.ok, f"{q}\n{res!r}"


@pytest.mark.parametrize("seed", range(30))
def test_random_sql_differential_v2(spark, duck, seed):
    q = gen_query_v2(seed)
    res = run_compare(
        spark, duck, f"fuzz2_{seed}", lambda s, sf: run_sql(s, sf, q), q, SF_SMOKE
    )
    assert res.ok, f"{q}\n{res!r}"


def gen_query_v3(seed: int) -> str:
    """Third wave: CASE expressions, set ops, scalar functions, and
    windowed aggregates — each shape deterministic by construction
    (set ops are set-semantics in both engines; window sums stay in
    exact decimal over a total order)."""
    rng = random.Random(20_000 + seed)
    kind = rng.randrange(4)
    if kind == 0:  # CASE + integer arithmetic projection
        lo, hi = sorted((rng.randint(1, 25), rng.randint(26, 50)))
        return (
            f"SELECT l_orderkey, l_linenumber, "
            f"CASE WHEN l_quantity < {lo} THEN 'lo' "
            f"WHEN l_quantity < {hi} THEN 'mid' ELSE 'hi' END AS bucket, "
            f"l_orderkey % {rng.randint(2, 97)} AS m, "
            f"l_linenumber * {rng.randint(2, 9)} + {rng.randint(0, 5)} AS a "
            f"FROM lineitem{_where(rng)}"
        )
    if kind == 1:  # set ops between two filtered projections
        op = rng.choice(["UNION", "INTERSECT", "EXCEPT"])
        cols = ", ".join(rng.sample(DIMS + ["l_linenumber"], 2))
        return (
            f"SELECT {cols} FROM lineitem WHERE l_quantity < {rng.randint(10, 40)} "
            f"{op} SELECT {cols} FROM lineitem WHERE l_discount > 0.0{rng.randint(1, 8)}"
        )
    if kind == 2:  # scalar string/date functions
        return (
            f"SELECT l_orderkey, l_linenumber, "
            f"upper(l_returnflag) AS rf, length(l_linestatus) AS ls_len, "
            f"CAST(year(l_shipdate) AS INTEGER) AS yr, "
            f"CAST(month(l_shipdate) AS INTEGER) AS mth, "
            f"concat(l_returnflag, '_', l_linestatus) AS tag "
            f"FROM lineitem{_where(rng)}"
        )
    # windowed: exact-decimal cumulative sum. The fixture's
    # (l_orderkey, l_linenumber) is NOT unique (caught by this very
    # fuzzer, seed 20), so the order lists every numeric column —
    # any remaining ties are full duplicates in all output columns,
    # making the cumulative output deterministic either way.
    part = rng.choice(DIMS)
    order = "l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_partkey, l_suppkey"
    return (
        f"SELECT l_orderkey, l_linenumber, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY {part} "
        f"ORDER BY {order}) AS INTEGER) AS rn, "
        f"CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY {part} "
        f"ORDER BY {order} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_qty "
        f"FROM lineitem{_where(rng)}"
    )


@pytest.mark.parametrize("seed", range(24))
def test_random_sql_differential_v3(spark, duck, seed):
    q = gen_query_v3(seed)
    res = run_compare(
        spark, duck, f"fuzz3_{seed}", lambda s, sf: run_sql(s, sf, q), q, SF_SMOKE
    )
    assert res.ok, f"{q}\n{res!r}"


def gen_query_v4(seed: int) -> str:
    """Fourth wave: subqueries — correlated/uncorrelated EXISTS,
    NOT EXISTS, IN, NOT IN (NOT IN only over non-null keys: its
    three-valued NULL semantics are identical in both engines but a
    NULL in the list annihilates the result to empty, which would make
    every such seed vacuous), and scalar subqueries compared against
    aggregates — the decorrelation surface (SampleTest query3's shape,
    fuzzed)."""
    rng = random.Random(30_000 + seed)
    kind = rng.randrange(4)
    if kind == 0:  # correlated EXISTS / NOT EXISTS against orders
        neg = rng.choice(["", "NOT "])
        return (
            f"SELECT o_orderkey, o_orderpriority FROM orders WHERE {neg}EXISTS ("
            f"SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            f"AND l_quantity > {rng.randint(30, 49)})"
        )
    if kind == 1:  # IN / NOT IN over a filtered key set
        neg = rng.choice(["", "NOT "])
        return (
            f"SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
            f"WHERE l_orderkey {neg}IN ("
            f"SELECT o_orderkey FROM orders WHERE o_orderpriority = "
            f"'{rng.choice(['1-URGENT', '2-HIGH', '5-LOW'])}')"
        )
    if kind == 2:  # uncorrelated scalar subquery in a predicate
        frac = rng.choice(["0.5", "0.8", "1.0", "1.2"])
        return (
            f"SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
            f"WHERE CAST(l_extendedprice AS DECIMAL(18,2)) > {frac} * ("
            f"SELECT CAST(AVG(CAST(l_extendedprice AS DECIMAL(18,2))) "
            f"AS DECIMAL(18,2)) FROM lineitem)"
        )
    # correlated scalar subquery in SELECT (query3 shape)
    return (
        f"SELECT o_orderkey, "
        f"CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey "
        f"AND l_quantity > {rng.randint(10, 45)}) AS BIGINT) AS n_big "
        f"FROM orders WHERE o_orderkey % {rng.randint(2, 7)} = 0"
    )


@pytest.mark.parametrize("seed", range(20))
def test_random_sql_differential_v4(spark, duck, seed):
    q = gen_query_v4(seed)
    res = run_compare(
        spark, duck, f"fuzz4_{seed}", lambda s, sf: run_sql(s, sf, q), q, SF_SMOKE
    )
    assert res.ok, f"{q}\n{res!r}"


def gen_query_v5(seed: int) -> str:
    """Fifth wave: LATERAL correlated derived tables (per-group top-k
    with a randomized k/ordering), multiset EXCEPT ALL/INTERSECT ALL,
    and GROUPING SETS with grouping() disambiguation — the surfaces
    added in round 3, fuzzed with the same verbatim-SQL-on-both-engines
    contract."""
    rng = random.Random(40_000 + seed)
    kind = rng.randrange(3)
    if kind == 0:  # LATERAL top-k per customer
        k = rng.randint(1, 3)
        mod = rng.randint(7, 23)
        direction = rng.choice(["ASC", "DESC"])
        return (
            f"SELECT c.c_custkey, o.o_orderkey, o.o_totalprice "
            f"FROM customer c, LATERAL ("
            f"SELECT o_orderkey, o_totalprice FROM orders "
            f"WHERE o_custkey = c.c_custkey "
            f"ORDER BY o_totalprice {direction}, o_orderkey ASC LIMIT {k}) o "
            f"WHERE c.c_custkey % {mod} = 0"
        )
    if kind == 1:  # multiset set ops over projections with dup rows
        op = rng.choice(["EXCEPT ALL", "INTERSECT ALL"])
        a, b = rng.sample([2, 3, 4, 5], 2)
        return (
            f"SELECT l_linenumber, l_returnflag FROM lineitem "
            f"WHERE l_orderkey % {a} = 0 "
            f"{op} "
            f"SELECT l_linenumber, l_returnflag FROM lineitem "
            f"WHERE l_orderkey % {b} = 0"
        )
    # GROUPING SETS with grouping() flags
    return (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(grouping(l_returnflag) AS INTEGER) AS g_rf, "
        "CAST(grouping(l_linestatus) AS INTEGER) AS g_ls, "
        "COUNT(*) AS n "
        "FROM lineitem "
        f"WHERE l_quantity < {rng.randint(10, 50)} "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
    )


@pytest.mark.parametrize("seed", range(18))
def test_random_sql_differential_v5(spark, duck, seed):
    q = gen_query_v5(seed)
    res = run_compare(
        spark, duck, f"fuzz5_{seed}", lambda s, sf: run_sql(s, sf, q), q, SF_SMOKE
    )
    assert res.ok, f"{q}\n{res!r}"


def gen_query_v6(seed: int) -> str:
    """Sixth wave: NULLS FIRST/LAST ordering (randomized direction and
    null placement over a partially-NULL expression), TRY_CAST over
    mixed-validity strings, and GROUP BY ALL — pinning the parity
    points of the round's SQL additions under randomization."""
    rng = random.Random(50_000 + seed)
    kind = rng.randrange(3)
    if kind == 0:  # explicit null ordering, both directions
        direction = rng.choice(["ASC", "DESC"])
        nulls = rng.choice(["FIRST", "LAST"])
        mod = rng.randint(5, 12)
        return (
            f"SELECT l_orderkey, l_linenumber, "
            f"CASE WHEN l_orderkey % {mod} = 0 THEN NULL "
            f"ELSE l_linenumber END AS v "
            f"FROM lineitem "
            f"ORDER BY v {direction} NULLS {nulls}, l_orderkey, l_linenumber "
            f"LIMIT {rng.randint(20, 80)}"
        )
    if kind == 1:  # TRY_CAST over sometimes-numeric strings
        mod = rng.randint(2, 5)
        return (
            f"SELECT l_orderkey, l_linenumber, "
            f"TRY_CAST(CASE WHEN l_linenumber % {mod} = 0 "
            f"THEN CAST(l_orderkey AS STRING) ELSE 'x' END AS BIGINT) AS num "
            f"FROM lineitem WHERE l_orderkey % 7 = 0"
        )
    # GROUP BY ALL with a randomized dim pair
    d1, d2 = random.Random(seed).sample(
        ["l_returnflag", "l_linestatus", "l_linenumber"], 2
    )
    return (
        f"SELECT {d1}, {d2}, COUNT(*) AS n, "
        f"CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty "
        f"FROM lineitem WHERE l_quantity < {rng.randint(20, 50)} "
        f"GROUP BY ALL"
    )


@pytest.mark.parametrize("seed", range(15))
def test_random_sql_differential_v6(spark, duck, seed):
    q = gen_query_v6(seed)
    res = run_compare(
        spark, duck, f"fuzz6_{seed}", lambda s, sf: run_sql(s, sf, q), q, SF_SMOKE
    )
    assert res.ok, f"{q}\n{res!r}"


# ---------------------------------------------------------------------------
# wave 7: recursive CTEs — random linear recursions (bounded frontier,
# integer-exact arithmetic) run VERBATIM on both engines. Three shapes:
# integer series folds, per-entity iteration over customer balances,
# and a recursive walk joined back to a real table.
# ---------------------------------------------------------------------------


def gen_query_v7(seed: int) -> str:
    rng = random.Random(seed)
    shape = rng.randrange(3)
    if shape == 0:
        # integer series with a random affine step, folded at the end
        start = rng.randint(0, 5)
        step = rng.randint(1, 4)
        cap = rng.randint(20, 60)
        return (
            f"WITH RECURSIVE s(n) AS ("
            f"SELECT {start} UNION ALL SELECT n + {step} FROM s WHERE n < {cap}) "
            f"SELECT COUNT(*) AS n_rows, CAST(SUM(n) AS BIGINT) AS total, "
            f"MAX(n) AS last_n FROM s"
        )
    if shape == 1:
        # per-entity iteration: integer-cents halving with random floor
        mod = rng.choice([40, 50, 60])
        floor_cents = rng.choice([5000, 10000, 20000])
        return (
            f"WITH RECURSIVE pay(c_custkey, step, bal) AS ("
            f"SELECT c_custkey, 0, CAST(ROUND(c_acctbal * 100) AS BIGINT) "
            f"FROM customer WHERE c_custkey % {mod} = 0 AND c_acctbal > 0 "
            f"UNION ALL SELECT c_custkey, step + 1, CAST(FLOOR(bal / 2.0) AS BIGINT) "
            f"FROM pay WHERE bal >= {floor_cents}) "
            f"SELECT c_custkey, COUNT(*) AS n_steps, MIN(bal) AS final_bal "
            f"FROM pay GROUP BY c_custkey"
        )
    # recursive key walk joined to customer (frontier never grows)
    mult = rng.choice([2, 3])
    depth = rng.randint(5, 25)
    roots = rng.choice([20, 30, 50])
    return (
        f"WITH RECURSIVE walk(root, node, depth) AS ("
        f"SELECT c_custkey, c_custkey, 0 FROM customer "
        f"WHERE c_custkey <= {roots} "
        f"UNION ALL SELECT w.root, c.c_custkey, w.depth + 1 "
        f"FROM walk w JOIN customer c ON c.c_custkey = w.node * {mult} "
        f"WHERE w.depth < {depth}) "
        f"SELECT root, COUNT(*) AS n_nodes, MAX(depth) AS max_depth "
        f"FROM walk GROUP BY root"
    )


@pytest.mark.parametrize("seed", range(700, 712))
def test_random_sql_differential_v7_recursive(spark, duck, seed):
    q = gen_query_v7(seed)
    res = run_compare(
        spark, duck, f"fuzz7_{seed}", lambda s, sf: run_sql(s, sf, q), q, SF_SMOKE
    )
    assert res.ok, f"{q}\n{res!r}"
