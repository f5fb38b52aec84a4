"""Native recursive CTEs (``WITH RECURSIVE``) — verbatim-SQL parity.

Spark 4.1 executes recursive CTEs natively (UnionLoop iterations of the
recursion step), and DuckDB has supported them forever, so these
queries run the SAME SQL text on both engines — the strongest form of
frontend parity this repo registers (same convention as
``sql_nulls_ordering`` / ``sql_group_by_all``).

The reference has no recursion at all (its SQL surface is
/root/reference/README.md:65-81 — SELECT/WHERE/aggregates/ORDER BY);
this is a §2.3-style gap the Spark engine gets natively. The iterative
ALGORITHMS that genuinely need distributed state (connected components,
BFS, PageRank) keep their driver-loop implementations in
``functions/dedup.py`` / ``functions/graph.py`` — recursive SQL is the
frontend for small/medium recursion depth, not a replacement for them:
each recursion step is a full plan iteration, so a 100-step recursion
over a 100 TB base relation is 100 joins. The three shapes here are the
ones that stay cheap at any scale:

1. spine generation (12-row month spine -> broadcast to the fact join),
2. hierarchy walk where each step is a small equi-join against an
   indexed/bucketable key (frontier stays bounded),
3. per-entity numeric iteration (frontier only shrinks; rows are
   independent, so every step is embarrassingly parallel).

All arithmetic in the recursion steps is integer / exact so the two
engines cannot drift (same float-determinism convention as
``queries/relational.py``).
"""

from __future__ import annotations

from ..catalog import run_sql
from .registry import register

# 1) Spine generation: recursive 12-row month sequence, then a range
# join onto orders. At scale the spine side is trivially broadcast;
# the fact side's o_orderdate predicate is sargable per month bucket.
_RECURSIVE_MONTH_SPINE = """\
WITH RECURSIVE m(mon) AS (
    SELECT 1
    UNION ALL
    SELECT mon + 1 FROM m WHERE mon < 12
)
SELECT m.mon,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))),
                     CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM m
LEFT JOIN orders o
  ON o.o_orderdate >= CAST(make_date(1995, m.mon, 1) AS TIMESTAMP)
 AND o.o_orderdate < CAST(CASE WHEN m.mon = 12 THEN make_date(1996, 1, 1)
                               ELSE make_date(1995, m.mon + 1, 1) END
                          AS TIMESTAMP)
GROUP BY m.mon
ORDER BY m.mon"""


@register(
    "sql_recursive_month_spine",
    oracle=_RECURSIVE_MONTH_SPINE,
    tags=("sql", "recursive", "join", "aggregate"),
)
def sql_recursive_month_spine(spark, sf_dir):
    # Same SQL text verbatim on Spark and DuckDB. A LEFT join from the
    # spine keeps zero-order months (the gap-fill semantics
    # daily_orders_gapfilled builds with sequence+explode — here the
    # spine comes from recursion instead).
    return run_sql(spark, sf_dir, _RECURSIVE_MONTH_SPINE)


# 2) Hierarchy walk: synthetic doubling-key forest over customer
# (edge c -> 2c while 2c exists). Chains from the odd roots; each
# recursion step is one equi-join on the customer key — the shape that
# scales because the frontier never grows (each node has <= 1 child)
# and the join key is the table's natural bucketing key.
_RECURSIVE_CUSTOMER_CHAIN = """\
WITH RECURSIVE chain(root, node, depth) AS (
    SELECT c_custkey AS root, c_custkey AS node, 0 AS depth
    FROM customer
    WHERE c_custkey % 2 = 1 AND c_custkey <= 40
    UNION ALL
    SELECT /*+ BROADCAST(ch) */ ch.root, c.c_custkey, ch.depth + 1
    FROM chain ch
    JOIN customer c ON c.c_custkey = ch.node * 2
    WHERE ch.depth < 30
)
SELECT root,
       COUNT(*) AS chain_len,
       MAX(depth) AS max_depth,
       MAX(node) AS deepest_key
FROM chain
GROUP BY root
ORDER BY root"""


@register(
    "sql_recursive_customer_chain",
    oracle=_RECURSIVE_CUSTOMER_CHAIN,
    tags=("sql", "recursive", "join", "hierarchy"),
)
def sql_recursive_customer_chain(spark, sf_dir):
    # org-chart / BOM-walk shape: recursive self-join until the child
    # key leaves the table. Depth is bounded by log2(max key) — ~11
    # levels at sf0.01, and only ~40 roots, so every iteration is a
    # tiny broadcast join against the bucketable customer key.
    return run_sql(spark, sf_dir, _RECURSIVE_CUSTOMER_CHAIN)


# 3) Per-entity numeric iteration: halve each selected customer's
# balance (integer cents, FLOOR — exact in both engines) until it
# drops under $100. The frontier only ever shrinks, rows are
# independent, and each step is a Filter+Project over the previous
# step — no join at all, so it parallelizes perfectly.
_RECURSIVE_BALANCE_PAYDOWN = """\
WITH RECURSIVE pay(c_custkey, step, bal_cents) AS (
    SELECT c_custkey, 0 AS step,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
    WHERE c_custkey % 50 = 0 AND c_acctbal > 0
    UNION ALL
    SELECT c_custkey, step + 1,
           CAST(FLOOR(bal_cents / 2.0) AS BIGINT)
    FROM pay
    WHERE bal_cents >= 10000
)
SELECT c_custkey,
       COUNT(*) AS n_steps,
       MIN(bal_cents) AS final_cents
FROM pay
GROUP BY c_custkey
ORDER BY c_custkey"""


@register(
    "sql_recursive_balance_paydown",
    oracle=_RECURSIVE_BALANCE_PAYDOWN,
    tags=("sql", "recursive", "iteration"),
)
def sql_recursive_balance_paydown(spark, sf_dir):
    # The loan-amortization shape: iterate a per-row formula until a
    # predicate fails. ROUND/FLOOR on integer cents keeps every
    # intermediate exact (< 2^53), so value hashes match bit-for-bit.
    return run_sql(spark, sf_dir, _RECURSIVE_BALANCE_PAYDOWN)


# 4) Forest rollup: every supplier key walks its digit-prefix ancestor
# chain (up -> floor(up/10)) to its single-digit root, then the forest
# aggregates per root — the hierarchy-rollup shape (org charts, chart
# of accounts) where recursion depth is log(keyspace), so a 100 TB
# dimension walks in ~12 bounded-frontier steps. FLOOR(x / 10.0) is
# exact for any BIGINT in range: IEEE division is correctly rounded,
# and a true quotient >= 0.1 away from the next integer cannot round
# across it.
_RECURSIVE_FOREST_ROLLUP = """\
WITH RECURSIVE walk(node, up, depth) AS (
    SELECT s_suppkey, s_suppkey, 0 FROM supplier
    UNION ALL
    SELECT node, CAST(FLOOR(up / 10.0) AS BIGINT), depth + 1
    FROM walk WHERE up >= 10
),
roots AS (
    SELECT node, up AS root, depth FROM walk WHERE up <= 9
)
SELECT r.root,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MAX(r.depth) AS INTEGER) AS max_depth,
       CAST(SUM(CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS bal_cents
FROM roots r
JOIN supplier s ON s.s_suppkey = r.node
GROUP BY r.root
ORDER BY r.root"""


@register(
    "sql_recursive_forest_rollup",
    oracle=_RECURSIVE_FOREST_ROLLUP,
    tags=("sql", "recursive", "join", "aggregate"),
)
def sql_recursive_forest_rollup(spark, sf_dir):
    # Same SQL text verbatim on Spark and DuckDB (shape 4: rollup of a
    # whole forest to its roots — distinct from the chain walk, which
    # follows ONE path, and from the paydown, which iterates a value).
    return run_sql(spark, sf_dir, _RECURSIVE_FOREST_ROLLUP)
