"""Declarative data-quality expectations — the constraint layer the
reference engine cannot express (its executor has no NULL support at
all, /root/reference/src/headers/table.cpp:53-57 throws on empty
dates; a modern pipeline needs the opposite: measure violations,
don't crash).

``check_expectations`` evaluates a rule list against a frame and
returns one row per rule: (rule, n_violations, n_rows, passed) —
the Great-Expectations/Delta-constraints shape as a pure DataFrame
program.

Scale design: every row-local rule (not_null / in_range / in_set /
regex / custom predicate) compiles to ONE conditional-sum column of a
single aggregation pass — checking 50 rules costs one scan, not 50.
Only the two genuinely relational rules leave that pass:
``unique`` (one groupBy on the key — the same shuffle a dedup would
pay) and ``ref_integrity`` (an anti-join that broadcasts when the
dimension is small). Nothing collects to the driver beyond the
per-rule summary row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["check_expectations"]


def _violation_expr(rule: dict) -> F.Column:
    """Boolean column: TRUE when the row VIOLATES the rule."""
    kind = rule["type"]
    if kind == "not_null":
        return F.col(rule["col"]).isNull()
    if kind == "in_range":
        c = F.col(rule["col"])
        bad = F.lit(False)
        if "lo" in rule:
            bad = bad | (c < F.lit(rule["lo"]))
        if "hi" in rule:
            bad = bad | (c > F.lit(rule["hi"]))
        # NULLs are not range violations (use not_null to catch them);
        # three-valued logic would otherwise silently drop them from
        # both the pass and fail counts
        return F.coalesce(bad, F.lit(False))
    if kind == "in_set":
        return F.coalesce(
            ~F.col(rule["col"]).isin(list(rule["values"])), F.lit(False)
        )
    if kind == "regex":
        return F.coalesce(
            ~F.col(rule["col"]).rlike(rule["pattern"]), F.lit(False)
        )
    if kind == "predicate":
        # rule["expr"]: SQL boolean the row must SATISFY
        return F.coalesce(~F.expr(rule["expr"]), F.lit(False))
    raise ValueError(f"unknown expectation type: {kind}")


def _rule_name(rule: dict) -> str:
    kind = rule["type"]
    if kind == "unique":
        return f"unique({','.join(rule['cols'])})"
    if kind == "ref_integrity":
        return f"ref_integrity({rule['col']})"
    if kind == "predicate":
        return f"predicate({rule['expr']})"
    if kind == "in_range":
        return f"in_range({rule['col']})"
    if kind == "in_set":
        return f"in_set({rule['col']})"
    if kind == "regex":
        return f"regex({rule['col']})"
    return f"{kind}({rule['col']})"


def check_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns (rule, n_violations,
    n_rows, passed) with one row per rule.

    Rule forms:
      {"type": "not_null", "col": c}
      {"type": "in_range", "col": c, "lo": x, "hi": y}   # either bound optional
      {"type": "in_set", "col": c, "values": [...]}
      {"type": "regex", "col": c, "pattern": r}
      {"type": "predicate", "expr": "<sql the row must satisfy>"}
      {"type": "unique", "cols": [c, ...]}
      {"type": "ref_integrity", "col": c, "ref": DataFrame, "ref_col": rc}
      {"type": "k_anonymity", "cols": [c, ...], "k": n}
    """
    spark = df.sparkSession
    row_rules = [
        r
        for r in rules
        if r["type"] not in ("unique", "ref_integrity", "k_anonymity")
    ]
    results = []

    # one aggregation pass answers every row-local rule AND the row
    # count the relational rules below reuse — the frame is scanned
    # once for N rules, plus one job per unique/ref rule
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(row_rules):
        aggs.append(F.sum(_violation_expr(r).cast("long")).alias(f"__v_{i}"))
    row = df.agg(*aggs).head()
    n = int(row["__n"])
    for i, r in enumerate(row_rules):
        v = int(row[f"__v_{i}"] or 0)
        results.append((_rule_name(r), v, n, v == 0))

    for r in rules:
        if r["type"] == "unique":
            cols = list(r["cols"])
            dup = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") > 1)
                .agg(
                    F.coalesce(F.sum("__c"), F.lit(0)).alias("v"),
                )
                .head()
            )
            v = int(dup.v)
            results.append((_rule_name(r), v, n, v == 0))
        elif r["type"] == "k_anonymity":
            # privacy guard: every quasi-identifier combination must
            # describe at least k individuals — rows in smaller groups
            # are re-identifiable and count as violations. Same single
            # groupBy shape as ``unique`` (which is k_anonymity's
            # mirror image: unique wants groups == 1, k-anon wants
            # groups >= k).
            cols, k = list(r["cols"]), int(r["k"])
            small = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") < k)
                .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("v"))
                .head()
            )
            v = int(small.v)
            results.append(
                (f"k_anonymity({','.join(cols)},k={k})", v, n, v == 0)
            )
        elif r["type"] == "ref_integrity":
            ref = r["ref"].select(
                F.col(r["ref_col"]).alias(r["col"])
            ).distinct()
            orphans = (
                df.filter(F.col(r["col"]).isNotNull())
                .join(F.broadcast(ref), on=r["col"], how="left_anti")
                .count()
            )
            results.append((_rule_name(r), int(orphans), n, orphans == 0))

    return spark.createDataFrame(
        results, "rule string, n_violations long, n_rows long, passed boolean"
    )


def table_checksum(df: DataFrame, cols: list[str] | None = None):
    """Order-independent content checksum: xxhash64 of each row's
    column struct, summed exactly in DECIMAL(38,0) (no int64 overflow
    at any row count, no ANSI-mode throw). Equal layouts, partition
    counts, and row orders of the same data produce the SAME value;
    any mutated/dropped/duplicated row changes it.

    The cross-copy integrity check a migration needs: run on source
    and target, compare two numbers — no sort, no join, one
    aggregation pass each side. Returns (n_rows, checksum) as a
    one-row DataFrame.
    """
    cols = cols or df.columns
    h = F.xxhash64(F.struct(*[F.col(c) for c in cols]))
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h.cast("decimal(38,0)")).alias("checksum"),
    )


def portable_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Cross-ENGINE content checksum: like :func:`table_checksum` but
    computable identically outside Spark (DuckDB, Postgres, anything
    with md5) — the two-number integrity handshake for migrations
    BETWEEN systems, where xxhash64 doesn't exist on the other side.

    Each row renders to ``'|'``-joined strings (caller picks columns
    whose string forms are engine-stable: integers, strings, exact
    decimals — never raw doubles), md5's, and keeps the first 12 hex
    digits (48 bits) as an integer. The checksum is the exact
    DECIMAL(38,0) sum — order- and partition-independent, no overflow
    at any row count, and any mutated/dropped/duplicated row moves it.
    One aggregation pass; the hash stays in whole-stage codegen.
    """
    # explicit NULL sentinel: concat_ws SKIPS nulls in both engines,
    # which would alias ('a', NULL) with ('a') — coalesce keeps the
    # column positions distinguishable
    joined = F.concat_ws(
        "|",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in cols],
    )
    h = F.conv(F.substring(F.md5(joined), 1, 12), 16, 10).cast(
        "decimal(38,0)"
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).alias("checksum"),
    )
