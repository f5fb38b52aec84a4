"""Change-data-capture primitives: snapshot diff and MERGE-style upsert.

The reference engine is read-only (CSV in, CSV out; no UPDATE/DELETE —
/root/reference/README.md:65-81 lists only SELECT). A lakehouse
pipeline needs both directions: diff two table snapshots into a change
feed, and apply a change feed onto a base table (SCD-1 MERGE). Both are
expressed as pure DataFrame joins so Catalyst picks the physical
strategy (broadcast when one side is small, shuffled hash otherwise —
AQE decides at runtime from actual sizes).

Scale notes: both operators are a single equi-join on the key columns —
one shuffle each side, skew handled by AQE skew-join splitting. No
window, no sort, no driver materialization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of the same logical table into a change feed.

    Returns one row per key whose state changed, with ``change_type``
    ∈ {'I' (insert: key only in ``new``), 'D' (delete: key only in
    ``old``), 'U' (update: key in both, compared columns differ)}.
    Unchanged keys are dropped. Comparison is null-safe (NULL == NULL
    counts as unchanged, via struct equality with eqNullSafe).
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    keys = list(keys)

    o = old.select(
        *keys, F.struct(*[F.col(c) for c in compare_cols]).alias("__o")
    )
    n = new.select(
        *keys, F.struct(*[F.col(c) for c in compare_cols]).alias("__n")
    )
    j = o.join(n, on=keys, how="full")
    change = (
        F.when(F.col("__o").isNull(), F.lit("I"))
        .when(F.col("__n").isNull(), F.lit("D"))
        .when(~F.col("__o").eqNullSafe(F.col("__n")), F.lit("U"))
    )
    out = j.withColumn("change_type", change).filter(
        F.col("change_type").isNotNull()
    )
    # Post-image for I/U, pre-image for D — what a downstream applier needs.
    picked = F.when(F.col("change_type") == "D", F.col("__o")).otherwise(
        F.col("__n")
    )
    return out.select(
        *keys,
        F.col("change_type"),
        *[picked.getField(c).alias(c) for c in compare_cols],
    )


def merge_upsert(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """SCD-1 MERGE: source rows win on key match, new keys are appended.

    Equivalent to ``MERGE INTO target USING source ON keys WHEN MATCHED
    THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``. Pure-DataFrame:
    target ANTI-JOIN source (survivors) UNION ALL source. Column sets
    must match; the result keeps target's column order.
    """
    keys = list(keys)
    survivors = target.join(source, on=keys, how="left_anti")
    return survivors.unionByName(source.select(*target.columns))


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from a timestamped
    change feed: one row per (key, attribute-state) validity interval.

    Consecutive rows of a key whose tracked attributes are identical
    are collapsed into one interval (null-safe comparison), so the
    output is the minimal interval set. Each interval carries
    ``valid_from`` (first change ts), ``valid_to`` (next state's ts,
    NULL while current) and ``is_current``.

    The reference engine has no notion of mutation at all
    (/root/reference/README.md:65-81 — SELECT only); this is the
    lakehouse dimension-build the reference's users would script
    around it. All three windows below are PARTITIONED BY the key —
    per-key state only, no global window, so the plan is one shuffle
    on the key and scales with the number of keys.

    ``tiebreak`` orders rows that share the same ``ts_col`` within a
    key (pass a unique id column to make the history deterministic).
    """
    keys = list(keys)
    attr_cols = list(attr_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    state = F.struct(*[F.col(c) for c in attr_cols])
    marked = changes.withColumn(
        "__is_start",
        # first row of the key, or attribute state differs from the
        # previous row (null-safe: NULL==NULL is "unchanged")
        F.lag(state).over(w).isNull()
        | ~F.lag(state).over(w).eqNullSafe(state),
    )
    starts = marked.filter(F.col("__is_start")).drop("__is_start")
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return starts.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def apply_changes(
    target: DataFrame, changes: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Apply a ``snapshot_diff``-shaped change feed onto a base table.

    Deletes remove keys, inserts/updates upsert the post-image. The
    composition ``apply_changes(old, snapshot_diff(old, new, k), k)``
    reproduces ``new`` exactly — tested in tests/test_cdc.py.
    """
    keys = list(keys)
    deletes = changes.filter(F.col("change_type") == "D").select(*keys)
    upserts = changes.filter(F.col("change_type") != "D").drop("change_type")
    kept = target.join(deletes, on=keys, how="left_anti")
    return merge_upsert(kept, upserts.select(*target.columns), keys)


def pit_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    fact_ts: str,
    attr_cols: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Point-in-time enrichment: attach to each fact row the SCD2
    dimension state that was valid AT the fact's timestamp — the
    feature-store join that prevents label leakage (training rows must
    see yesterday's dimension, not today's).

    Because ``scd2_history`` intervals tile (valid_to == next row's
    valid_from, verified in tests), "state at ts" is exactly the
    latest ``valid_from`` <= ts — a backward as-of join on the key,
    with no residual interval filter needed. One shuffle on the key,
    same plan as ``operators.asof.asof_join`` (which implements it).
    """
    from .asof import asof_join

    return asof_join(
        facts,
        dim,
        on=key,
        left_ts=fact_ts,
        right_ts="valid_from",
        right_values=list(attr_cols),
        how=how,
    )


def state_durations(
    dim: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    horizon,
) -> DataFrame:
    """Duration-weighted state statistics from SCD2 intervals: per
    (key, state) total seconds spent in that state, open intervals
    closed at ``horizon`` (the "as of now" clock — pass the feed's max
    timestamp or a wall-clock literal).

    "How long was each user in state X" is the canonical SCD2
    consumer after point-in-time joins. Interval seconds are integer
    epoch differences — exact, order-independent sums, so the whole
    computation value-hashes against SQL. One groupBy on
    (key, state); no windows at all (the intervals already encode the
    ordering work).
    """
    keys, attr_cols = list(keys), list(attr_cols)
    end = F.coalesce(F.col("valid_to"), F.lit(horizon).cast("timestamp"))
    dur = F.unix_timestamp(end) - F.unix_timestamp(F.col("valid_from"))
    return (
        dim.groupBy(*keys, *attr_cols)
        .agg(
            F.sum(dur).alias("total_s"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


def merge_apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a full I/U/D change feed onto a base table — the complete
    ``MERGE INTO`` surface (``WHEN MATCHED AND op='D' THEN DELETE /
    WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED AND op<>'D' THEN
    INSERT *``), as two joins.

    ``changes`` carries ``target``'s columns plus ``op_col`` with
    values ``'I'``/``'U'``/``'D'``. Semantics (one change per key —
    feed compaction, e.g. keep-last by timestamp, is the caller's
    step, see ``snapshot_diff``):

    - ``D``: the key's row is removed from the result.
    - ``U``/``I``: the change row replaces/creates the key's row
      (upsert — ``U`` on an absent key inserts, ``I`` on a present
      key replaces, matching Delta/Iceberg MERGE-star behavior).

    Plan shape: target ANTI-JOIN all-change-keys (rows the feed never
    touches) UNION ALL the feed's non-delete rows. One equi-join
    shuffle; the union adds none. Deletes cost nothing beyond the
    anti-join that upserts already need.
    """
    keys = list(keys)
    untouched = target.join(
        changes.select(*keys), on=keys, how="left_anti"
    )
    upserts = changes.filter(F.col(op_col) != "D").select(*target.columns)
    return untouched.unionByName(upserts)
