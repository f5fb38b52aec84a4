"""Materialized views with re-aggregation rewrite — answer a coarser
aggregate question from a stored partial aggregate instead of the
fact table.

The warehouse classic (Calcite/Snowflake-style MV rewrite), cut to
its load-bearing core: a view grouped on G storing re-aggregable
measures can answer ANY question grouped on G' ⊆ G with measures
derivable from the stored ones —

    sum   <- SUM(sum)        count <- SUM(count)
    min   <- MIN(min)        max   <- MAX(max)
    avg   <- SUM(sum)/SUM(count)   (never stored: avg is not
                                    re-aggregable, its parts are)

At 100 TB the fact table is the expensive thing; the MV is
(cardinality of G) rows. A question the rewrite accepts costs a scan
of the MV — orders of magnitude less I/O — and returns EXACTLY the
full recompute (integer measures re-sum exactly; the driver oracle
value-hashes this). A question it cannot prove answerable raises
instead of silently recomputing, so callers choose the fallback
explicitly.

Maintenance composes with the rest of the lake surface:
``operators/incremental.py`` refreshes a stored rollup from a delta,
and ``sources/lake.py`` versioning gives MV snapshots time travel.

The reference has no GROUP BY at all (no HASH_GROUP_BY case in
/root/reference/src/main.cpp:636-674), let alone stored rollups.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["define_mv", "mv_answer", "mv_refresh", "mv_sync_txlog"]

_STORE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def define_mv(
    fact: DataFrame,
    path: str,
    group_cols: list[str],
    measures: dict[str, tuple[str, str]],
    synced_version: int | None = None,
) -> None:
    """Materialize ``fact`` grouped on ``group_cols``.

    ``measures`` maps stored column name -> (fn, source_col) with fn in
    {sum, count, min, max}; ``count`` counts non-null source values.
    Integer-typed sums stay exact (re-aggregation is associative); for
    doubles prefer a scaled BIGINT source column if the consumer needs
    value-hash equality with a recompute.

    The rollup is one map-side-combined aggregation; metadata lands in
    a ``_mv.json`` sidecar (underscore: invisible to table scans).

    When ``fact`` is a transaction-log snapshot
    (``sources/txlog.read_snapshot``), pass the snapshot's txlog
    version as ``synced_version`` so :func:`mv_sync_txlog` knows where
    the change-feed fold starts. Without it, a define-then-sync
    sequence would replay the defining commits and double-count every
    sum/count — mv_sync_txlog therefore refuses to run on a view whose
    sidecar lacks the anchor.
    """
    aggs = []
    for out, (fn, src) in measures.items():
        if fn == "sum":
            aggs.append(F.sum(src).alias(out))
        elif fn == "count":
            aggs.append(F.count(src).alias(out))
        elif fn == "min":
            aggs.append(F.min(src).alias(out))
        elif fn == "max":
            aggs.append(F.max(src).alias(out))
        else:
            raise ValueError(f"measure fn must be sum/count/min/max, got {fn}")
    fact.groupBy(*group_cols).agg(*aggs).write.mode("overwrite").parquet(path)
    meta = {
        "group_cols": list(group_cols),
        "measures": {k: list(v) for k, v in measures.items()},
    }
    if synced_version is not None:
        meta["synced_version"] = int(synced_version)
    with open(os.path.join(path, "_mv.json"), "w", encoding="utf-8") as fh:
        json.dump(meta, fh)


def _recover_interrupted_swap(path: str) -> None:
    """A promote that crashed between its two renames leaves nothing at
    ``path`` and the previous view stranded at ``path__old`` — roll it
    back before reading or re-promoting."""
    old = path + "__old"
    if not os.path.exists(path) and os.path.isdir(old):
        os.replace(old, path)


def _load_meta(path: str) -> dict:
    _recover_interrupted_swap(path)
    with open(os.path.join(path, "_mv.json"), encoding="utf-8") as fh:
        return json.load(fh)


def _promote_staged(staged: str, path: str, meta: dict) -> None:
    """Swap a freshly-written view into place (the ``_promote_dir``
    rename-aside pattern from ``streaming/sinks.py``): the sidecar is
    written INTO the staged directory first, so every directory that
    ever sits at ``path`` is complete with its ``_mv.json``. The swap
    is two renames, not one atomic op (POSIX ``os.replace`` cannot
    rename over a non-empty directory), so a crash BETWEEN them leaves
    ``path`` briefly absent with the old view intact at ``path__old``
    — ``_load_meta`` rolls that window back on the next read."""
    import shutil

    with open(os.path.join(staged, "_mv.json"), "w", encoding="utf-8") as fh:
        json.dump(meta, fh)
    _recover_interrupted_swap(path)
    old = path + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.replace(path, old)
    os.replace(staged, path)
    shutil.rmtree(old, ignore_errors=True)


def mv_answer(
    spark: SparkSession,
    path: str,
    group_cols: list[str],
    want: dict[str, tuple[str, str]],
) -> DataFrame:
    """Answer ``SELECT group_cols, want... GROUP BY group_cols`` from
    the MV at ``path``.

    ``want`` maps output column -> (fn, source_col) where fn adds
    ``avg`` to the storable set. Raises ValueError with the precise
    containment violation when the MV cannot prove the answer —
    requested groups not a subset of the view's, or a measure whose
    parts were not stored.
    """
    meta = _load_meta(path)
    mv_groups = set(meta["group_cols"])
    stored = {
        (fn, src): out for out, (fn, src) in meta["measures"].items()
    }
    missing = [g for g in group_cols if g not in mv_groups]
    if missing:
        raise ValueError(
            f"mv_answer: group cols {missing} not in the view's grouping "
            f"{sorted(mv_groups)} — the MV is too coarse for this question"
        )

    aggs = []
    for out, (fn, src) in want.items():
        if fn in ("sum", "count", "min", "max"):
            key = (fn, src)
            if key not in stored:
                raise ValueError(
                    f"mv_answer: {fn}({src}) not derivable — the view "
                    f"stores {sorted(meta['measures'])}"
                )
            aggs.append(_STORE[fn](stored[key]).alias(out))
        elif fn == "avg":
            s, c = ("sum", src), ("count", src)
            if s not in stored or c not in stored:
                raise ValueError(
                    f"mv_answer: avg({src}) needs stored sum({src}) AND "
                    f"count({src})"
                )
            aggs.append(
                (
                    F.sum(stored[s]).cast("double")
                    / F.sum(stored[c]).cast("double")
                ).alias(out)
            )
        else:
            raise ValueError(f"unsupported measure fn: {fn}")
    return spark.read.parquet(path).groupBy(*group_cols).agg(*aggs)


def mv_refresh(spark: SparkSession, path: str, delta: DataFrame) -> None:
    """Incrementally fold a DELTA of new fact rows into a materialized
    view — the maintenance half of the MV story (``define_mv`` builds,
    ``mv_answer`` rewrites, this keeps the view current without
    touching history).

    The delta is rolled up with the view's own grouping/measures (one
    aggregation over the delta only), then merged group-wise: sums and
    counts ADD, mins/maxes FOLD — the same associativity that makes
    ``mv_answer``'s re-aggregation exact, applied across time instead
    of across groups. Cost is O(delta + |view|), never O(history).
    Refresh-then-answer equals define-on-full-history exactly (tested).

    Caveat (inherent to partial-aggregate views, not this code): a
    DELETE/UPDATE delta cannot be folded into min/max (not invertible);
    append-only deltas are the contract, matching the reference's
    append-only world and the training-data pipelines this engine
    targets.
    """
    meta = _load_meta(path)
    group_cols = meta["group_cols"]
    measures = {k: tuple(v) for k, v in meta["measures"].items()}
    aggs = []
    for out, (fn, src) in measures.items():
        if fn == "sum":
            aggs.append(F.sum(src).alias(out))
        elif fn == "count":
            aggs.append(F.count(src).alias(out))
        elif fn == "min":
            aggs.append(F.min(src).alias(out))
        elif fn == "max":
            aggs.append(F.max(src).alias(out))
    d = delta.groupBy(*group_cols).agg(*aggs)
    old = spark.read.parquet(path)
    merged_aggs = []
    for out, (fn, _src) in measures.items():
        if fn in ("sum", "count"):
            merged_aggs.append(F.sum(out).alias(out))
        elif fn == "min":
            merged_aggs.append(F.min(out).alias(out))
        elif fn == "max":
            merged_aggs.append(F.max(out).alias(out))
    merged = old.unionByName(d).groupBy(*group_cols).agg(*merged_aggs)
    # write-then-swap: never overwrite a lazy scan's own input files
    staged = f"{path}__staged"
    merged.write.mode("overwrite").parquet(staged)
    _promote_staged(staged, path, _load_meta(path))


def mv_sync_txlog(
    spark: SparkSession,
    path: str,
    table: str,
    from_version: int | None = None,
    broadcast_touched_max: int = 100_000,
) -> int:
    """Incremental view maintenance DRIVEN BY THE TRANSACTION LOG: fold
    the txlog change feed (``sources/txlog.tx_changes``) since the last
    sync into the stored rollup — inserts AND deletes — and remember
    the synced version in the view's sidecar. Idempotent: re-running
    without new commits is a no-op.

    The classic IVM algebra over a partial-aggregate view:

    - ``sum``/``count`` are self-invertible — fold the change rows with
      SIGNED weight (+1 insert, -1 delete) and ADD group-wise;
    - groups whose maintained row count reaches zero are dropped (the
      view must store a ``count`` measure for liveness — enforced);
    - ``min``/``max`` are NOT invertible under deletes, so groups a
      delete touched are recomputed from the table's CURRENT snapshot —
      cost bounded by the touched groups' rows, never table history;
      insert-only syncs fold min/max associatively with no recompute.

    Cost is O(changed rows + |view| + rows of delete-touched groups).
    A full recompute is O(table) — at 100 TB with a trickle of CDC
    commits this is the difference between a view you can afford to
    keep fresh and one you cannot. Sync-then-answer equals
    define-on-current-snapshot exactly (driver-oracled).

    Returns the txlog version the view is now synced to.
    """
    from ..sources import txlog

    meta = _load_meta(path)
    group_cols = meta["group_cols"]
    measures = {k: tuple(v) for k, v in meta["measures"].items()}
    count_cols = [k for k, (fn, _s) in measures.items() if fn == "count"]
    if not count_cols:
        raise ValueError(
            "mv_sync_txlog needs a stored count measure to detect "
            "emptied groups — add one to define_mv's measures"
        )
    if from_version is not None:
        synced = int(from_version)
    elif "synced_version" in meta:
        synced = int(meta["synced_version"])
    else:
        raise ValueError(
            "mv_sync_txlog: the view's _mv.json has no synced_version "
            "anchor — define_mv was not told which txlog version its "
            "snapshot came from. Syncing from version 0 would replay "
            "the defining commits and double-count every sum/count. "
            "Pass synced_version= to define_mv (or from_version= here)."
        )
    cur = (txlog.log_versions(table) or [0])[-1]
    if cur <= synced:
        return synced
    ch = txlog.tx_changes(spark, table, from_version=synced,
                          to_version=cur)
    # Delta CDF labels: row-adding changes (+1) vs row-removing (-1);
    # an update's pre/post images cancel where nothing changed and
    # shift the aggregate where something did
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    has_minmax = any(fn in ("min", "max") for fn, _s in measures.values())

    signed_aggs, fold_aggs = [], []
    for out, (fn, src) in measures.items():
        if fn == "sum":
            signed_aggs.append(F.sum(F.col(src) * sign).alias(out))
            fold_aggs.append(F.sum(out).alias(out))
        elif fn == "count":
            signed_aggs.append(
                F.sum(
                    F.when(F.col(src).isNotNull(), sign).otherwise(F.lit(0))
                ).alias(out)
            )
            fold_aggs.append(F.sum(out).alias(out))
        elif fn == "min":
            signed_aggs.append(F.min(src).alias(out))
            fold_aggs.append(F.min(out).alias(out))
        else:  # max
            signed_aggs.append(F.max(src).alias(out))
            fold_aggs.append(F.max(out).alias(out))

    old = spark.read.parquet(path)
    deletes = ch.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    )
    if has_minmax:
        # min/max under deletes: recompute ONLY the touched groups from
        # the current snapshot; everything else folds incrementally.
        # The broadcast hint assumes a CDC-trickle's worth of touched
        # group keys; a mass delete (e.g. a GDPR purge across most
        # groups) would OOM the driver building the broadcast table, so
        # past ``broadcast_touched_max`` keys fall back to plain
        # shuffle joins — same plan semantics, no driver materialization.
        touched = deletes.select(*group_cols).distinct()
        if touched.limit(broadcast_touched_max + 1).count() \
                <= broadcast_touched_max:
            hint = F.broadcast
        else:
            def hint(df):
                return df
        snap = txlog.read_snapshot(spark, table, version=cur)
        recomputed = (
            snap.join(hint(touched), group_cols, "left_semi")
            .groupBy(*group_cols)
            .agg(
                *[
                    {"sum": F.sum, "count": F.count, "min": F.min,
                     "max": F.max}[fn](src).alias(out)
                    for out, (fn, src) in measures.items()
                ]
            )
        )
        delta = (
            ch.join(hint(touched), group_cols, "left_anti")
            .groupBy(*group_cols)
            .agg(*signed_aggs)
        )
        kept = old.join(hint(touched), group_cols, "left_anti")
        merged = (
            kept.unionByName(delta).groupBy(*group_cols).agg(*fold_aggs)
            .filter(F.col(count_cols[0]) > 0)
            .unionByName(recomputed)
        )
    else:
        delta = ch.groupBy(*group_cols).agg(*signed_aggs)
        merged = (
            old.unionByName(delta)
            .groupBy(*group_cols)
            .agg(*fold_aggs)
            .filter(F.col(count_cols[0]) > 0)
        )

    staged = f"{path}__staged"
    merged.write.mode("overwrite").parquet(staged)
    meta["synced_version"] = cur
    _promote_staged(staged, path, meta)
    return cur
