"""As-of join — an operator Spark lacks natively (SURVEY §2.3 row
"hash / sort-merge / range / as-of joins").

Implemented as a composition of built-in ops (union + window), not a
pandas fallback: tag both sides, union, sort within each key by time,
and carry the most recent right-side row forward with
``last(..., ignorenulls=True)``. One shuffle on (key), partition-local
ordering, no driver involvement — survives arbitrarily many rows per
key as long as a single key's rows fit a partition. For a pathological
key that does NOT (one device producing a whole partition's worth of
readings at 100 TB), ``asof_join_sharded`` salts by time range: it
splits the timeline into ``n_shards`` buckets, runs the identical
union-window plan partitioned by (key, shard), and stitches shard
boundaries by synthesizing per-shard carry-in rows (the last right row
before the shard, and for forward/nearest the first right row after
it) so every left row still sees its true match.

Matches DuckDB's ``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts``
semantics (greatest r.ts <= l.ts), which the oracle uses.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    how: str = "inner",
    direction: str = "backward",
    tolerance: str | None = None,
    allow_exact: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts and equal ``on`` key(s) — a single column name
    or a composite-key list (direction="backward"),
    or the EARLIEST right row with right_ts >= left_ts
    (direction="forward" — "next reading at or after"). The forward
    form is the same one-shuffle window plan run in descending time
    order; DuckDB's ``ASOF JOIN ... ON l.ts <= r.ts`` is its oracle.

    ``tolerance`` (an interval string, e.g. ``"2 hours"``) bounds how
    stale a match may be: a matched right row further than the
    tolerance from left_ts is treated as NO match (pandas
    ``merge_asof(tolerance=...)`` semantics) — dropped under
    how="inner", NULL-filled under how="left". Applied as a post-fill
    predicate on the carried right timestamp, so the plan is unchanged
    (one shuffle, no extra join)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    on = [on] if isinstance(on, str) else list(on)  # composite keys ok
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    # The whole right row travels as ONE struct: ``last(__r, ignorenulls)``
    # then picks the most recent right row wholesale. (Carrying value
    # columns individually would be wrong twice over: a NULL value in
    # the matched row would fall back to an older row's value, and
    # inner-join filtering on a value column would drop legitimately-
    # NULL matches.)
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        # the matched row's own timestamp rides along for tolerance
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(c) for c in right_values],
        ).alias("__r"),
    )
    for c in lcols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    l = l.withColumn("__r", F.lit(None).cast(dict(r.dtypes)["__r"]))

    unioned = l.unionByName(r.select(*l.columns))
    # Right rows sort before left rows at equal timestamps (__side 0 < 1)
    # so an exactly-simultaneous right row IS visible to the left row;
    # allow_exact=False flips that tiebreak (left first), excluding
    # simultaneous right rows — pandas merge_asof(allow_exact_matches)
    # semantics with the SAME one-shuffle plan. Forward = the identical
    # scan in descending time order: "last right seen" then means
    # "smallest right_ts >= left_ts" (or > with allow_exact=False).
    side_order = F.col("__side").asc() if allow_exact else F.col("__side").desc()
    if direction == "nearest":
        # BOTH carries over the same shuffle: the ascending window's
        # last-right (latest at-or-before) and the descending window's
        # last-right (earliest at-or-after). Two sorts, one exchange —
        # both windows share the partitionBy key. Pick the smaller gap;
        # ties go backward (pandas merge_asof convention).
        w_b = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), side_order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_f = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").desc(), side_order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.select(
            *lcols,
            F.col("__side"),
            F.last(F.col("__r"), ignorenulls=True).over(w_b).alias("__rb"),
            F.last(F.col("__r"), ignorenulls=True).over(w_f).alias("__rf"),
        )
        gap_b = F.col(left_ts) - F.col("__rb.__rts")
        gap_f = F.col("__rf.__rts") - F.col(left_ts)
        chosen = (
            F.when(F.col("__rb").isNull(), F.col("__rf"))
            .when(F.col("__rf").isNull(), F.col("__rb"))
            .when(gap_f < gap_b, F.col("__rf"))
            .otherwise(F.col("__rb"))
        )
        out = (
            filled.filter(F.col("__side") == 1)
            .withColumn("__r", chosen)
            .drop("__side", "__rb", "__rf")
        )
    else:
        ts_order = (
            F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
        )
        w = (
            Window.partitionBy(*on)
            .orderBy(ts_order, side_order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.select(
            *lcols,
            F.col("__side"),
            F.last(F.col("__r"), ignorenulls=True).over(w).alias("__r"),
        )
        out = filled.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        if direction == "nearest":
            rts = F.col("__r.__rts")
            gap = F.when(rts <= F.col(left_ts), F.col(left_ts) - rts).otherwise(
                rts - F.col(left_ts)
            )
        else:
            gap = (
                F.col(left_ts) - F.col("__r.__rts")
                if direction == "backward"
                else F.col("__r.__rts") - F.col(left_ts)
            )
        within = gap <= F.expr(f"INTERVAL {tolerance}")
        # NULL condition (no match at all) falls through to NULL
        out = out.withColumn("__r", F.when(within, F.col("__r")))
    if how == "inner":
        out = out.filter(F.col("__r").isNotNull())
    return out.select(
        *lcols, *[F.col(f"__r.{c}").alias(f"r_{c}") for c in right_values]
    )


def asof_join_sharded(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    how: str = "inner",
    direction: str = "backward",
    tolerance: str | None = None,
    allow_exact: bool = True,
    n_shards: int = 32,
) -> DataFrame:
    """Salt-by-time-range as-of join for pathological keys.

    Same semantics as ``asof_join`` (property-tested identical in
    tests/test_asof.py), different physical plan: the timeline
    [min(left_ts), max(left_ts)] is split into ``n_shards`` equal-width
    buckets and the union-window runs partitioned by (key, shard), so a
    single key's rows spread across ``n_shards`` partitions instead of
    one. Boundary stitching: per (key, shard) the right side's boundary
    rows (max_by / min_by — one salted shuffle) are rolled into
    carry-ins over a per-key dense shard spine (≤ n_shards rows/key, a
    trivially small window), and each carry-in is re-injected into its
    target shard with its ORIGINAL timestamp — it sorts before (after)
    every in-shard row, and tolerance/nearest gaps stay exact because
    the carried ``__rts`` is the true event time.

    Works on timestamp or numeric time columns (bucketing casts to
    double). Falls back to the unsharded plan when the left side is
    empty or spans a single instant.
    """
    on = [on] if isinstance(on, str) else list(on)
    kwargs = dict(
        left_ts=left_ts,
        right_ts=right_ts,
        right_values=right_values,
        how=how,
        direction=direction,
        tolerance=tolerance,
        allow_exact=allow_exact,
    )
    # Two-value driver collect: bounded by construction.
    b = left.agg(
        F.min(F.col(left_ts).cast("double")).alias("t0"),
        F.max(F.col(left_ts).cast("double")).alias("t1"),
    ).first()
    t0, t1 = b["t0"], b["t1"]
    if t0 is None or t0 == t1 or n_shards <= 1:
        return asof_join(left, right, on, **kwargs)
    width = (t1 - t0) / n_shards

    def shard_of(c):
        # Right rows outside [t0, t1] clamp into the edge shards; they
        # sort strictly before/after every in-shard row, so the window
        # carry still picks the correct match.
        return (
            F.least(
                F.lit(n_shards - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((c.cast("double") - F.lit(t0)) / F.lit(width)),
                ),
            )
        ).cast("int")

    l2 = left.withColumn("__shard", shard_of(F.col(left_ts)))
    r2 = right.select(
        *on, F.col(right_ts), *right_values
    ).withColumn("__shard", shard_of(F.col(right_ts)))

    rstruct = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_values]
    )
    # Per-(key, shard) boundary rows — the ONLY aggregation over the
    # fat key, and it is salted by __shard.
    per = r2.groupBy(*on, "__shard").agg(
        F.max_by(rstruct, F.col(right_ts)).alias("__last"),
        F.min_by(rstruct, F.col(right_ts)).alias("__first"),
    )
    # Dense spine so carries cross empty shards.
    spine = (
        per.select(*on)
        .distinct()
        .select(
            *on,
            F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias(
                "__shard"
            ),
        )
    )
    per_f = spine.join(per, on=[*on, "__shard"], how="left")
    w_prev = (
        Window.partitionBy(*on)
        .orderBy(F.col("__shard").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy(*on)
        .orderBy(F.col("__shard").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = per_f.select(
        *on,
        F.col("__shard"),
        F.last(F.col("__last"), ignorenulls=True).over(w_prev).alias("__cb"),
        F.last(F.col("__first"), ignorenulls=True).over(w_next).alias("__cf"),
    )

    def _as_rows(carry_col: str) -> DataFrame:
        return carries.filter(F.col(carry_col).isNotNull()).select(
            *on,
            F.col(f"{carry_col}.__rts").alias(right_ts),
            *[F.col(f"{carry_col}.{c}").alias(c) for c in right_values],
            F.col("__shard"),
        )

    r_aug = r2.select(*on, right_ts, *right_values, "__shard")
    if direction in ("backward", "nearest"):
        r_aug = r_aug.unionByName(_as_rows("__cb"))
    if direction in ("forward", "nearest"):
        r_aug = r_aug.unionByName(_as_rows("__cf"))

    return asof_join(l2, r_aug, on=[*on, "__shard"], **kwargs).drop("__shard")


def resample_ffill(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    step: str = "1 hour",
    shard_timeline: int | None = None,
) -> DataFrame:
    """Time-series resample with forward fill — the hypertable-rollup /
    gap-fill surface, expressed as a COMPOSITION of existing operators
    (grid generation + as-of join), no custom execution.

    Per key: a regular ``step`` grid spanning [floor(min ts),
    floor(max ts)], each grid point carrying the last observation at or
    before it. Equal-timestamp observations are pre-aggregated to
    MAX(value) so the fill is deterministic. Grid points before the
    first observation have no value and are dropped (inner as-of).

    Scale: the grid is generated with sequence()+explode — rows/key =
    span/step, no driver involvement; the fill inherits asof_join's
    single-shuffle window plan. A long span at a fine step makes the
    grid itself the pathological key (span/step rows per key) — pass
    ``shard_timeline=N`` to run the fill through ``asof_join_sharded``
    instead. Returns (key, grid_ts, r_<value>).
    """
    tcol = F.col(ts)
    obs = events.groupBy(F.col(key), tcol.alias("__ts_o")).agg(
        F.max(F.col(value)).alias(value)
    )
    bounds = events.groupBy(key).agg(
        F.date_trunc("hour", F.min(tcol)).alias("__t0"),
        F.date_trunc("hour", F.max(tcol)).alias("__t1"),
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence("__t0", "__t1", F.expr(f"INTERVAL {step}"))
        ).alias("grid_ts"),
    )
    join_fn = asof_join if shard_timeline is None else (
        lambda *a, **kw: asof_join_sharded(*a, n_shards=shard_timeline, **kw)
    )
    return join_fn(
        grid,
        obs.select(key, F.col("__ts_o").alias("obs_ts"), F.col(value)),
        on=key,
        left_ts="grid_ts",
        right_ts="obs_ts",
        right_values=[value],
        how="inner",
    )


def resample_interpolate(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Time-series resample with LINEAR INTERPOLATION — TimescaleDB's
    ``interpolate()`` next to :func:`resample_ffill`'s ``locf()``:
    each grid point takes the value a straight line between its
    bracketing observations passes through, the standard gap-fill for
    continuously-varying signals (temperatures, prices) where a
    forward fill would hold stale plateaus.

    Composition, no custom execution: the same sequence()+explode grid
    as ``resample_ffill``, then BOTH brackets in one pass — grid and
    observation rows union into a single (key,)-partitioned timeline
    and two window columns walk it in opposite directions (last
    observation carried forward = the at-or-before bracket, last
    observation carried backward = the at-or-after bracket). One hash
    exchange feeds both windows (same partitioning, opposite sort
    orders — Spark inserts a re-sort, never a re-shuffle), where two
    chained as-of joins would pay a full union+shuffle each. Grid
    points outside [first obs, last obs] lack a bracket and drop.
    Equal-timestamp observations pre-aggregate to MAX(value); an
    observation exactly ON a grid point brackets it on BOTH sides
    (den=0 path serves the observation verbatim). NULL-valued rows are
    not observations: they are dropped BEFORE the timeline is built, so
    a bracket's (sec, value) pair can never desynchronize — without the
    filter an all-null timestamp would contribute a non-null ``__sec``
    with a null ``__v_e6`` and the two independent last() calls would
    lerp between mismatched endpoints.

    Determinism contract (repo-wide oracle convention): values
    quantize to integer MICRO-units and timestamps to whole epoch
    seconds before any arithmetic, so the lerp numerator
    ``v_prev*(t_next-t) + v_next*(t-t_prev)`` is exact int64 in any
    order and the result is ONE double division — bit-identical in
    every IEEE-conforming engine (DuckDB replays it verbatim).
    Overflow headroom: micro-units(1e10) x bracket-seconds(1e7) stays
    well under 2^63.

    Scale: rows/key = span/step exactly like ``resample_ffill``; the
    timeline is partition-parallel per key after the one exchange
    (shard the timeline like ``asof_join_sharded`` if a single key's
    span/step explodes). Returns (key, grid_ts, r_value_e6 double).
    """
    from pyspark.sql import Window

    tcol = F.col(ts)
    # grid anchor granularity follows the step unit ('15 minutes' →
    # minute-truncated bounds, '1 day' → midnight), not a hardcoded
    # 'hour' — only whole-unit steps Spark's date_trunc knows are valid
    m_step = re.match(
        r"(?i)^\s*\d+\s+(second|minute|hour|day|week|month|year)s?\s*$",
        step,
    )
    if not m_step:
        raise ValueError(
            f"resample_interpolate: unsupported step {step!r} — use "
            "'<n> <second|minute|hour|day|week|month|year>'"
        )
    trunc_unit = m_step.group(1).lower()
    ev = events.filter(F.col(value).isNotNull())
    obs = (
        ev.groupBy(F.col(key), tcol.alias("__t"))
        .agg(F.max(F.col(value)).alias("__v"))
        .select(
            key,
            "__t",
            F.lit(1).alias("__is_obs"),
            F.unix_timestamp("__t").alias("__sec"),
            F.floor(F.col("__v") * F.lit(1_000_000.0)).cast("long")
            .alias("__v_e6"),
        )
    )
    bounds = ev.groupBy(key).agg(
        F.date_trunc(trunc_unit, F.min(tcol)).alias("__t0"),
        F.date_trunc(trunc_unit, F.max(tcol)).alias("__t1"),
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence("__t0", "__t1", F.expr(f"INTERVAL {step}"))
        ).alias("__t"),
        F.lit(0).alias("__is_obs"),
        F.lit(None).cast("long").alias("__sec"),
        F.lit(None).cast("long").alias("__v_e6"),
    )
    # __is_obs DESC within equal __t: the observation row sorts BEFORE
    # the grid point it coincides with — in BOTH directions — so an
    # on-grid observation is inside both frames (allow_exact)
    fwd = Window.partitionBy(key).orderBy(
        F.col("__t").asc(), F.col("__is_obs").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bwd = Window.partitionBy(key).orderBy(
        F.col("__t").desc(), F.col("__is_obs").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u = obs.unionByName(grid)
    both = (
        u.withColumn("p_sec", F.last("__sec", ignorenulls=True).over(fwd))
        .withColumn("p_e6", F.last("__v_e6", ignorenulls=True).over(fwd))
        .withColumn("n_sec", F.last("__sec", ignorenulls=True).over(bwd))
        .withColumn("n_e6", F.last("__v_e6", ignorenulls=True).over(bwd))
        .filter(
            (F.col("__is_obs") == 0)
            & F.col("p_sec").isNotNull()
            & F.col("n_sec").isNotNull()
        )
    )
    g = F.unix_timestamp("__t")
    num = (
        F.col("p_e6") * (F.col("n_sec") - g)
        + F.col("n_e6") * (g - F.col("p_sec"))
    )
    den = F.col("n_sec") - F.col("p_sec")
    return both.select(
        key,
        F.col("__t").alias("grid_ts"),
        F.when(den > 0, num.cast("double") / den.cast("double"))
        .otherwise(F.col("p_e6").cast("double"))
        .alias("r_value_e6"),
    )


def twap(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Time-weighted average price/value per key — each observation is
    weighted by how long it remained current (duration to the NEXT
    observation), the standard irregular-series average (TimescaleDB's
    ``time_weight``, kdb's ``twap``). The last observation per key has
    no successor and contributes no weight; keys with a single
    observation drop out (zero total duration).

    Determinism contract (the repo-wide oracle convention): values are
    quantized to integer cents and durations to whole seconds, so the
    weighted sum is exact int64 arithmetic in any accumulation order;
    the final division is one double op on both engines. Overflow
    headroom: cents(1e7) * seconds(1e7 ~ 4 months) * rows(1e5) stays
    under 2^63 for any sane fixture; at 100 TB the sum per key is
    bounded by span * max_cents, not row count.

    One window (partitioned by key — the safe, distributed kind) + one
    groupBy: a single shuffle on the key, no driver state. Returns
    (key, twap, total_secs, n_obs).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    cents = F.round(F.col(value) * 100).cast("long")
    dur = (
        F.unix_timestamp(F.lead(ts).over(w)) - F.unix_timestamp(F.col(ts))
    ).cast("long")
    obs = events.select(
        F.col(key), cents.alias("__cents"), dur.alias("__dur")
    ).filter(F.col("__dur").isNotNull())
    return (
        obs.groupBy(key)
        .agg(
            F.sum(F.col("__cents") * F.col("__dur")).alias("__wsum"),
            F.sum("__dur").alias("total_secs"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .filter(F.col("total_secs") > 0)
        .select(
            key,
            (F.col("__wsum").cast("double")
             / F.col("total_secs").cast("double") / 100.0).alias("twap"),
            "total_secs",
            "n_obs",
        )
    )


def ohlc_resample(
    events: DataFrame,
    bucket: str = "1 hour",
    key: str | None = None,
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """OHLC candlestick rollup — open/high/low/close (+ count) per
    time bucket, the financial-series sibling of the tumbling-window
    aggregate. Open/close are SELECTIONS of existing values (first /
    last observation by (ts, tiebreak)), not accumulations, so they
    hash exactly; high/low/n are plain min/max/count.

    Plan: one window partitioned by (bucket[, key]) for the first/last
    row flags, then one groupBy — both shuffle on the same bucket key,
    and AQE coalesces. No per-key state, no driver work; buckets are
    the partition unit, so a year of data at 1-hour buckets is ~9k
    groups regardless of row count. Returns (bucket_ts[, key], open,
    high, low, close, n_events).
    """
    b = F.date_trunc(
        {"1 hour": "hour", "1 day": "day", "1 minute": "minute"}.get(
            bucket, "hour"
        ),
        F.col(ts),
    ).alias("bucket_ts")
    parts = ["bucket_ts"] + ([key] if key else [])
    base = events.select(
        b, *([key] if key else []), F.col(ts), F.col(tiebreak), F.col(value)
    )
    w_asc = Window.partitionBy(*parts).orderBy(
        F.col(ts).asc(), F.col(tiebreak).asc()
    )
    w_desc = Window.partitionBy(*parts).orderBy(
        F.col(ts).desc(), F.col(tiebreak).desc()
    )
    flagged = base.select(
        *parts,
        F.col(value),
        F.row_number().over(w_asc).alias("__rn_a"),
        F.row_number().over(w_desc).alias("__rn_d"),
    )
    return (
        flagged.groupBy(*parts)
        .agg(
            F.max(F.when(F.col("__rn_a") == 1, F.col(value))).alias("open"),
            F.max(F.col(value)).alias("high"),
            F.min(F.col(value)).alias("low"),
            F.max(F.when(F.col("__rn_d") == 1, F.col(value))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
