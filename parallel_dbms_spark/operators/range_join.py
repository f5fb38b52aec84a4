"""Time-band (range) join — pairs within ``band_seconds`` of each
other on a shared key.

Written naively (`|l.ts - r.ts| <= band` as a join condition) this is
a nested-loop join — quadratic per key, the exact shape that dies at
scale. The standard scale rewrite: bucket both sides by
``floor(ts / band)`` and replicate the RIGHT side into its neighbor
buckets (b-1, b, b+1); any pair within the band then shares at least
one bucket, so the join is a plain hash equi-join on (key, bucket)
with the band predicate as a residual filter. Replication factor is a
constant 3, and each qualifying pair matches in EXACTLY one bucket
(the left row's), so no dedup pass is needed.

(Spark's own optimizer applies a similar rewrite only with range-join
hints on specific runtimes; this makes the plan explicit and
portable.)
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def time_band_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    band_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows with equal ``on`` key and |left_ts - right_ts| <=
    band_seconds. Output: all left columns + right columns prefixed
    ``r_``."""
    band_us = band_seconds * 1_000_000
    l = left.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(left_ts)) / F.lit(band_us))
    )
    r = right.select(
        F.col(on).alias("__r_on"),
        F.unix_micros(F.col(right_ts)).alias("__r_us"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (on, right_ts)
        ],
        F.col(right_ts).alias(f"r_{right_ts}"),
    ).withColumn(
        "__bucket",
        F.explode(
            F.array(
                *[
                    F.floor(F.col("__r_us") / F.lit(band_us)) + F.lit(d)
                    for d in (-1, 0, 1)
                ]
            )
        ),
    )
    cond: Column = (
        (l[on] == r["__r_on"])
        & (l["__bucket"] == r["__bucket"])
        & (
            F.abs(F.unix_micros(l[left_ts]) - r["__r_us"]) <= F.lit(band_us)
        )
    )
    return l.join(r, cond, how=how).drop("__bucket", "__r_on", "__r_us")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
    how: str = "inner",
    max_cells: int = 4096,
) -> DataFrame:
    """Interval × interval overlap join on a shared key: pairs with
    ``l.start <= r.end AND r.start <= l.end`` (closed intervals) —
    sessions × campaigns, downtimes × deploys, validity × validity.

    Same discipline as ``time_band_join``, generalized to two interval
    sides: BOTH sides explode into every ``bucket_seconds`` grid cell
    their interval touches, the join is a hash equi-join on
    (key, bucket), and the overlap predicate is a residual filter. A
    pair overlapping across several shared cells would duplicate, so
    each pair is claimed exactly once in the FIRST cell both intervals
    inhabit — ``bucket == greatest(l_start_bucket, r_start_bucket)``
    — which costs zero extra shuffles (the claim is part of the join
    condition).

    Replication per row = interval_length/bucket_seconds + 1; pick the
    bucket near the P95 interval length so it stays a small constant.
    Zero-/negative-length intervals (end < start) are dropped — they
    overlap nothing under the closed-interval definition anyway — and
    so are intervals spanning more than ``max_cells`` grid cells: one
    dirty year-9999 timestamp would otherwise explode into millions of
    grid rows and take the stage down with it. Legitimate long
    intervals belong to a larger ``bucket_seconds``; rows dropped by
    the cap are a data-quality signal (count them with a
    ``check_expectations`` in_range rule upstream), not silent noise.
    Output: all left columns + right columns prefixed ``r_``.
    """
    b_us = bucket_seconds * 1_000_000
    span_cap = F.lit(max_cells).cast("long")

    def cover(df, s, e):
        return F.sequence(
            F.floor(F.unix_micros(F.col(s)) / F.lit(b_us)),
            F.floor(F.unix_micros(F.col(e)) / F.lit(b_us)),
        )

    l = (
        left.filter(F.col(left_end) >= F.col(left_start))
        .filter(
            (F.unix_micros(F.col(left_end)) - F.unix_micros(F.col(left_start)))
            / F.lit(b_us)
            < span_cap
        )
        .withColumn("__lsb", F.floor(F.unix_micros(F.col(left_start)) / F.lit(b_us)))
        .withColumn("__bucket", F.explode(cover(left, left_start, left_end)))
    )
    r = right.filter(F.col(right_end) >= F.col(right_start)).filter(
        (F.unix_micros(F.col(right_end)) - F.unix_micros(F.col(right_start)))
        / F.lit(b_us)
        < span_cap
    ).select(
        F.col(on).alias("__r_on"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != on],
    )
    r = (
        r.withColumn(
            "__rsb", F.floor(F.unix_micros(F.col(f"r_{right_start}")) / F.lit(b_us))
        )
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.col("__rsb"),
                    F.floor(
                        F.unix_micros(F.col(f"r_{right_end}")) / F.lit(b_us)
                    ),
                )
            ),
        )
    )
    cond = (
        (l[on] == r["__r_on"])
        & (l["__bucket"] == r["__bucket"])
        # claim the pair exactly once: in the first shared cell
        & (l["__bucket"] == F.greatest(l["__lsb"], r["__rsb"]))
        # residual overlap check (closed intervals)
        & (l[left_start] <= r[f"r_{right_end}"])
        & (r[f"r_{right_start}"] <= l[left_end])
    )
    return l.join(r, cond, how=how).drop("__bucket", "__lsb", "__rsb", "__r_on")


def radius_neighbor_pairs(
    points: DataFrame,
    radius: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    self_join: bool = True,
    other: DataFrame | None = None,
    cell_divisor: int = 1,
) -> DataFrame:
    """All pairs of points within Euclidean distance ``radius`` —
    fixed-grid spatial join (planar coordinates).

    The plane is tiled with cells of side ``radius / cell_divisor``;
    any two points within r of each other differ by at most
    ``cell_divisor`` cell indices per axis, so one side keys by its
    OWN cell, the other explodes its ``(2*divisor+1)^2`` cell
    neighborhood, and an equi-join on the cell key yields the
    candidate set; the exact distance check verifies. Candidates per
    point ~ density * ((2m+1) r/m)^2, never all-pairs — the same
    bucket-join-then-verify shape as interval_overlap_join /
    ngram_jaccard, applied to 2-D. Returns (id_a, id_b, dist) with
    id_a < id_b for the self-join form.

    Dense hot cells (urban-core skew) make the cell key a heavy
    hitter: raise ``cell_divisor`` (2 -> r/2 cells, 5x5 neighborhood)
    so one downtown cell splits into ``divisor^2`` join keys and the
    per-key candidate area shrinks from 9r^2 toward (2r)^2 — more,
    smaller join groups at the cost of a wider explode on the probe
    side. The pair set is IDENTICAL for every divisor
    (property-tested); pick the divisor by key-cardinality, the same
    tradeoff as the interval join's band width.
    """
    if cell_divisor < 1:
        raise ValueError(f"cell_divisor must be >= 1, got {cell_divisor}")
    b = other if other is not None else points
    m = int(cell_divisor)
    side = float(radius) / m
    cell_x = F.floor(F.col(x_col) / F.lit(side)).cast("long")
    cell_y = F.floor(F.col(y_col) / F.lit(side)).cast("long")

    # probe side: each point claims its (2m+1)x(2m+1) neighborhood
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-m, m + 1)
        for dy in range(-m, m + 1)
    ])
    a_cells = points.select(
        F.col(id_col).alias("id_a"),
        F.col(x_col).alias("xa"),
        F.col(y_col).alias("ya"),
        F.explode(offs).alias("o"),
        cell_x.alias("cx"),
        cell_y.alias("cy"),
    ).select(
        "id_a", "xa", "ya",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    b_cells = b.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("xb"),
        F.col(y_col).alias("yb"),
        cell_x.alias("cx"),
        cell_y.alias("cy"),
    )
    pair_pred = (
        F.col("id_a") < F.col("id_b") if self_join
        else F.lit(True)
    )
    # squares via multiplication, not pow(): IEEE multiply is exactly
    # rounded and engine-portable, so the boundary predicate (and any
    # quantized distance an oracle hashes) is bit-deterministic
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    d2 = dx * dx + dy * dy
    return (
        a_cells.join(b_cells, ["cx", "cy"])
        .filter(pair_pred & (d2 <= F.lit(float(radius) * float(radius))))
        .select(
            "id_a",
            "id_b",
            F.sqrt(d2).alias("dist"),
            # the exactly-rounded product chain — what an oracle can
            # hash bit-for-bit (sqrt output is also IEEE-exact, but
            # consumers quantizing distances should prefer dist2)
            d2.alias("dist2"),
        )
        # a pair can meet in at most one (cell_b, offset) combination —
        # b is keyed by its single true cell and offsets are distinct —
        # so no dedup pass is needed.
    )


EARTH_RADIUS_KM = 6371.0088  # IUGG mean


def haversine_km(lat_a, lon_a, lat_b, lon_b):
    """Great-circle distance in km between two (degree) coordinates —
    the standard haversine form, all built-in trig (codegen, no UDF)."""
    rl1, rl2 = F.radians(lat_a), F.radians(lat_b)
    dlat = F.radians(lat_b - lat_a) / 2.0
    dlon = F.radians(lon_b - lon_a) / 2.0
    h = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


def geo_radius_pairs(
    points: DataFrame,
    radius_km: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All pairs of (lat, lon) points within great-circle distance
    ``radius_km`` — pole-safe, date-line-safe spatial self-join.

    A degree grid degenerates at the poles (longitude cells shrink to
    nothing) and tears at the +-180 meridian. Instead each point maps
    to 3-D unit-sphere coordinates; two points within great-circle
    distance d are within CHORD length 2*sin(d/2R) in 3-D, so a cubic
    grid with that cell side + a 3x3x3 neighborhood explode gives a
    complete candidate set anywhere on the globe. Exact haversine
    verifies. Same bucket-join-then-verify scaling as
    ``radius_neighbor_pairs``, one more grid dimension (27 cells/point
    on the probe side). Returns (id_a, id_b, dist_km), id_a < id_b.
    """
    chord = 2.0 * math.sin(radius_km / (2.0 * EARTH_RADIUS_KM))
    lat_r, lon_r = F.radians(F.col(lat_col)), F.radians(F.col(lon_col))
    px = F.cos(lat_r) * F.cos(lon_r)
    py = F.cos(lat_r) * F.sin(lon_r)
    pz = F.sin(lat_r)
    cells = [F.floor(c / F.lit(chord)).cast("long") for c in (px, py, pz)]

    offs = F.array(*[
        F.struct(
            F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(dz).alias("dz")
        )
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ])
    a = points.select(
        F.col(id_col).alias("id_a"),
        F.col(lat_col).alias("la"),
        F.col(lon_col).alias("na"),
        F.explode(offs).alias("o"),
        *[c.alias(f"c{i}") for i, c in enumerate(cells)],
    ).select(
        "id_a", "la", "na",
        (F.col("c0") + F.col("o.dx")).alias("cx"),
        (F.col("c1") + F.col("o.dy")).alias("cy"),
        (F.col("c2") + F.col("o.dz")).alias("cz"),
    )
    b = points.select(
        F.col(id_col).alias("id_b"),
        F.col(lat_col).alias("lb"),
        F.col(lon_col).alias("nb"),
        *[c.alias(n) for c, n in zip(cells, ("cx", "cy", "cz"))],
    )
    dist = haversine_km(F.col("la"), F.col("na"), F.col("lb"), F.col("nb"))
    return (
        a.join(b, ["cx", "cy", "cz"])
        .filter((F.col("id_a") < F.col("id_b")) & (dist <= F.lit(radius_km)))
        .select("id_a", "id_b", dist.alias("dist_km"))
    )


def longest_prefix_join(
    probe: DataFrame,
    rules: DataFrame,
    addr_col: str,
    prefix_col: str,
    len_col: str,
    bits: int = 32,
    min_len: int | None = None,
    max_len: int | None = None,
    rule_tiebreak: str | None = None,
) -> DataFrame:
    """Longest-prefix-match join — the IP-enrichment / CIDR-routing
    lookup (geo tables, threat feeds, subnet ownership) expressed as
    an EQUI-join, never a nested loop.

    A rule matches when ``addr >> (bits - len) == prefix >> (bits -
    len)``; the winner per address is the longest matching prefix.
    The probe side explodes each address into one candidate row per
    prefix length in [min_len, max_len] carrying the masked high bits;
    the rule side keys by (len, masked prefix). The equi-join on that
    pair is broadcastable (rule tables are small) or shuffled (both
    fine), and the argmax per address is a groupBy with a max(struct)
    — no window. Cost: |probe| × n_lengths candidate rows, the
    standard LPM trade (a BETWEEN-style theta join would be a
    cartesian at scale); restrict [min_len, max_len] to the lengths
    the rule table actually uses to shrink the explode.

    Ties on length (duplicate rules) break on ``rule_tiebreak``
    ascending when given. Returns probe columns + ``match_len`` +
    rule payload columns; addresses with no matching rule are
    dropped (inner semantics — left form: left-join the result back).
    """
    lens = rules.select(F.col(len_col)).distinct()
    lo_hi = lens.agg(
        F.min(len_col).alias("lo"), F.max(len_col).alias("hi")
    ).first()
    lo = int(min_len if min_len is not None else lo_hi["lo"])
    hi = int(max_len if max_len is not None else lo_hi["hi"])

    cand = probe.withColumn(
        "__plen",
        F.explode(F.array(*[F.lit(l) for l in range(lo, hi + 1)])),
    ).withColumn(
        "__pkey",
        # SQL form: the Python shiftrightunsigned binding only takes a
        # literal shift, the SQL function takes any expression
        F.expr(f"shiftrightunsigned(CAST({addr_col} AS BIGINT), "
               f"{bits} - __plen)"),
    )
    r = rules.withColumn(
        "__pkey",
        F.expr(f"shiftrightunsigned(CAST({prefix_col} AS BIGINT), "
               f"{bits} - {len_col})"),
    ).withColumnRenamed(len_col, "__plen")
    joined = cand.join(F.broadcast(r.drop(prefix_col)), ["__plen", "__pkey"])

    payload = [
        c for c in rules.columns if c not in (prefix_col, len_col)
    ]
    order_fields = [F.col("__plen").alias("l")] + (
        [(-F.col(rule_tiebreak)).alias("tb")] if rule_tiebreak else []
    )
    carrier = F.struct(
        *order_fields, *[F.col(c).alias(c) for c in payload]
    )
    best = (
        joined.groupBy(*probe.columns)
        .agg(F.max(carrier).alias("__best"))
        .select(
            *probe.columns,
            F.col("__best.l").alias("match_len"),
            *[F.col(f"__best.{c}").alias(c) for c in payload],
        )
    )
    return best


def points_in_convex_polygon(
    points: DataFrame,
    vertices: list[tuple[float, float]],
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Point-in-convex-polygon containment as a pure projection-time
    predicate — the geofencing primitive ("which events happened inside
    this delivery zone").

    For a CONVEX polygon with vertices in counter-clockwise order, a
    point is inside iff it lies on the left of (or on) every directed
    edge: cross((v2-v1), (p-v1)) >= 0 for all edges. That is a fixed
    conjunction of |V| multiply-subtract comparisons — whole-stage
    codegen, no join, no UDF, trivially data-parallel at any scale.

    A bounding-box prefilter runs FIRST: min/max of the vertices are
    compile-time constants, so when the coordinates are stored columns
    the bbox conjuncts are sargable (PushedFilters into the parquet
    scan / row-group stats pruning); the exact half-plane test then
    only touches bbox survivors. For non-convex polygons, decompose
    into convex pieces and OR the predicates (or fall back to a
    ray-cast pandas UDF — not needed for the fixture surface).

    Degenerate/clockwise inputs are a caller error: the predicate is
    only a containment test when the winding is CCW and the polygon is
    convex; tests/test_spatial_polygon.py asserts both for the fixture
    polygon.
    """
    if len(vertices) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    x, y = F.col(x_col), F.col(y_col)
    xs = [v[0] for v in vertices]
    ys = [v[1] for v in vertices]
    cond = (
        (x >= F.lit(min(xs)))
        & (x <= F.lit(max(xs)))
        & (y >= F.lit(min(ys)))
        & (y <= F.lit(max(ys)))
    )
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        cross = (F.lit(x2 - x1)) * (y - F.lit(y1)) - (F.lit(y2 - y1)) * (
            x - F.lit(x1)
        )
        cond = cond & (cross >= F.lit(0.0))
    return points.filter(cond)
