"""Corpus sampling and sharding — the mixing / last-mile steps of a
training-data pipeline.

- ``stratified_sample``: per-stratum Bernoulli sampling (``sampleBy``)
  for corpus mixing ("10% of web, 100% of books"). Seeded and
  scan-fused: each row is kept by hashing, no shuffle, no count pass.
- ``deterministic_sample``: exact reproducibility across runs AND
  partitionings — keep iff the first 4 hex digits of
  md5(id || '|' || salt) fall under the fraction's threshold. Unlike
  ``sample``/``sampleBy`` (whose outcome depends on partition layout),
  this is a pure function of the row, so it survives repartitioning,
  AQE re-plans, and engine changes; md5 is identical everywhere, so
  the same rule runs in DuckDB — a full oracle for a sampler.
- ``write_training_shards``: repartition to a fixed shard count, sort
  within each shard, write. One shuffle; shard count and per-shard
  order are the contract a downstream training loader relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HASH_BUCKETS = 1 << 16  # 4 hex digits


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample. Strata absent from ``fractions``
    are dropped (fraction 0.0) — the corpus-mixing convention."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def sample_threshold_hex(frac: float) -> str:
    """4-hex-digit threshold: keep iff md5-prefix < this (lexicographic
    on lowercase hex == numeric for fixed width)."""
    return format(min(int(frac * HASH_BUCKETS), HASH_BUCKETS - 1), "04x")


def deterministic_sample(
    df: DataFrame, frac: float, id_col: str = "doc_id", salt: str = "s0"
) -> DataFrame:
    """Keep a row iff substr(md5(id || '|' || salt), 1, 4) <
    hex(frac * 2^16). Exactly reproducible regardless of partitioning;
    change ``salt`` to draw an independent sample."""
    key = F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))
    prefix = F.substring(F.md5(F.encode(key, "UTF-8")), 1, 4)
    return df.filter(prefix < sample_threshold_hex(frac))


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    sort_col: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Exactly ``n_shards`` output files, rows sorted by ``sort_col``
    inside each shard (one shuffle; the sort is partition-local, never
    global). Shard assignment is round-robin on the sort key's hash so
    shards are size-balanced."""
    (
        df.repartition(n_shards, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "s0",
) -> DataFrame:
    """Deterministic k rows per group: rank rows inside each group by
    md5(id || salt) and keep the first k. Like deterministic_sample,
    the choice is a pure function of the row id — stable across
    partitioning, retries, and engines — but with an exact per-group
    quota instead of a global fraction (balanced eval sets, per-class
    caps). Change ``salt`` to draw a different (still deterministic)
    sample. One window over the group key; no global sort.
    """
    from pyspark.sql import Window

    h = F.md5(
        F.encode(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(salt)), "UTF-8")
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def train_val_test_split(
    df: DataFrame,
    fracs: tuple[float, float] = (0.8, 0.1),
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic 3-way train/val/test assignment.

    Same md5-prefix rule as ``deterministic_sample``: the split label
    is a pure function of (id, salt), so it is reproducible across
    partitionings, engines, and reruns, and the three sets are disjoint
    and exhaustive BY CONSTRUCTION (one threshold comparison per row,
    no sampling races). fracs = (train, val); test takes the rest.

    Scale: a narrow projection — no shuffle, no state; the labeled
    frame feeds partitioned writes (one directory per split).
    """
    key = F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))
    prefix = F.substring(F.md5(F.encode(key, "UTF-8")), 1, 4)
    t_train = sample_threshold_hex(fracs[0])
    t_val = sample_threshold_hex(fracs[0] + fracs[1])
    return df.withColumn(
        "split",
        F.when(prefix < t_train, F.lit("train"))
        .when(prefix < t_val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def weighted_sample_k_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "w0",
    mode: str = "es",
) -> DataFrame:
    """Deterministic weighted sampling without replacement: k rows per
    group, inclusion probability proportional to ``weight_col``.

    Each row draws u in (0, 1) from a DETERMINISTIC hash of (id, salt)
    — not rand(), so the draw is a pure function of the row and
    reproducible across partitionings, retries, and engines. The k
    SMALLEST keys per group win; ties break on ``id_col``. Rows with
    zero/negative/null weight have inclusion probability 0 and are
    EXCLUDED up front — a group with fewer than k positive-weight rows
    returns only those rows, never a zero-weight filler.

    ``mode`` picks the key construction:

    - ``"es"`` (default, the scale path): Efraimidis–Spirakis A-ES —
      u from xxhash64, key = -ln(u) / w (the exponential-race form of
      u^(1/w); same order, better numerics). Exact PPS-without-
      replacement inclusion law, but ``ln`` is a libm transcendental
      with no cross-engine bit guarantee, so this mode is
      reproducible WITHIN Spark only.
    - ``"sps_md5"`` (the oracle-replayable path): sequential Poisson
      sampling (Ohlsson 1998) — u from the first 13 hex digits of
      md5(id || '|' || salt) (52 bits: h, h+0.5, and /2^52 are all
      EXACT in binary64), key = u / w (ONE correctly-rounded IEEE-754
      division, bit-identical in every conforming engine). SPS is the
      standard PPS approximation used by national statistics offices;
      the draw replays verbatim in DuckDB/Postgres/anything with md5,
      so a value-hash oracle can grade the sampler itself.

    Scale (both modes): one window over the group key (partition-
    parallel after one shuffle), no global sort, no per-group state
    beyond the running rank. Change ``salt`` for an independent draw.
    """
    from pyspark.sql import Window

    w = F.col(weight_col).cast("double")
    eligible = df.filter(w > 0)  # p(include) = 0 for w <= 0 or null
    if mode == "sps_md5":
        # 13 hex digits = 52 bits: fits the binary64 mantissa, so u is
        # exact and key = u / w is a single correctly-rounded division
        # — the whole draw is bit-identical across engines (verified
        # vs DuckDB; this is why the registry row can carry an oracle)
        h = F.conv(
            F.substring(
                F.md5(F.encode(
                    F.concat(F.col(id_col).cast("string"),
                             F.lit("|" + salt)),
                    "UTF-8",
                )),
                1, 13,
            ),
            16, 10,
        ).cast("long")
        u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
        key = u / w
    elif mode == "es":
        h = F.xxhash64(F.col(id_col).cast("string"), F.lit(salt))
        # map int64 hash -> u in (0, 1): (h mod M + 0.5) scaled keeps
        # u strictly inside the open interval so ln(u) is finite
        m = F.lit(1 << 40)
        u = ((F.pmod(h, m) + F.lit(0.5)) / m.cast("double"))
        key = -F.log(u) / w
    else:
        raise ValueError(f"unknown weighted-sampling mode {mode!r}")
    win = Window.partitionBy(group_col).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return (
        eligible.withColumn("__rk", F.row_number().over(win))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def mix_corpus(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix0",
) -> DataFrame:
    """Deterministic corpus mixing: per-stratum sampling rates ("50% of
    web, 100% of books") applied with the md5-threshold rule, so the
    mix is a pure function of (id, salt) — reproducible across
    partitionings, retries, and engines, and expressible in SQL for a
    full oracle (unlike ``sampleBy``, whose draw depends on partition
    layout). Strata absent from ``fractions`` are dropped — the
    corpus-mixing convention.

    Scale: one scan-fused CASE over the threshold table (broadcast as
    a literal map), zero shuffle, zero state.
    """
    key = F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))
    prefix = F.substring(F.md5(F.encode(key, "UTF-8")), 1, 4)
    keep = F.lit(False)
    for stratum, frac in fractions.items():
        if frac >= 1.0:
            # keep the whole stratum — a hash test with the clamped
            # 0xffff threshold would silently drop the 1-in-65536 rows
            # whose prefix is exactly 'ffff'
            cond = F.col(strata_col) == stratum
        else:
            cond = (F.col(strata_col) == stratum) & (
                prefix < sample_threshold_hex(frac)
            )
        keep = keep | cond
    return df.filter(keep)


def negative_samples(
    df: DataFrame,
    id_col: str = "vec_id",
    k: int = 4,
    salt: int = 7,
) -> DataFrame:
    """Deterministic negative sampling over a DENSE 0..n-1 id space —
    the contrastive-training companion of the positive near-dup pairs:
    each anchor gets ``k`` pseudo-random partners
    ``neg_j(i) = (i*A + j*B + salt) mod n`` (fixed odd multipliers),
    shifted one slot if the draw hits the anchor itself.

    A pure row function of (id, j): reproducible across engines,
    partitionings, and retries — and therefore fully SQL-expressible
    (the registered query's DuckDB oracle runs the same arithmetic).
    Returns (anchor_id, j, neg_id).

    Scale: zero shuffle — the id space size rides in as a broadcast
    scalar and the draw is scan-fused arithmetic. Assumes dense ids
    (use ids.assign_surrogate_keys first when they aren't); id*A must
    stay inside int64, which holds to ~3.5e9 rows with this A.
    """
    A, B = F.lit(2654435761), F.lit(40503)
    n_tab = df.agg(F.count(F.lit(1)).alias("__n"))
    ex = (
        df.select(F.col(id_col).alias("anchor_id"))
        .crossJoin(F.broadcast(n_tab))
        .select(
            "anchor_id",
            F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("j"),
            F.col("__n"),
        )
    )
    raw = F.pmod(
        F.col("anchor_id") * A + F.col("j") * B + F.lit(int(salt)), F.col("__n")
    )
    neg = F.when(raw == F.col("anchor_id"), F.pmod(raw + 1, F.col("__n"))).otherwise(
        raw
    )
    return ex.select("anchor_id", "j", neg.cast("long").alias("neg_id"))


def mix_corpus_token_budget(
    df: DataFrame,
    default_budget: int,
    overrides: dict[str, int] | None = None,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mixtok0",
) -> DataFrame:
    """Token-budget corpus mixing: take documents per source — in the
    deterministic md5(id|salt) order — until the source's TOKEN budget
    is reached (``mix_corpus`` rations by document count; real data
    recipes ration by tokens). A doc is kept iff the cumulative token
    count of the docs drawn before it is still under budget, so the
    boundary doc that crosses the budget is included once — the greedy
    prefix rule, a pure function of (ids, salt) and SQL-expressible
    for a full oracle.

    Returns (doc_id, source, n_tok). Scale: token counts are
    scan-fused; the only shuffle is the per-source window cumsum,
    partitioned by source — per-key state, no global ordering.
    """
    overrides = overrides or {}
    n_tok = F.size(
        F.split(F.trim(F.col(text_col)), r"\s+")
    ).cast("long")
    key = F.md5(
        F.encode(
            F.concat(F.col(id_col).cast("string"), F.lit("|" + salt)), "UTF-8"
        )
    )
    budget = F.lit(int(default_budget))
    for s, b in sorted(overrides.items()):
        budget = F.when(F.col(strata_col) == s, F.lit(int(b))).otherwise(budget)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(strata_col).alias("source"),
        n_tok.alias("n_tok"),
        (F.sum(n_tok).over(w) - n_tok).alias("__cum_before"),
        budget.alias("__budget"),
    )
    return out.filter(F.col("__cum_before") < F.col("__budget")).select(
        "doc_id", "source", "n_tok"
    )
