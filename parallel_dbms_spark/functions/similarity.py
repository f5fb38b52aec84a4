"""Similarity search over an embedding column (array<float>).

Three paths over the ``embeddings`` table (vec_id, embedding[64], label):

- brute-force cosine top-k: broadcast the (small) query set against the
  corpus, dot products via zip_with/aggregate (JVM-side, codegen), top-k
  per query via window row_number. Exact; the baseline.
- LSH-bucketed ANN: deterministic random-hyperplane signatures bucket
  the corpus; queries probe only their bucket. Approximate; a 100 TB
  path — probe cost is O(bucket), corpus is hashed once.
- IVF ANN: k-means-style coarse quantizer (deterministic seeding +
  Lloyd refinement, all DataFrame ops); corpus partitioned by nearest
  centroid, queries probe the ``nprobe`` nearest cells. The classic
  billion-vector layout (FAISS IVFFlat) re-expressed as a bucket join.

Scalar similarity math (dot/cosine) is JVM-side codegen:
aggregate(zip_with(u, v, *), 0.0, +). Signature generation is the one
place Python appears — a vectorized Arrow-batched pandas UDF doing ONE
numpy matmul per batch for all hash tables at once. The pure-expression
equivalent (rp_signature below, kept for tests/plan-asserts) embeds
nbits*dim literals per table into the plan; at real widths that bloats
codegen and planning time ~10x (measured 12.8s -> <2s on the ANN query
at sf0.01), while the matmul UDF's plan is O(1) in dim and nbits.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType


def dot(u, v):
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(u):
    return F.sqrt(dot(u, u))


def cosine(u, v):
    return dot(u, v) / (norm(u) * norm(v))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos) with k rows per
    query, neighbors exclude the query itself. Queries are broadcast —
    the corpus is scanned once regardless of query count."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side literals;
    LCG + Box-Muller-free uniform in [-1,1] is plenty for LSH)."""
    planes, state = [], seed
    for _ in range(nbits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def rp_signature(vec_col, dim: int, nbits: int = 16, seed: int = 7):
    """Random-hyperplane (SimHash-for-vectors) signature as one long.

    The planes ship as ONE array<array<double>> literal folded with
    zip_with/aggregate — nbits unrolled dot-product expressions would
    bloat the plan (nbits × dim duplicated subtrees) at real widths.
    """
    planes = _hyperplanes(dim, nbits, seed)
    planes_col = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in planes]
    )
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(nbits)])
    sig_bits = F.zip_with(
        planes_col,
        masks,
        lambda p, m: F.when(dot(vec_col, p) > 0, m).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        sig_bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x)
    )


def rp_signatures_np(dim: int, nbits: int, num_tables: int, seed: int = 7):
    """Vectorized multi-table signature generator: array<float> ->
    array<long>[num_tables], one numpy matmul per Arrow batch.

    Same hyperplanes as :func:`rp_signature` (shared ``_hyperplanes``),
    so the two paths bucket identically up to float summation order.
    """
    import numpy as np

    planes = np.array(
        [_hyperplanes(dim, nbits, seed + t) for t in range(num_tables)]
    )  # (T, nbits, dim)
    proj = planes.reshape(num_tables * nbits, dim).T  # (dim, T*nbits)
    masks = 1 << np.arange(nbits, dtype=np.int64)  # (nbits,)

    @pandas_udf(ArrayType(LongType()))
    def sigs(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (n, dim)
        bits = (m @ proj) > 0  # (n, T*nbits)
        bits = bits.reshape(len(vecs), num_tables, nbits)
        out = (bits * masks).sum(axis=2)  # (n, T)
        return pd.Series(list(out))

    return sigs


def lsh_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = 8,
    num_tables: int = 8,
) -> DataFrame:
    """Embedding near-duplicate pairs WITHOUT the all-pairs join: two
    vectors are candidates iff they share a signature bucket in any
    table; only candidates get the exact cosine verification. At
    threshold 0.9 the pair's angle is ~25°, so per-table collision
    probability is (1 - 25/180)^nbits ≈ 0.3 at 8 bits — across 8
    tables recall is ~0.95 while the candidate set stays near-linear
    in corpus size. Returns (id_a, id_b, cos)."""
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # ONE pass computes every table's signature (numpy matmul UDF),
    # then posexplode -> (table, sig) bucket key. Candidates travel as
    # BARE id pairs — carrying the vectors through the bucket joins and
    # the dedup shuffle costs ~60x more bytes per pair (measured 111s
    # -> ~5s at 2000x64 floats). Vectors are attached once, after
    # dedup, via two id joins.
    sig_udf = rp_signatures_np(dim, nbits, num_tables)
    sigs = c.select(
        "id", F.posexplode(sig_udf("v")).alias("tbl", "sig")
    )
    a = sigs.select(F.col("id").alias("id_a"), "tbl", "sig")
    b = sigs.select(F.col("id").alias("id_b"), "tbl", "sig")
    cand = (
        a.join(b, on=["tbl", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = c.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = c.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    scored = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
    )
    return scored.filter(F.col("cos") >= threshold)


def ivf_train_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic coarse quantizer for IVF: seed ``nlist`` centroids
    from the corpus (ordered by xxhash64(id) — reproducible, spread),
    then ``iters`` Lloyd rounds, each fully distributed:

      assign  — numpy argmax-cosine per Arrow batch (pandas UDF)
      update  — posexplode(vec) -> groupBy(cell, pos) -> avg  (one
                shuffle of (cell, pos, partial-sum) triples, map-side
                combined; never the vectors themselves)

    Only the centroid matrix (nlist x dim floats — model parameters,
    not data) ever reaches the driver. Returns list[list[float]].
    """
    import numpy as np

    seed_rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id").cast("string")))
        .limit(nlist)
        .collect()
    )
    centroids = np.array([list(r["v"]) for r in seed_rows], dtype=np.float64)
    vecs = corpus.select(F.col(vec_col).alias("v"))
    for _ in range(iters):
        assign = _nearest_cell_udf(centroids)
        cell_means = (
            vecs.select(assign("v").alias("cell"), F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        nxt = centroids.copy()  # empty cells keep their old centroid
        for r in cell_means:
            nxt[r["cell"]][r["pos"]] = r["m"]
        centroids = nxt
    return [list(map(float, c)) for c in centroids]


def _normalized(centroids):
    import numpy as np

    c = np.asarray(centroids, dtype=np.float64)
    n = np.linalg.norm(c, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return c / n


def _nearest_cell_udf(centroids):
    """array<float> -> int cell id (argmax cosine), one matmul/batch."""
    import numpy as np

    cn = _normalized(centroids)

    @pandas_udf("int")
    def cell(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        return pd.Series(np.argmax(m @ cn.T, axis=1).astype("int32"))

    return cell


def _top_cells_udf(centroids, nprobe: int):
    """array<float> -> array<int> of the nprobe nearest cells."""
    import numpy as np

    cn = _normalized(centroids)

    @pandas_udf(ArrayType(LongType()))
    def cells(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        scores = m @ cn.T  # (n, nlist)
        top = np.argsort(-scores, axis=1)[:, :nprobe]
        return pd.Series(list(top.astype(np.int64)))

    return cells


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """IVF(Flat) ANN top-k: corpus partitioned by nearest-centroid cell;
    each query probes its ``nprobe`` closest cells and exact-reranks
    only those cells' vectors. At scale the corpus assignment is the
    write-side partitioning (cluster-by cell into parquet); here it is
    computed inline. Recall grows with nprobe/nlist; tested against
    brute_force_topk overlap. Pass ``centroids`` (load_centroids) to
    reuse a persisted model instead of retraining."""
    if centroids is None:
        centroids = ivf_train_centroids(corpus, nlist, iters, id_col, vec_col)
    assign = _nearest_cell_udf(centroids)
    probe = _top_cells_udf(centroids, nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        assign(F.col(vec_col)).cast("long").alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(probe(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = 12,
    num_tables: int = 4,
) -> DataFrame:
    """ANN top-k: ``num_tables`` independent signature tables; a pair is
    a candidate if it collides in any table. Exact cosine re-rank of
    candidates only. Recall < 1.0 by design — tested against
    brute_force_topk overlap, not equality."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    sig_udf = rp_signatures_np(dim, nbits, num_tables)
    # One signature pass per side; the query side is tiny and broadcast,
    # so the corpus is scanned once and never reshuffled — the bucket
    # probe is a broadcast-hash join on (table, sig). Corpus vectors do
    # NOT ride through the explode (x num_tables bytes) or the dedup
    # shuffle; they are attached to the surviving candidates by one id
    # join at the end.
    cs = c.select(
        "neighbor_id", F.posexplode(sig_udf("cvec")).alias("tbl", "sig")
    )
    qs = q.select(
        "query_id", "qvec", F.posexplode(sig_udf("qvec")).alias("tbl", "sig")
    )
    cand = (
        cs.join(F.broadcast(qs), on=["tbl", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.join(c, "neighbor_id").select(
        "query_id", "neighbor_id", cosine(F.col("qvec"), F.col("cvec")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    nbits: int = 6,
    num_tables: int = 8,
    grid: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ORACLED TWIN of :func:`lsh_topk` — the same random-hyperplane
    LSH pipeline shape (per-table signatures, any-table collision
    candidates, re-rank of candidates only) under PINNED integer
    parameters that make every value engine-exact (the
    ivf/pq/int8_topk_exact pattern):

    - vectors on the integer micro-grid ``floor(x * grid + 0.5)``;
    - hyperplane component ``w(t, b, d) = (int(md5(f"{t},{b},{d}")
      [:4], 16) % 17) - 8`` — small integers a SQL engine rebuilds
      from its own ``md5()``, no PRNG state to ship;
    - signature bit = ``1 iff <w, gv> >= 0`` (integer dot, exact in
      any summation order), table signature = ``sum(bit << b)``;
    - relevance = the exact integer dot product with id tie-break
      (unnormalized, like the other pinned twins — the float norm is
      an unordered float sum, exactly what pinning removes).

    Output: (query_id, neighbor_id, rank int, dot_g bigint) — a
    DuckDB oracle rebuilds planes, signatures, collisions, and the
    re-rank and must land the identical rows. :func:`lsh_topk`
    (float hyperplanes, cosine re-rank) stays the scale default; its
    recall is pytest-asserted in test_similarity.py."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    W = np.array(
        [
            [
                [
                    (int(hashlib.md5(
                        f"{t},{b},{d}".encode()
                    ).hexdigest()[:4], 16) % 17) - 8
                    for d in range(dim)
                ]
                for b in range(nbits)
            ]
            for t in range(num_tables)
        ],
        dtype=np.int64,
    )  # (T, nbits, dim)
    masks = 1 << np.arange(nbits, dtype=np.int64)

    def _grid(df, name):
        return df.select(
            F.col(id_col).alias(name),
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(
                    x.cast("double") * F.lit(float(grid)) + F.lit(0.5)
                ).cast("long"),
            ).alias("gv"),
        )

    @pandas_udf(ArrayType(LongType()))
    def sigs(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # empty Arrow batch guard (r11 convention)
            return pd.Series([], dtype=object)
        V = np.stack(vecs.to_numpy()).astype(np.int64)  # (n, dim)
        D = np.tensordot(V, W, axes=([1], [2]))  # (n, T, nbits) int64
        bits = (D >= 0).astype(np.int64)
        return pd.Series(list((bits * masks).sum(axis=2)))  # (n, T)

    gc = _grid(corpus, "neighbor_id")
    gq = _grid(queries, "query_id")
    cs = gc.select(
        "neighbor_id", F.posexplode(sigs(F.col("gv"))).alias("tbl", "sig")
    )
    qs = gq.select(
        "query_id", F.posexplode(sigs(F.col("gv"))).alias("tbl", "sig")
    )
    cand = (
        cs.join(F.broadcast(qs), on=["tbl", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id")
    )
    qg = gq.select(F.col("query_id").alias("__qid"), F.col("gv").alias("qgv"))
    scored = (
        cand.join(gc, "neighbor_id")
        .join(F.broadcast(qg), F.col("query_id") == F.col("__qid"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with(F.col("qgv"), F.col("gv"), lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_g"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_g").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("rank").cast("int").alias("rank"), "dot_g",
        )
    )


def lsh_neardup_pairs_exact(
    corpus: DataFrame,
    threshold: float = 0.45,
    dim: int = 64,
    nbits: int = 4,
    num_tables: int = 8,
    grid: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ORACLED TWIN of :func:`lsh_neardup_pairs` — same pipeline shape
    (bucket-join candidates, exact cosine verify on candidates only,
    never all-pairs) with BOTH halves engine-exact: candidates from
    :func:`lsh_topk_exact`'s pinned md5 integer hyperplanes (bucket
    membership replays verbatim), verification by the sequential-fold
    cosine that is already bit-equal to the DuckDB ``_cos_sql``
    convention (embedding_cosine_neardup's precedent), so the
    threshold cut selects the identical pair set. Returns
    (id_a, id_b, cos)."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    W = np.array(
        [
            [
                [
                    (int(hashlib.md5(
                        f"{t},{b},{d}".encode()
                    ).hexdigest()[:4], 16) % 17) - 8
                    for d in range(dim)
                ]
                for b in range(nbits)
            ]
            for t in range(num_tables)
        ],
        dtype=np.int64,
    )
    masks = 1 << np.arange(nbits, dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def sigs_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.floor(
            np.stack(vecs.to_numpy()).astype(np.float64) * float(grid)
            + 0.5
        ).astype(np.int64)
        D = np.tensordot(V, W, axes=([1], [2]))
        bits = (D >= 0).astype(np.int64)
        return pd.Series(list((bits * masks).sum(axis=2)))

    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    sigs = c.select("id", F.posexplode(sigs_udf("v")).alias("tbl", "sig"))
    a = sigs.select(F.col("id").alias("id_a"), "tbl", "sig")
    b = sigs.select(F.col("id").alias("id_b"), "tbl", "sig")
    cand = (
        a.join(b, on=["tbl", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = c.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = c.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b",
            cosine(F.col("va"), F.col("vb")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# --------------------------------------------------------------------------
# Product quantization (PQ/ADC) — the memory-bound ANN scale path
# --------------------------------------------------------------------------
def pq_train_codebooks(
    corpus: DataFrame,
    m: int = 16,
    ksub: int = 64,
    iters: int = 5,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train per-subspace codebooks on a deterministic corpus sample.

    Vectors are L2-normalized, split into ``m`` contiguous subspaces,
    and each subspace gets ``ksub`` Lloyd-iterated L2 centroids.
    Training on a bounded sample is the standard PQ recipe (the
    codebook is model parameters, size m*ksub*dsub floats — constant
    in corpus size); the sample is drawn by xxhash64 order so it is
    reproducible and partitioning-independent. Returns an
    (m, ksub, dim/m) float64 numpy array.
    """
    import numpy as np

    rows = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(sample)
        .collect()
    )
    X = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    if len(X) < ksub:
        raise ValueError(
            f"PQ codebook training needs >= ksub={ksub} sample vectors, "
            f"got {len(X)}; lower ksub or raise the sample size"
        )
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    X = X / n
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    codebooks = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[:ksub].copy()  # deterministic seeding from the hash-ordered sample
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(ksub):
                hit = a == c
                if hit.any():
                    C[c] = S[hit].mean(axis=0)
        codebooks[j] = C
    return codebooks


def _pq_encode_udf(codebooks):
    """array<float> vector -> array<int> of m codes (nearest codeword
    per subspace on the normalized vector), one vectorized pass per
    Arrow batch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, ksub, dsub = codebooks.shape

    @pandas_udf("array<int>")
    def enc(vecs: pd.Series) -> pd.Series:
        V = np.stack(vecs.to_numpy()).astype(np.float64)
        n = np.linalg.norm(V, axis=1, keepdims=True)
        n[n == 0] = 1.0
        V = V / n
        codes = np.empty((V.shape[0], m), dtype=np.int32)
        for j in range(m):
            S = V[:, j * dsub : (j + 1) * dsub]
            d2 = ((S[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return enc


def _adc_score_block(luts, qids, C, ids, m, nper):
    """ADC-score one block of codes against per-query LUTs and keep
    each query's top ``nper`` (shared by the driver-LUT and the
    distributed-LUT paths — bit-identical candidates by construction).
    """
    import numpy as np
    import pandas as pd

    out_q, out_n, out_s = [], [], []
    for qi in range(len(qids)):
        # ADC: sum over subspaces of LUT[j][code_j] ~= cos(q, v)
        s = luts[qi][np.arange(m)[None, :], C].sum(axis=1)
        mask = ids != qids[qi]
        s_m, ids_m = s[mask], ids[mask]
        top = np.argsort(-s_m, kind="stable")[:nper]
        out_q.append(np.full(len(top), qids[qi]))
        out_n.append(ids_m[top])
        out_s.append(s_m[top])
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q) if out_q else [],
            "neighbor_id": np.concatenate(out_n) if out_n else [],
            "adc": np.concatenate(out_s) if out_s else [],
        }
    )


def _query_luts(Q, codebooks, m):
    """Normalized-query ADC lookup tables: (n_queries, m, ksub)."""
    import numpy as np

    dsub = codebooks.shape[2]
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn
    return np.einsum("qjd,jkd->qjk", Qn.reshape(len(Q), m, dsub), codebooks)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 16,
    ksub: int = 64,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks=None,
    distribute_queries: bool = False,
) -> DataFrame:
    """PQ/ADC ANN top-k with exact re-rank.

    The corpus is stored as m-byte codes (here m ints; 8 bytes/vector
    vs 256 for float32x64 — the 32x compression that lets 100 TB of
    embeddings fit a cluster's RAM). Each executor scores codes against
    per-query lookup tables (LUT[j][code] = dot(q_subspace,
    codeword_j)) — a gather+sum per row, no float vector ever
    rescanned — keeps the per-partition top k*refine, and only those
    candidates fetch their full vector for the exact cosine re-rank.

    Two LUT strategies, identical results (pytest-asserted):

    - ``distribute_queries=False`` (default): queries are collected to
      the driver (they are the small side — same broadcast assumption
      as brute_force_topk) and ship inside the UDF closure as LUTs,
      never as a join. Right for small query sets.
    - ``distribute_queries=True``: queries never touch the driver —
      they replicate to each corpus-code partition through a broadcast
      join and a cogrouped ``applyInPandas`` builds each partition's
      LUTs executor-side (the same grouped split mmr_topk uses). Right
      when the query set is itself large; the replication cost is
      queries × partitions, the standard fan-out price.
    """
    import numpy as np
    import pandas as pd

    if codebooks is None:
        codebooks = pq_train_codebooks(
            corpus, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
        )
    nper = k * refine
    enc = _pq_encode_udf(codebooks)
    codes = corpus.select(
        F.col(id_col).alias("neighbor_id"), enc(F.col(vec_col)).alias("codes")
    )

    if distribute_queries:
        # explicit hash buckets (NOT physical partition ids — those
        # are plan-dependent and ambiguous under self-join lineage):
        # each code row lands in one of B buckets, and every query
        # replicates to every bucket via a degenerate equi-join on a
        # literal key (broadcast hash join, never a cartesian plan).
        n_buckets = corpus.sparkSession.sparkContext.defaultParallelism
        pids = codes.select(
            F.pmod(F.hash("neighbor_id"), F.lit(n_buckets)).alias("pid"),
            "neighbor_id",
            "codes",
        )
        pid_keys = (
            corpus.sparkSession.range(n_buckets)
            .select(F.col("id").cast("int").alias("pid"))
            .withColumn("__one", F.lit(1))
        )
        q = queries.select(
            F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
        ).withColumn("__one", F.lit(1))
        qrep = q.join(F.broadcast(pid_keys), "__one").drop("__one")

        def score_group(codes_pdf, q_pdf):
            if codes_pdf.empty or q_pdf.empty:
                return pd.DataFrame(
                    {"query_id": [], "neighbor_id": [], "adc": []}
                )
            C = np.stack(codes_pdf["codes"].to_numpy())
            ids = codes_pdf["neighbor_id"].to_numpy()
            qids = q_pdf["qid"].to_numpy()
            Q = np.array([list(v) for v in q_pdf["qv"]], dtype=np.float64)
            luts = _query_luts(Q, codebooks, m)
            return _adc_score_block(luts, qids, C, ids, m, nper)

        cand = (
            pids.groupBy("pid")
            .cogroup(qrep.groupBy("pid"))
            .applyInPandas(
                score_group, "query_id long, neighbor_id long, adc double"
            )
        )
    else:
        qrows = queries.select(
            F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
        ).collect()
        qids = np.array([r["qid"] for r in qrows])
        Q = np.array([list(r["qv"]) for r in qrows], dtype=np.float64)
        luts = _query_luts(Q, codebooks, m)

        def score_partition(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                C = np.stack(pdf["codes"].to_numpy())  # (B, m)
                ids = pdf["neighbor_id"].to_numpy()
                yield _adc_score_block(luts, qids, C, ids, m, nper)

        cand = codes.mapInPandas(
            score_partition, "query_id long, neighbor_id long, adc double"
        )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    short = (
        cand.withColumn("__r", F.row_number().over(w_adc))
        .filter(F.col("__r") <= nper)
        .drop("__r", "adc")
    )
    # Exact re-rank: only ~k*refine vectors per query are fetched.
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    scored = short.join(cv, "neighbor_id").join(F.broadcast(qv), "query_id").select(
        "query_id", "neighbor_id", cosine(F.col("qvec"), F.col("cvec")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# --------------------------------------------------------------------------
# Model persistence — trained ANN artifacts (IVF centroids, PQ
# codebooks) are model parameters, not data: train once on a sample,
# persist as parquet, reuse across jobs/sessions. At 100 TB retraining
# per query would re-scan the corpus sample every time; a saved model
# is a broadcast-sized read.
# --------------------------------------------------------------------------
def save_centroids(spark, centroids, path: str) -> None:
    """Persist an IVF centroid matrix as (cell, vec) parquet rows."""
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    spark.createDataFrame(rows, "cell int, vec array<double>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_centroids(spark, path: str):
    rows = spark.read.parquet(path).orderBy("cell").collect()
    return [list(r["vec"]) for r in rows]


def save_codebooks(spark, codebooks, path: str) -> None:
    """Persist PQ codebooks as (subspace, code, vec) parquet rows."""
    m, ksub, _ = codebooks.shape
    rows = [
        (j, c, [float(x) for x in codebooks[j][c]])
        for j in range(m)
        for c in range(ksub)
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_codebooks(spark, path: str):
    import numpy as np

    rows = spark.read.parquet(path).orderBy("subspace", "code").collect()
    m = max(r["subspace"] for r in rows) + 1
    ksub = max(r["code"] for r in rows) + 1
    dsub = len(rows[0]["vec"])
    cb = np.empty((m, ksub, dsub), dtype=np.float64)
    for r in rows:
        cb[r["subspace"]][r["code"]] = r["vec"]
    return cb


# --------------------------------------------------------------------------
# IVF serving path: write-side clustering + partition-pruned probes
# --------------------------------------------------------------------------
def write_ivf_clustered(
    corpus: DataFrame,
    centroids,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the corpus partitioned by IVF cell (``cell=N/``
    directories). This is what 'the corpus assignment is the write-side
    partitioning' means at scale: a query probing ``nprobe`` cells then
    READS only those directories — partition pruning turns ANN serving
    into a fraction-of-corpus scan, no index server required."""
    assign = _nearest_cell_udf(centroids)
    (
        corpus.select(
            F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).cast("int").alias("cell")
        )
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_topk_served(
    spark,
    path: str,
    queries: DataFrame,
    centroids,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against a ``write_ivf_clustered`` layout: per-query
    probe cells come from the persisted model, the scan carries a
    ``cell IN (...)`` predicate that prunes to the probed directories,
    and only those cells' vectors are exact-reranked. Identical
    candidate semantics to the inline ``ivf_topk`` under the same
    centroids — asserted in tests."""
    probe = _top_cells_udf(centroids, nprobe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(probe(F.col(vec_col))).alias("cell"),
    )
    probed = [int(r["cell"]) for r in q.select("cell").distinct().collect()]
    if not probed:
        # empty query side -> empty result with the stable schema
        return spark.createDataFrame(
            [],
            "query_id long, neighbor_id long, cos double, rank int",
        )
    c = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(probed))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cvec"),
            F.col("cell").cast("long").alias("cell"),
        )
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("qvec"), F.col("cvec")).alias("cos")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the IVF k-means coarse
    quantizer, then prune within each cluster — a member is a semantic
    duplicate if its cosine to any LOWER-ID member of the same cluster
    is >= ``threshold``. Greedy-by-id makes the survivor set
    deterministic (the paper prunes in random order; id order is the
    reproducible equivalent).

    This is an LLM-pipeline operator the reference engine has no
    analogue for (its nearest surface is exact-match CSV dedup): it
    removes *semantically* redundant documents that no exact or
    near-exact (minhash) pass can see.

    Returns (id, cell, keep, max_cos_earlier) for every corpus row.

    Scale: the O(n^2) pairwise work is confined to one cluster per
    task — exactly the SemDeDup recipe, where nlist is chosen so the
    expected cluster (N/nlist) fits a worker (the paper uses 50k
    clusters for 100M+ docs; cost per cluster is one (m x dim) @
    (dim x m) matmul). The cluster assignment is one Arrow-batched
    matmul pass; the groupBy("cell") shuffles each vector exactly
    once, keyed by cell. Only the nlist x dim centroid matrix ever
    reaches the driver.
    """
    import numpy as np

    if centroids is None:
        centroids = ivf_train_centroids(corpus, nlist, iters, id_col, vec_col)
    assign = _nearest_cell_udf(centroids)
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        assign(F.col(vec_col)).cast("long").alias("cell"),
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        m = m / n
        g = m @ m.T
        # max cosine to any strictly-earlier (lower-id) cluster member;
        # diagonal and upper triangle masked so row 0 reports -1.0
        g[np.triu_indices(len(m))] = -1.0
        mx = g.max(axis=1, initial=-1.0)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "cell": pdf["cell"],
                "keep": mx < threshold,
                "max_cos_earlier": mx,
            }
        )

    out_schema = "id long, cell long, keep boolean, max_cos_earlier double"
    return c.groupBy("cell").applyInPandas(prune, schema=out_schema)


def semantic_dedup_exact(
    corpus: DataFrame,
    threshold_e6: int = 950_000,
    nlist: int = 16,
    grid: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`semantic_dedup` in the PINNED ORACLE MODE (8th pinned
    twin, the ivf_topk_exact recipe end to end): integer micro-grid
    vectors, iters=0 md5-ordered centroid seed, (distance, index)
    total-ordered assignment — then the SemDeDup greedy prune runs on
    cosines whose every input is exact (int64 grid dots; one sqrt +
    one multiply + one divide, correctly rounded identically in any
    IEEE engine) and whose decision lattice is integer micro-units
    (``floor(cos * 1e6)`` per pair, MAX over earlier members, compare
    against ``threshold_e6``). DuckDB rebuilds centroids, cells, and
    the per-pair floors and must land the identical keep set — cluster
    membership AND the prune verdict are value-hash graded
    (queries/extensions.py dedup_semantic). The learned-centroid float
    :func:`semantic_dedup` stays the serving default.

    Scale shape unchanged: one assignment pass, one groupBy(cell)
    shuffle, O(cluster²) work confined per task; only the nlist x dim
    centroid matrix reaches the driver. Returns (id, cell, keep,
    max_cos_e6) for every corpus row; the first member of a cell
    reports the pinned sentinel -1_000_000.
    """
    import numpy as np

    def _grid(df):
        return df.select(
            F.col(id_col).alias("id"),
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(
                    x.cast("double") * F.lit(float(grid)) + F.lit(0.5)
                ).cast("long"),
            ).alias("gv"),
        )

    gc = _grid(corpus)
    sample = (
        gc.withColumn("__h", F.md5(F.col("id").cast("string")))
        .orderBy("__h")
        .limit(nlist)
        .collect()
    )  # model-sized driver collect, same class as ivf_train_centroids
    C = np.array([list(r["gv"]) for r in sample], dtype=np.int64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        V = np.stack(vecs.to_numpy()).astype(np.int64)
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1))  # first min = smallest idx

    c = gc.select(
        "id", "gv", assign(F.col("gv")).cast("long").alias("cell")
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        V = np.stack(pdf["gv"].to_numpy()).astype(np.int64)
        G = V @ V.T  # exact int64 (grid dots bounded ~dim*grid² << 2^63)
        nrm = np.sqrt(np.diag(G).astype(np.float64))
        # per-pair ops mirror the oracle exactly: int-dot -> /(norm_i *
        # norm_j) -> *1e6 -> floor — elementwise IEEE, so vectorizing
        # changes nothing (no reassociation happens inside np.floor/
        # divide/multiply)
        c_e6 = np.floor(
            G.astype(np.float64) / np.outer(nrm, nrm) * 1_000_000.0
        )
        c_e6[np.triu_indices(len(V))] = -1_000_000.0  # self + later ids
        mx = np.maximum(
            c_e6.max(axis=1, initial=-1_000_000.0), -1_000_000.0
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "cell": pdf["cell"],
                "keep": mx < threshold_e6,
                "max_cos_e6": mx,
            }
        )

    out_schema = "id long, cell long, keep boolean, max_cos_e6 long"
    return c.groupBy("cell").applyInPandas(prune, schema=out_schema)


def mean_vector(corpus: DataFrame, vec_col: str = "embedding") -> list[float]:
    """Distributed column-mean of an embedding column: posexplode ->
    groupBy(pos) -> avg. One map-side-combined shuffle of (pos,
    partial) pairs; only the dim-length mean reaches the driver."""
    rows = (
        corpus.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    out = [0.0] * len(rows)
    for r in rows:
        out[r["pos"]] = float(r["m"])
    return out


def power_iteration_pc1(
    corpus: DataFrame,
    iters: int = 8,
    vec_col: str = "embedding",
    center: bool = True,
):
    """First principal component of the embedding cloud by distributed
    power iteration on the (never materialized) covariance matrix.

    Each iteration computes y = sum_i (v_i . x) * v_i as two fused
    DataFrame steps: a codegen dot product per row, then a
    posexplode -> groupBy(pos) -> sum((v_i.x) * v_ij) shuffle of
    (pos, partial-sum) pairs — map-side combined, so the shuffle
    volume is #partitions * dim regardless of corpus size. Only the
    dim-length iterate (model parameters) ever reaches the driver;
    the dim x dim covariance never exists anywhere.

    With ``center=True`` the mean vector is computed once (one extra
    pass) and subtracted inside the expression, giving true PCA; the
    data is never rewritten. Start vector is all-ones/sqrt(dim) —
    deterministic, and non-orthogonal to PC1 for any non-adversarial
    cloud.

    Returns (component: list[float] unit-norm, eigenvalue: float
    Rayleigh quotient of the covariance scaled by N, i.e. explained
    sum of squares).
    """
    import math

    head = corpus.select(F.size(F.col(vec_col)).alias("d")).head()
    if head is None:
        raise ValueError("power_iteration_pc1: empty corpus")
    dim = head["d"]
    mu = mean_vector(corpus, vec_col) if center else [0.0] * dim
    mu_lit = F.array(*[F.lit(c) for c in mu])
    v = F.zip_with(F.col(vec_col), mu_lit, lambda a, b: a - b)
    vecs = corpus.select(v.alias("v"))
    x = [1.0 / math.sqrt(dim)] * dim
    lam = 0.0
    for _ in range(iters):
        x_lit = F.array(*[F.lit(float(c)) for c in x])
        t = vecs.select(
            dot(F.col("v"), x_lit).alias("s"),
            F.posexplode(F.col("v")).alias("pos", "vj"),
        )
        rows = (
            t.groupBy("pos")
            .agg(F.sum(F.col("s") * F.col("vj")).alias("y"))
            .collect()
        )
        y = [0.0] * dim
        for r in rows:
            y[r["pos"]] = float(r["y"])
        nrm = math.sqrt(sum(c * c for c in y))
        if nrm == 0.0:
            break
        lam = sum(a * b for a, b in zip(x, y))  # Rayleigh: x . (A x)
        x = [c / nrm for c in y]
    return x, lam


def power_iteration_pc1_exact(
    corpus: DataFrame,
    iters: int = 6,
    q: int = 10_000,
    grid: int = 1000,
    vec_col: str = "embedding",
) -> "list[int]":
    """:func:`power_iteration_pc1` in the PINNED ORACLE MODE (9th
    pinned twin): the iterate lives on an integer lattice — grid
    vectors ``floor(x*grid + 0.5)``, start vector all-``q``, each
    round ``s_i = <gv_i, x>`` then ``y_j = sum_i s_i * gv_ij`` in
    exact int64, then renormalization by TRUNCATING division
    ``(y_j * q) / max|y|`` (DuckDB's ``//`` truncates toward zero;
    Python replicates with a sign-split floor) — so every round is
    engine-replayable and the final direction value-hashes
    (queries/extensions.py embedding_pca_pc1). Uncentered by design
    (a float mean would break the lattice); the centered float twin
    stays the serving default with its numpy-eigh differential tests.

    Overflow audit at the registered parameters: |gv| <= ~grid,
    |x| <= q, so s_i <= dim*grid*q ~ 6e11 and y_j <= n*s*grid ~ 4e17
    at n=2000 — inside int64 with 20x headroom (ANSI mode would throw
    on a violation, a built-in canary). The ``y*q`` renormalization
    product runs in Python/HUGEINT where width is unbounded.

    Same distributed shape as the float twin: per-round codegen dot +
    one map-side-combined (pos, partial) shuffle; only the dim-length
    iterate reaches the driver. Returns the final integer loading
    vector (list of dim ints in [-q, q])."""

    def tdiv(a: int, b: int) -> int:
        # truncating integer division (DuckDB // semantics); Python's
        # // floors, which differs on negative numerators
        return -((-a) // b) if (a < 0) != (b < 0) else a // b

    head = corpus.select(F.size(F.col(vec_col)).alias("d")).head()
    if head is None:
        raise ValueError("power_iteration_pc1_exact: empty corpus")
    dim = head["d"]
    gvec = corpus.select(
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * F.lit(float(grid)) + F.lit(0.5)
            ).cast("long"),
        ).alias("v")
    )
    x = [q] * dim
    for _ in range(iters):
        x_lit = F.array(*[F.lit(int(c)).cast("long") for c in x])
        t = gvec.select(
            F.aggregate(
                F.zip_with(F.col("v"), x_lit, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, z: acc + z,
            ).alias("s"),
            F.posexplode(F.col("v")).alias("pos", "vj"),
        )
        rows = (
            t.groupBy("pos")
            .agg(F.sum(F.col("s") * F.col("vj")).alias("y"))
            .collect()
        )
        y = [0] * dim
        for r in rows:
            y[r["pos"]] = int(r["y"])
        mx = max(abs(c) for c in y)
        if mx == 0:
            break
        x = [tdiv(c * q, mx) for c in y]
    return x


# ------------------------------------------------------------------ int8
def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    q_i = round(x_i / scale). Adds ``q`` (array<int>, values in
    [-127,127]) and ``q_scale`` (double).

    The storage/bandwidth story of scalar-quantized ANN indexes
    (FAISS SQ8): 4x smaller vectors than float32, integer dot
    products downstream. All codegen transform/array_max — no UDF,
    no shuffle; an all-zero vector quantizes to zeros (scale kept
    positive to avoid div-by-zero).
    """
    v = F.col(vec_col)
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))).cast("double")
        / F.lit(127.0),
        F.lit(1e-30),
    )
    return df.withColumn(scale_col, scale).withColumn(
        q_col,
        F.transform(v, lambda x: F.round(x.cast("double") / F.col(scale_col)).cast("int")),
    )


def int8_dot(qa, qb, scale_a, scale_b):
    """Reconstructed dot product of two int8-quantized vectors: the
    integer zip_with/aggregate runs in exact int64 arithmetic, the two
    scales multiply back at the end. Codegen, no UDF."""
    acc = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return acc.cast("double") * scale_a * scale_b


def int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k in int8 space: both sides quantized,
    scores from integer dot products (cosine ~= reconstructed dot over
    reconstructed norms). Same (query_id, neighbor_id, rank) contract
    as ``brute_force_topk``; recall vs the float path is pytest-
    asserted (>0.9 at dim 64). The scan moves 1/4 of the bytes of the
    float path — the shape that matters when the corpus is 100 TB of
    vectors."""
    q = quantize_int8(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("v")),
        "v", "qq", "qs",
    ).drop("v")
    c = quantize_int8(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")),
        "v", "cq", "cs",
    ).drop("v")
    dotr = int8_dot(F.col("qq"), F.col("cq"), F.col("qs"), F.col("cs"))
    nq = F.sqrt(int8_dot(F.col("qq"), F.col("qq"), F.col("qs"), F.col("qs")))
    nc = F.sqrt(int8_dot(F.col("cq"), F.col("cq"), F.col("cs"), F.col("cs")))
    scored = c.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        (dotr / (nq * nc)).alias("cos8"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos8").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos8", "rank")
    )


def ivf_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    grid: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ORACLED TWIN of :func:`ivf_topk` — the same IVF(Flat) pipeline
    shape (coarse cells, nprobe probing, re-rank of only the probed
    cells' vectors) under PINNED parameters that make every value
    engine-exact (the pq_topk_exact pattern):

    - vectors on the integer micro-grid ``floor(x * grid + 0.5)``;
    - centroids = the ITERS=0 seeding of the trainer: the first
      ``nlist`` corpus vectors in ``md5(vec_id)`` order;
    - assignment/probing by integer squared distance with
      (distance, centroid-index) total order;
    - relevance = the exact integer dot product (unnormalized — the
      production twin ranks cosine; the pinned mode trades the float
      norm, an unordered float sum, for engine-exactness).

    Output integers only: (query_id, neighbor_id, rank, dot_g, cell).
    :func:`ivf_topk` (learned Lloyd centroids, cosine) stays the
    scale default; its recall is pytest-asserted."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _grid(df, name):
        return df.select(
            F.col(id_col).alias(name),
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(
                    x.cast("double") * F.lit(float(grid)) + F.lit(0.5)
                ).cast("long"),
            ).alias("gv"),
        )

    gc = _grid(corpus, "neighbor_id")
    gq = _grid(queries, "query_id")
    sample = (
        gc.withColumn("__h", F.md5(F.col("neighbor_id").cast("string")))
        .orderBy("__h")
        .limit(nlist)
        .collect()
    )  # model-sized driver collect, same class as ivf_train_centroids
    C = np.array([list(r["gv"]) for r in sample], dtype=np.int64)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # empty Arrow batch: np.stack([]) raises
            return pd.Series([], dtype="int32")
        V = np.stack(vecs.to_numpy()).astype(np.int64)
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1))  # first min = smallest idx

    cells = gc.select(
        "neighbor_id", "gv", assign(F.col("gv")).cast("long").alias("cell")
    )
    # probes computed driver-side over the SMALL query set (same
    # broadcast assumption as ivf_topk's probe UDF closure)
    qrows = gq.collect()
    probe_rows = []
    for r in qrows:
        qv = np.array(list(r["gv"]), dtype=np.int64)
        d2 = ((C - qv[None, :]) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(nlist), d2))[:nprobe]
        probe_rows += [(int(r["query_id"]), int(c)) for c in order]
    probes = corpus.sparkSession.createDataFrame(
        probe_rows, "query_id long, cell long"
    )
    qg = gq.select(
        F.col("query_id").alias("__qid"), F.col("gv").alias("qgv")
    )
    scored = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(qg), F.col("query_id") == F.col("__qid"))
        .select(
            "query_id",
            "neighbor_id",
            "cell",
            F.aggregate(
                F.zip_with(F.col("qgv"), F.col("gv"), lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_g"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_g").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot_g", "cell")
    )


def pq_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 16,
    ksub: int = 64,
    refine: int = 4,
    grid: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ORACLED TWIN of :func:`pq_topk` — the same PQ/ADC pipeline
    shape (encode corpus to m codes, ADC-score against per-query
    LUTs, shortlist k*refine, exact re-rank) under PINNED parameters
    that make every value engine-exact (the pinned-parameter
    apply-step pattern: learning is unconvertible, applying a pinned
    model is):

    - vectors pre-quantized to an integer micro-grid
      ``floor(x * grid + 0.5)`` (no L2 normalization — a float norm is
      an unordered float sum, the classic unconvertible);
    - the codebook is the ITERS=0 seeding of the production trainer:
      the first ``ksub`` corpus vectors in ``md5(vec_id)`` order,
      split into subvectors (pinned sample order: md5 is identical
      everywhere; xxhash64, the scale default, is not in DuckDB);
    - encoding = integer argmin of squared distance per subspace
      (first-min tie-break = smallest codeword index, numpy's argmin
      AND the SQL ``ORDER BY d2, kidx LIMIT 1`` agree);
    - ADC = integer LUT-gather sums (order-free), shortlist and final
      rank totally ordered by (score DESC, neighbor_id ASC);
    - exact re-rank = full integer dot product on the grid vectors.

    Output integers only: (query_id, neighbor_id, rank, dot_g, adc).
    :func:`pq_topk` (learned Lloyd codebooks, normalized floats)
    stays the scale default; its recall is pytest-asserted."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _grid(df, name):
        return df.select(
            F.col(id_col).alias(name),
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(
                    x.cast("double") * F.lit(float(grid)) + F.lit(0.5)
                ).cast("long"),
            ).alias("gv"),
        )

    gc = _grid(corpus, "neighbor_id")
    gq = _grid(queries, "query_id")
    # pinned codebook: model-sized driver collect (ksub rows), the
    # same bounded-collect class as pq_train_codebooks' sample
    sample = (
        gc.withColumn("__h", F.md5(F.col("neighbor_id").cast("string")))
        .orderBy("__h")
        .limit(ksub)
        .collect()
    )
    CB = np.array([list(r["gv"]) for r in sample], dtype=np.int64)
    dim = CB.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    CBr = np.ascontiguousarray(
        CB.reshape(ksub, m, dsub).transpose(1, 0, 2)
    )  # (m, ksub, dsub)

    @pandas_udf("array<int>")
    def enc(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # empty Arrow batch: np.stack([]) raises
            return pd.Series([], dtype=object)
        V = np.stack(vecs.to_numpy()).astype(np.int64).reshape(
            -1, m, dsub
        )
        codes = np.empty((V.shape[0], m), dtype=np.int32)
        for j in range(m):
            d2 = ((V[:, j, None, :] - CBr[j][None, :, :]) ** 2).sum(
                axis=2
            )
            codes[:, j] = d2.argmin(axis=1)  # first min = smallest kidx
        return pd.Series(list(codes))

    codes = gc.select("neighbor_id", enc(F.col("gv")).alias("codes"))
    # integer per-query LUTs ship in the closure (queries are the
    # small side, same assumption as pq_topk's default path)
    qrows = gq.collect()
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Qg = np.stack([np.array(list(r["gv"]), dtype=np.int64) for r in qrows])
    luts = np.einsum(
        "qjd,jkd->qjk", Qg.reshape(len(Qg), m, dsub), CBr
    )  # exact: integer einsum

    nper = k * refine

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:  # empty partition batch
                continue
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            ids = pdf["neighbor_id"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids)):
                s = luts[qi][np.arange(m)[None, :], C].sum(axis=1)
                mask = ids != qids[qi]
                s_m, ids_m = s[mask], ids[mask]
                # block-local top under the TOTAL order (-adc, id):
                # global top-nper of block tops is then exactly the
                # global top-nper (distributive top-k)
                order = np.lexsort((ids_m, -s_m))[:nper]
                out_q.append(np.full(len(order), qids[qi]))
                out_n.append(ids_m[order])
                out_s.append(s_m[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q) if out_q else [],
                    "neighbor_id": np.concatenate(out_n) if out_n else [],
                    "adc": np.concatenate(out_s) if out_s else [],
                }
            )

    cands = codes.mapInPandas(
        score, "query_id long, neighbor_id long, adc long"
    )
    wS = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    shortlist = cands.withColumn(
        "__rk", F.row_number().over(wS)
    ).filter(F.col("__rk") <= nper).drop("__rk")
    # exact integer re-rank on the grid vectors
    qg = gq.select(
        F.col("query_id").alias("__qid"), F.col("gv").alias("qgv")
    )
    rer = (
        shortlist.join(gc, "neighbor_id")
        .join(
            F.broadcast(qg), F.col("query_id") == F.col("__qid")
        )
        .select(
            "query_id",
            "neighbor_id",
            "adc",
            F.aggregate(
                F.zip_with(
                    F.col("qgv"), F.col("gv"), lambda x, y: x * y
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_g"),
        )
    )
    wF = Window.partitionBy("query_id").orderBy(
        F.col("dot_g").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(wF))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot_g", "adc")
    )


def int8_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ORACLED TWIN of :func:`int8_topk` — same SQ8 brute-force top-k
    shape, with every value engine-exact so a SQL oracle (DuckDB) can
    replay it value-for-value:

    - quantizer pinned to ``floor(x/scale + 0.5)`` (F.round is
      HALF_UP, numpy rint is banker's, DuckDB round() is half-away —
      the MODE must be pinned; the md5-hash-mode precedent);
    - the ranking key is the rational ``sign(dot) * dot^2 / |c|^2``
      computed from EXACT int64 dot products (dot^2 <= ~1.1e12 < 2^53,
      so the one double division is correctly rounded identically in
      every IEEE engine) — ordering is identical to cosine because the
      query's norm is constant per query and the quantization scales
      cancel;
    - output columns are integers only: (query_id, neighbor_id, rank,
      dot_q = int dot, cnorm2 = int |c|^2).

    :func:`int8_topk` (HALF_UP + float cosine) stays the scale
    default; this variant exists so the estimator itself is
    value-hash-graded rather than only recall-asserted."""
    def _quant(df, idname):
        v = F.col("v")
        scale = F.greatest(
            F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
            / F.lit(127.0),
            F.lit(1e-30),
        )
        return (
            df.withColumn("__sc", scale)
            .withColumn(
                "q",
                F.transform(
                    v,
                    lambda x: F.floor(
                        x.cast("double") / F.col("__sc") + F.lit(0.5)
                    ).cast("long"),
                ),
            )
            .drop("v", "__sc")
        )

    q = _quant(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("v")
        ),
        "query_id",
    ).withColumnRenamed("q", "qq")
    c = _quant(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")
        ),
        "neighbor_id",
    ).withColumnRenamed("q", "cq")

    def _idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored = c.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        _idot(F.col("qq"), F.col("cq")).alias("dot_q"),
        _idot(F.col("cq"), F.col("cq")).alias("cnorm2"),
    )
    key = (
        (F.col("dot_q") * F.abs(F.col("dot_q"))).cast("double")
        / F.col("cnorm2").cast("double")
    )
    w = Window.partitionBy("query_id").orderBy(
        key.desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot_q", "cnorm2")
    )


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    lambda_: float = 0.5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversified top-k via Maximal Marginal Relevance (Carbonell &
    Goldstein, SIGIR'98): greedily pick the candidate maximizing
    ``lambda * cos(q, d) - (1 - lambda) * max_{s in selected}
    cos(d, s)`` — relevance traded against redundancy, so a cluster of
    near-duplicate hits yields ONE representative instead of filling
    the whole result list (the retrieval-side mirror of SemDeDup).

    Two stages, the standard scale split: (1) DISTRIBUTED exact-cosine
    shortlist of the top ``shortlist`` candidates per query (the
    corpus-sized work — same plan as brute_force_topk; swap in
    ivf_topk for an ANN shortlist); (2) greedy MMR per query, run
    EXECUTOR-SIDE as a grouped ``applyInPandas`` over ``query_id`` —
    each group is one shortlist (O(k * shortlist) dot products on
    ``shortlist`` rows), so stage 2 scales out with the query count
    instead of collecting n_queries * shortlist vectors to the driver.
    Deterministic: ties break on candidate id. Returns (query_id,
    neighbor_id, cos, rank) with rank = MMR selection order.
    """
    cands = brute_force_topk(
        corpus, queries, k=shortlist, id_col=id_col, vec_col=vec_col
    )
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")
    )

    def greedy_mmr(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(
            ["cos", "neighbor_id"], ascending=[False, True]
        ).reset_index(drop=True)
        ids = pdf["neighbor_id"].to_numpy()
        rel = pdf["cos"].to_numpy(dtype=np.float64)
        V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        Vn = V / norms[:, None]
        sim = Vn @ Vn.T  # shortlist x shortlist, bounded per group
        selected: list[int] = []
        remaining = list(range(len(pdf)))
        while remaining and len(selected) < k:
            if selected:
                redundancy = sim[np.ix_(remaining, selected)].max(axis=1)
            else:
                redundancy = np.zeros(len(remaining))
            score = lambda_ * rel[remaining] - (1.0 - lambda_) * redundancy
            # deterministic argmax: best score, then smallest id
            best = min(
                range(len(remaining)),
                key=lambda i: (-score[i], ids[remaining[i]]),
            )
            selected.append(remaining.pop(best))
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[selected].to_numpy(),
                "neighbor_id": ids[selected],
                "cos": rel[selected],
                "rank": np.arange(1, len(selected) + 1, dtype=np.int32),
            }
        )

    return (
        cands.join(vecs, "neighbor_id")
        .select("query_id", "neighbor_id", "cos", "v")
        .groupBy("query_id")
        .applyInPandas(
            greedy_mmr,
            "query_id long, neighbor_id long, cos double, rank int",
        )
    )


def mmr_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    lambda_num: int = 1,
    lambda_den: int = 2,
    shortlist: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`mmr_topk` in the PINNED ORACLE MODE (the repo's
    md5-band / integer-grid twin convention, 6th instance): the greedy
    trade-off runs on INTEGER micro-unit cosines with a RATIONAL
    lambda = lambda_num/lambda_den, so every selection comparison —
    ``lambda*rel - (1-lambda)*redundancy`` scaled by lambda_den to
    ``p*rel_e6 - (q-p)*red_e6`` — is exact int64 arithmetic that any
    engine replays bit-identically (DuckDB unrolls the k greedy steps
    as plain CTEs, see queries/extensions.py sim_mmr_topk).

    What stays exact without being quantized: the cosines themselves.
    Both the shortlist relevance and the pairwise redundancy use the
    proven left-fold double cosine (``dot`` above ≡ DuckDB
    ``list_reduce`` ≡ the Python loop below — IEEE ops in the same
    order are bit-identical, the sim_bruteforce_topk precedent), and
    only the final ``floor(cos * 1e6)`` lands in the comparison, so
    quantization can never disagree between engines. Tie-breaks pin to
    (score DESC, id ASC); the first pick ranks by rel_e6, exactly as
    the oracle's step-1 CTE.

    Scale shape = mmr_topk's, unchanged: distributed exact-cosine
    shortlist, then grouped applyInPandas per query (O(k*shortlist)
    memoized pair cosines per group — executor-side, never driver).
    The float twin remains the serving default. Returns (query_id,
    neighbor_id, rank, rel_e6).
    """
    p, q = lambda_num, lambda_den
    if not (0 < p < q):
        raise ValueError("need 0 < lambda_num < lambda_den")
    cands = brute_force_topk(
        corpus, queries, k=shortlist, id_col=id_col, vec_col=vec_col
    ).withColumn(
        "rel_e6",
        F.floor(F.col("cos") * F.lit(1_000_000.0)).cast("long"),
    )
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")
    )

    def greedy_exact(pdf):
        import math

        import pandas as pd

        ids = [int(x) for x in pdf["neighbor_id"]]
        rel = [int(x) for x in pdf["rel_e6"]]
        V = [list(map(float, v)) for v in pdf["v"]]

        def fold(u, v):
            # the pinned left fold: acc starts 0.0, one (mul, add) per
            # component in index order — bit-equal to F.aggregate and
            # DuckDB list_reduce on the same doubles
            acc = 0.0
            for a, b in zip(u, v):
                acc += a * b
            return acc

        nrm = [math.sqrt(fold(v, v)) for v in V]
        memo: dict = {}

        def red(i, j):
            key = (i, j) if i < j else (j, i)
            if key not in memo:
                memo[key] = math.floor(
                    fold(V[i], V[j]) / (nrm[i] * nrm[j]) * 1_000_000.0
                )
            return memo[key]

        selected: list[int] = []
        remaining = list(range(len(ids)))
        while remaining and len(selected) < k:
            best, best_key = None, None
            for i in remaining:
                if selected:
                    score = p * rel[i] - (q - p) * max(
                        red(i, s) for s in selected
                    )
                else:
                    score = p * rel[i]
                key = (score, -ids[i])
                if best_key is None or key > best_key:
                    best, best_key = i, key
            selected.append(best)
            remaining.remove(best)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[selected].to_numpy(),
                "neighbor_id": [ids[i] for i in selected],
                "rank": list(range(1, len(selected) + 1)),
                "rel_e6": [rel[i] for i in selected],
            }
        )

    return (
        cands.join(vecs, "neighbor_id")
        .select("query_id", "neighbor_id", "rel_e6", "v")
        .groupBy("query_id")
        .applyInPandas(
            greedy_exact,
            "query_id long, neighbor_id long, rank int, rel_e6 long",
        )
    )
