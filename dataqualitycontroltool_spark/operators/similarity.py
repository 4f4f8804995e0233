"""Approximate-nearest-neighbor search over an embedding column
(``array<float>``) — brute-force cosine top-k as the exactness baseline, a
sign-LSH bucketed variant as the scale path.

The reference has no vector search; its closest analogue is the CDE
nearest-neighbor match (``model/qcfrictionless/cde.py:43-69``: rank every
candidate by a similarity score, take the best) — the same
score-rank-window shape, lifted to dense vectors.

Design for 10^12 rows:
* the query side is always the SMALL side → ``F.broadcast`` it; the corpus
  is never shuffled for brute force (map-side broadcast-nested-loop, then a
  per-query top-k via window over (corpus-partition-local) candidates —
  Spark's TakeOrderedAndProject keeps only k rows per partition in flight).
* the bucketed variant replaces the cross join with an equi-join on a
  sign-bit bucket key: corpus is hash-partitioned by bucket, each query
  probes exactly one bucket (or its multi-probe neighbors), turning O(n·q)
  into O(n·q / 2^bits) with recall traded for bits.
* all ranking is on ``round(cos, 6)`` with id ascending as tie-break, so
  results replay identically on any engine (DuckDB oracle included).

Math is double-precision end-to-end (float32 inputs are cast once before
any join) inside Catalyst lambda expressions — no UDF, whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from dataqualitycontroltool_spark.operators.dedup import dot, let


def _prepared(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(F.col(id_col), v.alias("v")).withColumn(
        "norm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    )


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: for each query id, the k nearest OTHER vectors.
    Output (query_id, neighbor_id, cos, rank), rank 1..k.

    The query set is broadcast (it is by definition small); the corpus scan
    stays pipelined — no shuffle until the final per-query window, which
    carries only the candidate rows."""
    e = _prepared(df, id_col, vec_col)
    q = e.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    c = e.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"), F.col("norm").alias("cn")
    )
    cos = F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


_PACKED_SCHEMA = "blk long, ids array<long>, mat array<double>, norms array<double>"


def _pack_blocks(df: DataFrame, id_col: str, vec_col: str, n_blocks: int) -> DataFrame:
    """Pack vectors into ``n_blocks`` dense blocks: one row per block with the
    id list, the row-major flattened matrix, and precomputed norms.  This is
    the fan-in half of blocked matrix multiplication: a groupBy shuffle
    carrying each vector exactly once."""

    dtype = dict(df.dtypes)[id_col]
    if dtype not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise TypeError(
            f"blocked cosine needs an integral id column (got {id_col}: {dtype}); "
            "hash string ids to int64 first (e.g. xxhash64) and keep a mapping, "
            "or use brute_force_topk which accepts any id type"
        )

    def pack(pdf):
        import numpy as np

        M = np.stack(pdf["_v"].map(np.asarray).to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "blk": [int(pdf["_blk"].iloc[0])],
                "ids": [pdf["_id"].to_numpy().tolist()],
                "mat": [M.ravel().tolist()],
                "norms": [np.sqrt((M * M).sum(axis=1)).tolist()],
            }
        )

    prepared = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_blocks)).alias("_blk"),
    )
    return prepared.groupBy("_blk").applyInPandas(pack, _PACKED_SCHEMA)


def cosine_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.45,
    n_blocks: int = 16,
) -> DataFrame:
    """All pairs with cosine >= threshold via BLOCKED MATRIX MULTIPLY:
    (id_a, id_b, cos) — same results as ``dedup.embedding_cosine_pairs``,
    ~10× faster, because the n²·d dot products run as numpy/BLAS matmuls
    over Arrow batches instead of per-pair Catalyst lambdas.

    Plan: pack vectors into B blocks (one shuffle) → self-join block pairs
    (blk_a <= blk_b: B(B+1)/2 rows, each carrying two dense blocks) →
    ``mapInPandas`` computes A·Bᵀ per block pair and emits only the pairs
    over threshold.  Same-block pairs are deduped by id order; cross-block
    pairs are emitted as (min_id, max_id) — cosine is symmetric.  Scale
    note: work is O(n²d / B²) per task with B² tasks — tune ``n_blocks`` so
    a block (~n/B vectors) fits executor memory; brute force is for corpus
    slices / verification, the sublinear path is ``bucketed_topk``."""

    def gen(it):
        import numpy as np

        for pdf in it:
            out_a, out_b, out_c = [], [], []
            for r in pdf.itertuples(index=False):
                ia = np.asarray(r.ids_a, dtype=np.int64)
                ib = np.asarray(r.ids_b, dtype=np.int64)
                A = np.asarray(r.mat_a, dtype=np.float64).reshape(len(ia), -1)
                B = np.asarray(r.mat_b, dtype=np.float64).reshape(len(ib), -1)
                cos = (A @ B.T) / np.outer(np.asarray(r.norms_a), np.asarray(r.norms_b))
                cos = np.round(cos, 6)
                if r.blk_a == r.blk_b:
                    mask = (cos >= threshold) & (ia[:, None] < ib[None, :])
                else:
                    mask = cos >= threshold
                ai, bi = np.nonzero(mask)
                lo = np.minimum(ia[ai], ib[bi])
                hi = np.maximum(ia[ai], ib[bi])
                out_a.append(lo)
                out_b.append(hi)
                out_c.append(cos[ai, bi])
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                        "cos": np.concatenate(out_c),
                    }
                )

    p = _pack_blocks(df, id_col, vec_col, n_blocks)
    a = p.select(*[F.col(c).alias(f"{c}_a") for c in p.columns])
    b = p.select(*[F.col(c).alias(f"{c}_b") for c in p.columns])
    pairs = a.join(F.broadcast(b), F.col("blk_a") <= F.col("blk_b"))
    return pairs.mapInPandas(gen, "id_a long, id_b long, cos double")


def hyperplanes(dim: int, n_bits: int = 8, seed: int = 42) -> list[list[float]]:
    """Seeded random-hyperplane directions for sign-LSH, as plain Python
    lists (rounded to 6 decimals so the same constants inline exactly into
    Spark literals and oracle SQL): ``n_bits`` standard-normal vectors of
    length ``dim`` from numpy's seeded default_rng."""
    import numpy as np

    H = np.random.default_rng(seed).standard_normal((n_bits, dim))
    return [[round(float(x), 6) for x in row] for row in H]


def sign_bucket(
    vec_col: Column, n_bits: int = 8, dim: int | None = None, seed: int = 42
) -> Column:
    """Deterministic sign-LSH bucket key, packed into an int.

    With ``dim`` set (the production path): bit i = sign of the dot product
    with a SEEDED dense hyperplane (:func:`hyperplanes`) — random-hyperplane
    LSH whose collision probability is 1 - angle/pi per bit regardless of
    how the embedding dimensions are distributed.  The planes inline as
    Catalyst array literals, so the whole key is one codegen'd projection
    (no UDF, no shuffle) and replays exactly in SQL engines (sequential-
    fold dot product on both sides).

    Without ``dim``: sign bits of the first ``n_bits`` dimensions — kept as
    the zero-knowledge fallback, but embeddings with correlated leading
    dimensions hash badly (round-1 review); prefer the seeded planes."""
    if dim is not None:
        planes = hyperplanes(dim, n_bits, seed)
        bits = [
            F.when(
                dot(vec_col, F.array(*[F.lit(x) for x in h])) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
            for i, h in enumerate(planes)
        ]
    else:
        bits = [
            F.when(F.element_at(vec_col, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(n_bits)
        ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("int")


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: (id, scale, qvec).

    At 10^12 vectors the embedding column dominates storage (64 float32 =
    256B/row); int8 + one float scale is 68B — a 3.7× cut with bounded
    error (|x - deq(x)| <= scale/2, scale = max|x|/127).  Pure Catalyst
    expressions (let-bound scale), columnar end to end."""
    from dataqualitycontroltool_spark.operators.dedup import let

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def build(vv: Column) -> Column:
        scale = F.array_max(F.transform(vv, F.abs)) / F.lit(127.0)
        return F.struct(
            scale.alias("scale"),
            F.transform(vv, lambda x: F.round(x / scale).cast("tinyint")).alias("qvec"),
        )

    q = let(v, build)
    return df.select(F.col(id_col), q.alias("_q")).select(
        id_col, F.col("_q.scale").alias("scale"), F.col("_q.qvec").alias("qvec")
    )


def dequantize_int8(df: DataFrame, id_col: str) -> DataFrame:
    """Inverse of :func:`quantize_int8`: (id, vec:array<double>)."""
    return df.select(
        F.col(id_col),
        F.transform("qvec", lambda x: x.cast("double") * F.col("scale")).alias("vec"),
    )


def kmeans_centroids(
    df: DataFrame,
    vec_col: str,
    k: int = 16,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
    id_col: str | None = None,
) -> "np.ndarray":
    """Seeded spherical k-means on a bounded driver-side sample — the IVF
    coarse quantizer.  The sample is the ``sample`` lowest ids (deterministic,
    not rand()); at 10^12 rows a bounded sample is exactly how IVF training
    works in practice (the quantizer sees a few thousand vectors)."""
    import numpy as np

    q = df.select(vec_col) if id_col is None else df.orderBy(id_col).select(vec_col)
    rows = q.limit(sample).collect()
    X = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    X = X / np.linalg.norm(X, axis=1, keepdims=True).clip(min=1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                C[j] = m / max(np.linalg.norm(m), 1e-12)
    return C


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are assigned to their nearest
    centroid (inverted lists = Spark partitions keyed by cluster); each query
    probes its ``nprobe`` nearest centroids and ranks only those lists.

    Full probe (nprobe = n_centroids) degenerates to EXACT brute force —
    the correctness property the tests pin.  Assignment runs in a pandas UDF
    with the (tiny) centroid matrix in the closure: one argmax matmul per
    Arrow batch, numpy/BLAS speed, and the corpus join is a plain equi-join
    on the cluster id (hash-partitioned, no skew for balanced quantizers)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    C = centroids if centroids is not None else kmeans_centroids(
        df, vec_col, k=n_centroids, id_col=id_col
    )
    Cn = np.asarray(C, dtype=np.float64)
    e = cluster_assign(_prepared(df, id_col, vec_col), Cn)
    qv = {r[0]: np.asarray(r[1], dtype=np.float64)
          for r in df.where(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()}
    probe_rows = []
    for qid, v in qv.items():
        vn = v / max(np.linalg.norm(v), 1e-12)
        # stable sort: probe-order ties break by LOWEST centroid index, the
        # same order the SQL oracle pins with `cid ASC`
        for c in np.argsort(-(Cn @ vn), kind="stable")[:nprobe]:
            probe_rows.append((qid, int(c)))
    probes = df.sparkSession.createDataFrame(probe_rows, f"{id_col} long, cluster int")

    q = e.join(F.broadcast(probes.select(id_col).distinct()), id_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    cand = e.join(
        F.broadcast(probes.withColumnRenamed(id_col, "query_id")), "cluster"
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cn"),
    )
    cos = F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def cluster_assign(prepared: DataFrame, Cn: "np.ndarray") -> DataFrame:
    """Nearest-centroid assignment for a ``_prepared`` frame: adds an int
    ``cluster`` column.  Arrow-batched pandas UDF with the (tiny) centroid
    matrix in the closure — one argmax matmul per batch, numpy/BLAS speed;
    argmax ties break to the LOWEST centroid index (numpy first-max), the
    order the SQL oracles pin with ``cid ASC``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.IntegerType())
    def assign_udf(vs: pd.Series) -> pd.Series:
        M = np.stack(vs.map(np.asarray).to_numpy()).astype(np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True).clip(min=1e-12)
        return pd.Series((M @ Cn.T).argmax(axis=1).astype(np.int32))

    return prepared.withColumn("cluster", assign_udf(F.col("v")))


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: "np.ndarray",
    threshold: float = 0.9,
    cache: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (cluster-then-prune, a
    standard published recipe for web-scale training corpora): assign every
    embedding to its nearest centroid, compare pairs ONLY within a cluster,
    and drop the larger id of any pair with cosine >= threshold.  Output
    (id, cluster, keep).

    Scale shape: the pairwise work is confined to clusters — O(Σ (n_k)²)
    instead of O(n²), with k chosen so n/k fits a task; the within-cluster
    self-join is an equi-join on the int cluster id (hash-partitioned,
    balanced for a balanced quantizer — re-split oversized clusters by
    recursing on their members at production scale).  Cosine math and
    keep-smallest tie-breaks replay exactly in the SQL oracle when the
    centroids are fixed (see __spark_entry__ `dedup_semantic`).

    The assignment frame is referenced THREE times (both self-join sides +
    the final projection); ``cache=True`` persists it so the pandas-UDF
    argmax — the dominant per-row cost — runs once, with the same
    caller-owned cache contract as ``dedup.simhash_pairs``; ``cache=False``
    leaves no persistent state and recomputes per reference."""
    import numpy as np

    e = cluster_assign(_prepared(df, id_col, vec_col), np.asarray(centroids, dtype=np.float64))
    if cache:
        e = e.persist()
    a = e.select(
        F.col("cluster"), F.col(id_col).alias("_ida"),
        F.col("v").alias("_va"), F.col("norm").alias("_na"),
    )
    b = e.select(
        F.col("cluster"), F.col(id_col).alias("_idb"),
        F.col("v").alias("_vb"), F.col("norm").alias("_nb"),
    )
    cos = F.round(dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6)
    losers = (
        # shuffle-hash, not sort-merge: the join key has only k distinct
        # values, so SMJ would sort the whole corpus by cluster id for no
        # benefit; a hash join streams each cluster's block directly
        a.join(b.hint("shuffle_hash"), on="cluster")
        .where(F.col("_ida") < F.col("_idb"))
        .where(cos >= threshold)
        .select(F.col("_idb").alias(id_col))
        .distinct()
        .withColumn("_loser", F.lit(True))
    )
    return (
        e.select(id_col, "cluster")
        .join(losers, on=id_col, how="left")
        .select(id_col, "cluster", F.col("_loser").isNull().alias("keep"))
    )


def _probe_masks(n_bits: int, probe_hamming: int) -> list[int]:
    """All XOR masks within ``probe_hamming`` bit flips of zero — the
    multi-probe neighborhood (sum of C(n_bits, i) for i <= radius)."""
    from itertools import combinations

    masks = []
    for r in range(probe_hamming + 1):
        for bits in combinations(range(n_bits), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def bucketed_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list,
    k: int = 5,
    n_bits: int = 8,
    dim: int | None = None,
    seed: int = 42,
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket.  Output (query_id, neighbor_id, cos, rank) — the recall/latency
    trade is 2^n_bits× fewer comparisons; the equi-join on the bucket key
    hash-partitions the corpus so each bucket is one co-located task
    (md5-free integer key, uniform for zero-centered embeddings).  Pass
    ``dim`` to bucket with seeded hyperplanes (see :func:`sign_bucket`).

    ``probe_hamming`` > 0 enables multi-probe LSH (Lv et al. 2007, "Multi-
    Probe LSH"): each query additionally probes every bucket within that
    many bit flips of its own — Σ C(n_bits, i) probes — trading candidate
    volume back for recall WITHOUT giving up the equi-join: the probe set
    expands on the (tiny, broadcast) query side via explode, the corpus
    side never changes.  A sign bit near zero margin is exactly the bit
    most likely to differ on a true neighbor, so recall climbs steeply
    with radius (measured on the sf0.01 corpus: 0.0 → 0.325 → 0.65 for
    radius 0/2/3 at 8 bits; the `ann_recall` query pins the curve)."""
    e = _prepared(df, id_col, vec_col).withColumn(
        "bucket", sign_bucket(F.col("v"), n_bits, dim=dim, seed=seed)
    )
    q = e.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        F.col("bucket").alias("qb"),
    )
    if probe_hamming > 0:
        masks = _probe_masks(n_bits, probe_hamming)
        q = q.withColumn(
            "qb",
            F.explode(
                F.array(*[F.col("qb").bitwiseXOR(F.lit(m)) for m in masks])
            ),
        )
    c = e.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cn"),
        F.col("bucket"),
    )
    cos = F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qb")) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def centroid_norms(centroids_raw: list[list[float]]) -> list[float]:
    """Euclidean norms of raw centroid rows via a SEQUENTIAL left-fold sum
    (plain Python floats, not numpy's pairwise reduction) so the constant
    replays bit-identically against DuckDB's ``sqrt(list_dot_product(v,v))``
    and Spark's ``sqrt(aggregate(v, 0.0, acc + x*x))`` — all three are the
    same IEEE mul-add chain."""
    import math

    out = []
    for row in centroids_raw:
        s = 0.0
        for x in row:
            s += float(x) * float(x)
        out.append(math.sqrt(s))
    return out


def _affinity_struct(
    v: Column, norm: Column, centroids_raw: list[list[float]], cnorms: list[float]
) -> Column:
    """Struct ``(bucket int, marg array<double>)`` of *affinity-centered*
    LSH bits: a_i = cos(v, c_i), margin_i = a_i − mean_j(a_j), bit i set
    when margin_i >= 0.

    Random hyperplanes carry almost no locality on near-uniform embeddings
    (measured: single-probe recall 0.0, radius-2 0.325 on the sf0.01
    corpus); centering each row's centroid-affinity profile instead makes
    bit i mean "closer to centroid i than this row's average centroid" — a
    data-aware code that is still ONE codegen'd projection (the centroid
    literals inline, the affinity array is let-bound so its 8 dot-folds run
    once per row) and derives in plain SQL from the same table (the oracle
    recomputes c_i and the mean in CTEs).  The mean is a left-assoc chained
    sum / n — the exact textual order the SQL twin uses, so margins are
    bit-identical doubles on both engines."""
    n_bits = len(centroids_raw)
    aff = F.array(
        *[
            dot(v, F.array(*[F.lit(float(x)) for x in c])) / (norm * F.lit(cn))
            for c, cn in zip(centroids_raw, cnorms)
        ]
    )

    def build(arr: Column) -> Column:
        mu = F.element_at(arr, 1)
        for i in range(1, n_bits):
            mu = mu + F.element_at(arr, i + 1)
        mu = mu / F.lit(float(n_bits))

        def with_mu(m: Column) -> Column:
            margins = [F.element_at(arr, i + 1) - m for i in range(n_bits)]
            bucket = F.lit(0)
            for i, mg in enumerate(margins):
                bucket = bucket + F.when(mg >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            return F.struct(
                bucket.cast("int").alias("bucket"), F.array(*margins).alias("marg")
            )

        return let(mu, with_mu)

    return let(aff, build)


def directed_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list,
    k: int = 5,
    centroids_raw: list[list[float]] | None = None,
    probe_budget: int = 37,
) -> DataFrame:
    """Query-directed multi-probe ANN (Lv et al. 2007 §4.5, "query-directed
    probing") over affinity-centered LSH bits: instead of probing every
    bucket within a fixed hamming radius, each query ranks ALL 2^n_bits XOR
    masks by the likelihood the true neighbor hides behind that flip —
    score(mask) = Σ_{i∈mask} margin_i² (a bit near its decision boundary is
    cheap to flip; a confident bit is expensive) — and probes only the
    ``probe_budget`` best.  At the SAME 37-probe budget as fixed radius-2
    this lifts measured recall@5 0.325 → 0.700 on the sf0.01 corpus
    (fixed-r2 on the same affinity bits: 0.575 — both levers contribute).

    Scale shape (10^12 rows): the corpus side stays a pure projection (the
    bucket key is 8 inlined dot-folds, no UDF, no shuffle); the probe
    expansion happens ONLY on the broadcast query side (queries ×
    2^n_bits rows, scored and pruned to ``probe_budget`` with a window over
    the tiny frame), and the candidate fetch is the same hash-partitioned
    equi-join on the int bucket key as single-probe.  Ranking replays in
    SQL: probe scores round to 6 decimals with mask-ascending ties, cosine
    ranking is round-6 with id-ascending ties.

    ``centroids_raw`` are RAW (un-normalized) centroid vectors; their norms
    are folded sequentially (:func:`centroid_norms`) so affinities are
    bit-identical across engines."""
    if centroids_raw is None:
        raise ValueError("directed_topk requires centroids_raw")
    n_bits = len(centroids_raw)
    cnorms = centroid_norms(centroids_raw)
    e = _prepared(df, id_col, vec_col).withColumn(
        "_aff", _affinity_struct(F.col("v"), F.col("norm"), centroids_raw, cnorms)
    )
    q = e.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        F.col("_aff.bucket").alias("qb"),
        F.col("_aff.marg").alias("marg"),
    )
    spark = df.sparkSession
    masks = spark.range(1 << n_bits).select(F.col("id").cast("int").alias("mask"))
    score = None
    for i in range(n_bits):
        m = F.element_at(F.col("marg"), i + 1)
        term = F.when(
            F.col("mask").bitwiseAND(F.lit(1 << i)) != 0, m * m
        ).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    pw = Window.partitionBy("query_id").orderBy(
        F.col("_pscore").asc(), F.col("mask").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(masks))
        .withColumn("_pscore", F.round(score, 6))
        .withColumn("_pr", F.row_number().over(pw))
        .where(F.col("_pr") <= probe_budget)
        .select(
            "query_id", "qv", "qn",
            F.col("qb").bitwiseXOR(F.col("mask")).alias("qb"),
        )
    )
    c = e.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cn"),
        F.col("_aff.bucket").alias("bucket"),
    )
    cos = F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    scored = c.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("qb")) & (F.col("query_id") != F.col("neighbor_id")),
    ).select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def centroid_outliers(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    group_col: str,
    threshold: float = 0.0,
) -> DataFrame:
    """Embedding quality signal: cosine of every vector to its GROUP
    centroid, flagging off-topic rows (``is_outlier`` when the round-6
    cosine falls below ``threshold``).  The per-cluster analogue of
    CLIP-score percentile filtering — SemDeDup prunes near-duplicates
    inside a cluster; this prunes the rows that don't belong to it.

    Scale shape (10^12 rows): centroids come from ``posexplode`` →
    ``groupBy(group, pos).avg`` — the partial aggregation reduces each
    task's n·dim exploded rows to (groups × dim) before the one exchange —
    then re-assemble per group via a bounded ``collect_list`` (exactly
    ``dim`` structs per group).  The centroid's self-norm is computed ONCE
    per group on that one-row-per-group side (not re-folded per corpus
    row), and the per-row cosine is let-bound so its fold runs once per
    row, not once per output column.  The join back is a plain equi-join
    on the group key: the centroid side has one row per group, so AQE
    broadcasts it when genuinely small — no forced hint (group cardinality
    is caller-controlled, not provably bounded).  The remaining per-row
    work (dot with the centroid + the row's own norm) is map-side Catalyst
    fold work.  ``alignment.cosine`` is deliberately NOT reused here: its
    contract recomputes both norms inside the expression, which would put
    the group-constant centroid fold back into the per-row projection.

    Determinism: centroid components are rounded to 9 decimals (partial
    sums in any order agree at that precision), the dot and norm products
    to 9 before the divide, the score to 6 — the package-wide cross-engine
    replay contract.  Rows with a NULL group or NULL vector are excluded
    (they contribute to no centroid and get no score).
    """
    base = df.where(
        F.col(group_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col),
        F.col(group_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    cent = (
        base.select(group_col, F.posexplode("_v").alias("_p", "_x"))
        .groupBy(group_col, "_p")
        .agg(F.round(F.avg("_x"), 9).alias("_m"))
        .groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_p", "_m"))),
                lambda s: s["_m"],
            ).alias("_c")
        )
        # UNrounded so den below equals round(|v|·|c|, 9) exactly — the
        # aggregate boundary makes _c an attribute, so the two dot()
        # references cannot re-inline the collect_list expression
        .withColumn("_cn", F.sqrt(dot(F.col("_c"), F.col("_c"))))
    )

    def score(v: Column) -> Column:
        nd = F.struct(
            F.round(dot(v, F.col("_c")), 9).alias("n"),
            F.round(F.sqrt(dot(v, v)) * F.col("_cn"), 9).alias("d"),
        )
        return let(
            nd, lambda x: F.when(x["d"] > 0, F.round(x["n"] / x["d"], 6))
        )

    # let-bind the row vector (its cast-transform has 3 reference sites)
    # AND the cosine itself (2 output columns) — CollapseProject would
    # otherwise duplicate the full fold per reference
    pair = let(
        F.col("_v"),
        lambda v: let(
            score(v),
            lambda c: F.struct(
                c.alias("cos"),
                F.coalesce(c < threshold, F.lit(True)).alias("out"),
            ),
        ),
    )
    return (
        base.join(cent, group_col)
        .select(id_col, group_col, pair.alias("_s"))
        .select(
            id_col,
            group_col,
            F.col("_s.cos").alias("cos_centroid"),
            F.col("_s.out").alias("is_outlier"),
        )
    )
