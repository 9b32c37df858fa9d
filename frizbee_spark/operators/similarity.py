"""Embedding similarity search: exact brute-force top-k + LSH-bucketed ANN.

Exact path is pure Catalyst (higher-order functions over array<float> —
JVM-side, codegen) and serves as both the small-scale baseline and the
pytest/DuckDB oracle. The ANN path buckets vectors with deterministic
random-hyperplane signatures (sign-LSH) so the candidate set per query is
a bucket join, not a full scan — the same prefilter-then-verify shape as
the dedup cascade (/root/reference/README.md:49-52 precedent).

Scale notes: brute-force is O(Q x N) — fine for Q small (broadcast the
queries), impossible for N x N. The ANN path shuffles each vector T times
(T tables) keyed by a 16-bit bucket; candidate verification is a bucket-
local cosine in a vectorized Arrow UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.hashing import splitmix64
from ..util import tracked_persist


def _cosine_expr(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query id against the whole table.

    The query side is tiny -> explicit broadcast; the scan side streams.
    Deterministic tie-break: cosine desc, then neighbor id asc.
    """
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).cast("array<double>").alias("vec"))
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(_cosine_expr("qvec", "vec"), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, table: int) -> np.ndarray:
    """Deterministic pseudo-gaussian hyperplanes from splitmix64 bits —
    no RNG state, identical on every executor."""
    idx = np.arange(dim * n_planes, dtype=np.uint64) + np.uint64(table * 1_000_003)
    u = splitmix64(idx).astype(np.float64) / 2.0**64  # uniform [0,1)
    with np.errstate(over="ignore"):
        idx2 = idx + np.uint64(0x9E37)
    v = splitmix64(idx2).astype(np.float64) / 2.0**64
    # Box-Muller
    g = np.sqrt(-2.0 * np.log(np.clip(u, 1e-12, None))) * np.cos(2 * np.pi * v)
    return g.reshape(n_planes, dim)


def lsh_bucket_ids(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 14,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table_id, bucket) — sign-LSH signatures, one row per table.

    Vectorized: each Arrow batch is one (batch x dim) @ (dim x planes)
    matmul per table.
    """
    planes = [_hyperplanes(dim, n_planes, t) for t in range(n_tables)]
    work = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))

    def run(batches):
        for pdf in batches:
            M = np.array(pdf["vec"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            outs = []
            for t, P in enumerate(planes):
                bits = (M @ P.T) > 0
                bucket = (bits << np.arange(n_planes)).sum(axis=1).astype(np.int64)
                outs.append(pd.DataFrame(
                    {"vec_id": ids, "table_id": t, "bucket": bucket}
                ))
            yield pd.concat(outs, ignore_index=True)

    return work.mapInPandas(run, schema="vec_id long, table_id int, bucket long")


def ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: union of bucket-mates across T sign-LSH tables,
    exact cosine on the candidates only. Recall grows with n_tables and
    shrinks with n_planes; candidate count per query ~= T * bucket
    occupancy, not N. Sign-LSH recall depends on neighbor cosine: high
    (>0.99 with defaults) when true neighbors have cos >= 0.8, poor on
    near-orthogonal "neighbors" (cos ~ 0.4) — no sublinear method does
    well there; fall back to brute_force_topk for unstructured data."""
    dim = len(
        embeddings.select(vec_col).limit(1).collect()[0][0]
    )
    buckets = lsh_bucket_ids(embeddings, dim, n_planes, n_tables, id_col, vec_col)
    qb = buckets.filter(F.col("vec_id").isin(query_ids)).withColumnsRenamed(
        {"vec_id": "query_id"}
    )
    cands = (
        buckets.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).cast("array<double>").alias("vec"))
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = (
        cands.join(base, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select("query_id", "vec_id",
                F.round(_cosine_expr("qvec", "vec"), 4).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )


def _spherical_kmeans(X: np.ndarray, n_centroids: int, n_iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd on the unit sphere) for the
    IVF coarse quantizer. Init picks the sample rows with the smallest
    splitmix64(row index) — seedless-deterministic, identical everywhere.
    Empty clusters keep their previous centroid."""
    n = len(X)
    k = min(n_centroids, n)
    order = np.argsort(splitmix64(np.arange(n, dtype=np.uint64)), kind="stable")
    C = X[order[:k]].copy()
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)
        C_new = np.zeros_like(C)
        np.add.at(C_new, assign, X)
        nrm = np.linalg.norm(C_new, axis=1)
        empty = nrm == 0.0
        C_new[empty] = C[empty]
        nrm[empty] = 1.0
        C = C_new / nrm[:, None]
    return C


def ivf_train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 64,
    sample_size: int = 16384,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train the IVF coarse quantizer on a deterministic hash-sample.

    Coarse quantizers are trained on a sample by design (a few 10^4
    vectors bound centroid error regardless of N), so the driver-side
    collect here is O(sample), never O(N). The sample is the rows with
    the smallest xxhash64(id) — deterministic, order-independent, and
    computed with one TakeOrdered job (no full sort)."""
    rows = (
        embeddings.select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_i")))
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError("ivf_train_centroids: embeddings table is empty")
    X = np.asarray([np.asarray(r["_v"], dtype=np.float64) for r in rows])
    nrm = np.linalg.norm(X, axis=1)
    nrm[nrm == 0.0] = 1.0
    return _spherical_kmeans(X / nrm[:, None], n_centroids)


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, list_id): nearest-centroid assignment, one vectorized
    matmul per Arrow batch against the broadcast centroid matrix."""
    C = np.ascontiguousarray(centroids)
    work = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))

    def run(batches):
        for pdf in batches:
            M = np.array(pdf["vec"].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(M, axis=1)
            nrm[nrm == 0.0] = 1.0
            a = np.argmax((M / nrm[:, None]) @ C.T, axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(),
                                "list_id": a.astype(np.int32)})

    return work.mapInPandas(run, schema="vec_id long, list_id int")


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 64,
    nprobe: int = 8,
    sample_size: int = 16384,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: spherical-k-means coarse quantizer, probe
    the ``nprobe`` inverted lists nearest each query, exact cosine on the
    probed candidates only — the second ANN scale path beside the
    sign-LSH :func:`ann_topk` (IVF wins when the data is clustered; LSH
    when it is not, since LSH needs no training pass).

    Scale shape: candidates per query ~= N * nprobe / n_centroids; the
    probe is one equi-join on list_id against a broadcast (query_id,
    list_id) probe table — no N x N anything. Deterministic end to end
    (hash-sample training + seedless init), so results are reproducible
    across runs and cluster layouts.
    """
    spark = embeddings.sparkSession
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).cast("array<double>").alias("vec"))
    qrows = base.filter(F.col("vec_id").isin(query_ids)).collect()
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double"
        )
    cents = ivf_train_centroids(embeddings, n_centroids, sample_size, id_col, vec_col)
    lists = ivf_assign(embeddings, cents, id_col, vec_col)
    Q = np.asarray([np.asarray(r["vec"], dtype=np.float64) for r in qrows])
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0.0] = 1.0
    probes = np.argsort(-((Q / qn[:, None]) @ cents.T), axis=1)[:, :nprobe]
    probe_rows = [
        (int(r["vec_id"]), int(l))
        for r, ls in zip(qrows, probes) for l in ls
    ]
    probe_df = spark.createDataFrame(probe_rows, "query_id long, list_id int")
    cands = (
        lists.join(F.broadcast(probe_df), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    # qrows are already on the driver — build the (tiny) query-vector side
    # from them instead of a second distributed filter-scan of the table
    queries = spark.createDataFrame(
        [(int(r["vec_id"]), list(map(float, r["vec"]))) for r in qrows],
        "query_id long, qvec array<double>",
    )
    scored = (
        cands.join(base, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select("query_id", "vec_id",
                F.round(_cosine_expr("qvec", "vec"), 4).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )


def blocked_all_pairs_cosine(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 4096,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via a blocked Gram matrix.

    Vectors are hashed into ceil(N/B) blocks; every block pair (bi <= bj)
    becomes one grid row carrying both blocks' packed vectors, and one
    Arrow task computes the (B x B) cosine block with a single BLAS
    matmul — no per-pair Catalyst expression, no candidate dedup shuffle.
    Cost is the exact O(N^2 d) flops (BLAS-rate, the cheap part) and
    O(N^2 / B) shuffled vector copies (each block replicated once per
    partner block). This is the right plan whenever the accept threshold
    is loose enough that an LSH prefilter would emit ~all pairs anyway —
    see the routing rule in :func:`embedding_near_dup_pairs`.

    Rounding matches the Catalyst path: HALF_UP to 4 decimals before the
    threshold compare (kept cosines are positive).
    """
    n = embeddings.count()
    n_blk = max(1, -(-n // block_size))
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blk)).cast("int").alias("blk"),
    )
    packed = base.groupBy("blk").agg(
        F.collect_list(F.struct("vec_id", "vec")).alias("rows")
    )
    grid = (
        packed.select(F.col("blk").alias("bi"), F.col("rows").alias("xr"))
        .join(packed.select(F.col("blk").alias("bj"), F.col("rows").alias("yr")),
              F.col("bi") <= F.col("bj"))
        .repartition(max(n_blk * (n_blk + 1) // 2, 1))
    )

    def unpack(rows):
        ids = np.fromiter((r["vec_id"] for r in rows), dtype=np.int64,
                          count=len(rows))
        M = np.asarray([np.asarray(r["vec"], dtype=np.float64) for r in rows])
        nrm = np.linalg.norm(M, axis=1)
        nrm[nrm == 0.0] = 1.0
        return ids, M / nrm[:, None]

    def run(batches):
        for pdf in batches:
            for bi, bj, xr, yr in zip(pdf["bi"], pdf["bj"], pdf["xr"], pdf["yr"]):
                ix, X = unpack(xr)
                if bi == bj:
                    iy, Y = ix, X
                else:
                    iy, Y = unpack(yr)
                C = X @ Y.T
                # round HALF_UP (away from zero, matching Spark/DuckDB
                # round()) to 4 decimals — sign-aware so negative
                # thresholds behave identically to the Catalyst path
                C = np.sign(C) * np.floor(np.abs(C) * 1e4 + 0.5) / 1e4
                ai, bi_ = np.nonzero(C >= threshold)
                if bi == bj:
                    keep = ix[ai] < iy[bi_]
                else:
                    keep = ix[ai] != iy[bi_]
                ai, bi_ = ai[keep], bi_[keep]
                a, b = ix[ai], iy[bi_]
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                yield pd.DataFrame({"a": lo, "b": hi, "cosine": C[ai, bi_]})

    return grid.mapInPandas(run, schema="a long, b long, cosine double")


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-LSH buckets:
    candidates = same (table, bucket), verified by exact cosine >= t.
    The embedding-space twin of the MinHash-LSH text path.

    Cost routing: the fraction of CHANCE (near-orthogonal) pairs a
    sign-LSH table union passes is ~ n_tables / 2**n_planes (each table
    collides a random pair with prob 2**-n_planes). When that exceeds 5%
    the "prefilter" emits a sizable multiple of all-pairs rows post-union
    (measured: planes=4/tables=32 emitted 4.2M candidates for 2k vectors
    = 2.1x all-pairs) — so such configurations route to the exact
    :func:`blocked_all_pairs_cosine` Gram scan, which does the same
    verification with one BLAS matmul per block pair and no candidate
    shuffle. Loose thresholds need dense configurations for recall, so
    this boundary is in practice "tight threshold -> LSH, loose ->
    blocked exact".

    ``max_bucket`` caps the quadratic self-join per (table, bucket):
    buckets above the cap are skipped (a hot bucket of m vectors emits
    C(m, 2) rows — the same task-killer the text path salts away). A
    skipped bucket loses only pairs every OTHER table also failed to
    surface; if buckets routinely exceed the cap, raise ``n_planes``
    instead of the cap.
    """
    integral_id = dict(embeddings.dtypes).get(id_col) in (
        "bigint", "int", "smallint", "tinyint"
    )
    if integral_id and n_tables >= 0.05 * (1 << n_planes):
        # the blocked kernel packs ids as int64; non-integral id columns
        # (the LSH path only needs orderable ids) stay on the bucket path
        return blocked_all_pairs_cosine(
            embeddings, threshold, id_col=id_col, vec_col=vec_col
        )
    dim = len(embeddings.select(vec_col).limit(1).collect()[0][0])
    buckets = lsh_bucket_ids(embeddings, dim, n_planes, n_tables, id_col, vec_col)
    sizes = buckets.groupBy("table_id", "bucket").agg(F.count("*").alias("_bsz"))
    capped = tracked_persist(
        buckets.join(
            sizes.filter(F.col("_bsz") <= max_bucket), ["table_id", "bucket"]
        )
    )  # two self-join branches below; released via util.release_tracked
    pairs = (
        capped.alias("x")
        .join(capped.alias("y"),
              (F.col("x.table_id") == F.col("y.table_id"))
              & (F.col("x.bucket") == F.col("y.bucket"))
              & (F.col("x.vec_id") < F.col("y.vec_id")))
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).cast("array<double>").alias("vec"))
    return (
        pairs.join(base.withColumnsRenamed({"vec_id": "a", "vec": "va"}), "a")
        .join(base.withColumnsRenamed({"vec_id": "b", "vec": "vb"}), "b")
        .select("a", "b", F.round(_cosine_expr("va", "vb"), 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
