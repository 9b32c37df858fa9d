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


def _bucket_codes(M: np.ndarray, planes: np.ndarray, n_planes: int) -> np.ndarray:
    """Sign-LSH bucket code per row of M for one table's hyperplanes —
    shared by the executor UDF and the driver-side query probing so both
    compute bit-identical codes."""
    bits = (M @ planes.T) > 0
    return (bits << np.arange(n_planes)).sum(axis=1).astype(np.int64)


def lsh_bucket_ids(
    embeddings: DataFrame,
    dim: int | None = None,
    n_planes: int = 14,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table_id, bucket) — sign-LSH signatures, one row per table.

    Vectorized: each Arrow batch is one (batch x dim) @ (dim x planes)
    matmul per table. ``dim`` is optional: the hyperplanes are a pure
    function of (dim, n_planes, table), so each worker derives them from
    its first batch — no driver-side probe action on the input."""

    work = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))

    def run(batches):
        planes = None
        for pdf in batches:
            M = np.array(pdf["vec"].tolist(), dtype=np.float64)
            if planes is None:
                d = dim if dim is not None else M.shape[1]
                planes = [_hyperplanes(d, n_planes, t) for t in range(n_tables)]
            ids = pdf["vec_id"].to_numpy()
            outs = []
            for t, P in enumerate(planes):
                outs.append(pd.DataFrame(
                    {"vec_id": ids, "table_id": t,
                     "bucket": _bucket_codes(M, P, n_planes)}
                ))
            yield pd.concat(outs, ignore_index=True)

    return work.mapInPandas(run, schema="vec_id long, table_id int, bucket long")


def _query_vec_pairs(
    base: DataFrame, query_ids: list[int], query_vecs: dict | None
) -> list[tuple[int, np.ndarray]]:
    """(query_id, vector) pairs — from the caller-provided dict when
    given (saves a filter-collect action on the table; the driver-contract
    queries derive query vectors from rows they already hold), else from
    one tiny filtered collect."""
    if query_vecs is not None:
        return [(int(q), np.asarray(query_vecs[q], dtype=np.float64))
                for q in query_ids if q in query_vecs]
    rows = base.filter(F.col("vec_id").isin(query_ids)).collect()
    return [(int(r["vec_id"]), np.asarray(r["vec"], dtype=np.float64))
            for r in rows]


def ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vecs: dict | None = None,
) -> DataFrame:
    """Approximate top-k: union of bucket-mates across T sign-LSH tables,
    exact cosine on the candidates only. Recall grows with n_tables and
    shrinks with n_planes; candidate count per query ~= T * bucket
    occupancy, not N. Sign-LSH recall depends on neighbor cosine: high
    (>0.99 with defaults) when true neighbors have cos >= 0.8, poor on
    near-orthogonal "neighbors" (cos ~ 0.4) — no sublinear method does
    well there; fall back to brute_force_topk for unstructured data.

    Plan shape: the query side is tiny, so its bucket codes are computed
    DRIVER-side from the collected query vectors (bit-identical NumPy,
    shared _bucket_codes) and broadcast as a literal (table_id, bucket,
    query_id) probe table — the corpus is scanned exactly once by the
    bucket UDF and probed with one broadcast equi-join, no second UDF
    branch and no driver dim-probe action."""
    spark = embeddings.sparkSession
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).cast("array<double>").alias("vec"))
    qpairs = _query_vec_pairs(base, query_ids, query_vecs)
    if not qpairs:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double"
        )
    Q = np.stack([v for _, v in qpairs])
    probe_rows = []
    for t in range(n_tables):
        P = _hyperplanes(Q.shape[1], n_planes, t)
        for (qid, _), code in zip(qpairs, _bucket_codes(Q, P, n_planes)):
            probe_rows.append((t, int(code), qid))
    probe_df = spark.createDataFrame(
        probe_rows, "table_id int, bucket long, query_id long"
    )
    buckets = lsh_bucket_ids(embeddings, None, n_planes, n_tables, id_col, vec_col)
    cands = (
        buckets.join(F.broadcast(probe_df), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        # partition the candidate stream by vec_id BEFORE the distinct:
        # hash(vec_id) satisfies the distinct's clustering requirement on
        # (query_id, vec_id) — vec_id is a subset of the keys — so the
        # dedup adds no exchange of its own, and at scale (corpus too big
        # for AQE to broadcast) the vec_id join below reuses this same
        # partitioning instead of shuffling the deduped candidates a
        # second time: 2 candidate-path exchanges (vec_id, then the
        # query_id window) instead of 3. The shuffled payload is the raw
        # (query_id, vec_id) pairs (<= n_tables x the deduped set, 16-byte
        # rows) — cheaper than a whole extra shuffle stage.
        .repartition("vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    queries = spark.createDataFrame(
        [(qid, list(map(float, v))) for qid, v in qpairs],
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
    """(vec_id, list_id, cent_cos): nearest-centroid assignment, one
    vectorized matmul per Arrow batch against the broadcast centroid
    matrix. ``cent_cos`` is the cosine between the (normalized) vector
    and its centroid — the per-list minimum of it bounds the list's
    angular radius, which is what lets :func:`ivf_topk` certify
    exactness (see there)."""
    C = np.ascontiguousarray(centroids)
    work = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))

    def run(batches):
        for pdf in batches:
            M = np.array(pdf["vec"].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(M, axis=1)
            nrm[nrm == 0.0] = 1.0
            sims = (M / nrm[:, None]) @ C.T
            a = np.argmax(sims, axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(),
                                "list_id": a.astype(np.int32),
                                "cent_cos": sims[np.arange(len(a)), a]})

    return work.mapInPandas(run, schema="vec_id long, list_id int, cent_cos double")


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 64,
    nprobe: int = 8,
    sample_size: int = 16384,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    certify: bool = True,
    query_vecs: dict | None = None,
) -> DataFrame:
    """IVF top-k: spherical-k-means coarse quantizer, probe the ``nprobe``
    inverted lists nearest each query, exact cosine on the probed
    candidates only — the second ANN scale path beside the sign-LSH
    :func:`ann_topk` (IVF wins when the data is clustered; LSH when it is
    not, since LSH needs no training pass).

    With ``certify`` (default) the result is EXACT by construction, not
    just high-recall: each list stores its angular radius ``r_l`` (max
    member angle to centroid = arccos of the per-list min ``cent_cos``
    from :func:`ivf_assign`), and the spherical triangle inequality gives
    every unprobed list an upper bound
    ``cos(max(angle(q, c_l) - r_l, 0))`` on any member's cosine to q.
    After the first ``nprobe`` lists are scored, any list whose bound
    could still beat the current kth result (with a 5e-5 slack for the
    4-decimal output rounding) is probed in a second pass — the ball-tree
    pruning argument, so the brute-force oracle is valid for every input,
    clustered or not. On clustered data the bound prunes almost
    everything (probes ~= nprobe lists); on unstructured data it honestly
    degrades toward a full scan — which is what exactness costs there.

    Scale shape: candidates per query ~= N * nprobe / n_centroids (plus
    certification re-probes); each probe pass is one equi-join on list_id
    against a broadcast (query_id, list_id) table — no N x N anything.
    The radius aggregation is one groupBy over n_centroids groups.
    Deterministic end to end (hash-sample training + seedless init).
    """
    spark = embeddings.sparkSession
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).cast("array<double>").alias("vec"))
    qpairs = _query_vec_pairs(base, query_ids, query_vecs)
    if not qpairs:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double"
        )
    cents = ivf_train_centroids(embeddings, n_centroids, sample_size, id_col, vec_col)
    lists = ivf_assign(embeddings, cents, id_col, vec_col)
    if certify:
        # two consumers below (radius agg + probe joins)
        lists = tracked_persist(lists)
    # query vectors are already on the driver — build the (tiny) query
    # side from them instead of a second distributed filter-scan
    queries = spark.createDataFrame(
        [(qid, list(map(float, v))) for qid, v in qpairs],
        "query_id long, qvec array<double>",
    )

    def topk_df(probe_rows: list[tuple[int, int]]) -> DataFrame:
        probe_df = spark.createDataFrame(probe_rows, "query_id long, list_id int")
        cands = (
            lists.join(F.broadcast(probe_df), "list_id")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id")
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

    Q = np.stack([v for _, v in qpairs])
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0.0] = 1.0
    aff = (Q / qn[:, None]) @ cents.T            # (n_queries, n_centroids)
    probes = np.argsort(-aff, axis=1)[:, :nprobe]
    probe_rows = [
        (qid, int(l))
        for (qid, _), ls in zip(qpairs, probes) for l in ls
    ]
    if not certify:
        return topk_df(probe_rows)

    first = topk_df(probe_rows).collect()        # <= len(query_ids)*k rows
    # per-list angular radius from the min member cosine (empty lists are
    # simply absent and can never contain a candidate)
    rad = {
        int(r["list_id"]): float(np.arccos(np.clip(r["_mc"], -1.0, 1.0)))
        for r in lists.groupBy("list_id").agg(F.min("cent_cos").alias("_mc")).collect()
    }
    kth: dict[int, float] = {}
    cnt: dict[int, int] = {}
    for r in first:
        cnt[r["query_id"]] = cnt.get(r["query_id"], 0) + 1
        kth[r["query_id"]] = min(kth.get(r["query_id"], 1.0), r["cosine"])
    extra: list[tuple[int, int]] = []
    for qi, (qid, _) in enumerate(qpairs):
        probed = set(int(l) for l in probes[qi])
        # fewer than k results -> no kth bound yet: probe every list
        t = kth.get(qid, -2.0) if cnt.get(qid, 0) >= k else -2.0
        for l, r_l in rad.items():
            if l in probed:
                continue
            ang = float(np.arccos(np.clip(aff[qi, l], -1.0, 1.0)))
            ub = float(np.cos(max(ang - r_l, 0.0)))
            if ub >= t - 5e-5:   # rounding slack: output is round(cos, 4)
                extra.append((qid, l))
    if not extra:
        return spark.createDataFrame(
            [(r["query_id"], r["neighbor_id"], r["cosine"]) for r in first],
            "query_id long, neighbor_id long, cosine double",
        )
    return topk_df(probe_rows + extra)


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


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 4096,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): prune documents whose EMBEDDINGS are near-identical
    even when their text is not — the model-space complement of the
    MinHash/SimHash text cascade. Re-expressed Spark-first as a
    composition of existing distributed primitives rather than the
    paper's per-cluster in-memory loop:

      near-dup pairs (cosine >= threshold, via the cost-routed
      LSH / blocked-Gram kernel of :func:`embedding_near_dup_pairs`)
        -> connected components (large/small-star or the cost-gated
           driver route, :func:`~..operators.components.assign_clusters`)
        -> one deterministic representative per semantic cluster.

    The representative rule is min-id (``keep`` = vec_id equals its
    cluster id, which IS the component minimum): deterministic,
    engine-independent, and resume-stable. SemDeDup's
    "farthest-from-centroid" pick optimizes diversity but depends on
    k-means state; callers wanting it can join this output back to the
    embeddings and re-pick per cluster_id — the cluster structure, which
    is the expensive distributed part, is identical.

    Output: (vec_id, cluster_id, cluster_size, keep). Rows with
    ``keep = false`` are the semantic duplicates to drop; singletons keep
    themselves (cluster_size 1). Plan shape beyond the pair kernel: one
    exchange on cluster_id serves both the window count and the keep
    flag; the text/bytes never enter the plan.
    """
    from .components import assign_clusters

    pairs = embedding_near_dup_pairs(
        embeddings,
        threshold=threshold,
        n_planes=n_planes,
        n_tables=n_tables,
        id_col=id_col,
        vec_col=vec_col,
        max_bucket=max_bucket,
    )
    ids = embeddings.select(F.col(id_col).alias("vec_id"))
    clus = assign_clusters(ids, pairs.select("a", "b"), id_col="vec_id")
    w = Window.partitionBy("cluster_id")
    return clus.select(
        "vec_id",
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("vec_id") == F.col("cluster_id")).alias("keep"),
    )
