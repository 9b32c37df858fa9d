"""Iterative connected components on an edge DataFrame.

Large-star/small-star alternation (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14 — the algorithm the north star names).
Both steps are pure Catalyst: groupBy + min + join + explode-free selects,
so every round is one shuffle keyed on the node id. Convergence is
O(log^2 n) rounds in the worst case, ~3-5 rounds for dup clusters (dense,
star-shaped). Per-round `localCheckpoint` truncates the lineage so plans
don't grow unboundedly (at cluster scale, a reliable checkpoint dir via
``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` instead).

The reference has no graph stage — this replaces its implicit "results
are independent rows" model (each match standalone,
/root/reference/src/one_shot/matcher.rs:91-100) with the transitive
closure the dedup north rule requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.select(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: link every strictly-larger neighbor to
    m = min(neighbors(u) ∪ {u})."""
    nbrs = edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    m = nbrs.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    return (
        nbrs.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("m").alias("a"), F.col("b").alias("b"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u: link every smaller-or-equal neighbor (and u itself)
    to the minimum of that neighborhood."""
    # canonical edges are (a < b): group by the larger endpoint b
    nbrs = edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    m = nbrs.groupBy("u").agg(F.min("v").alias("m"))
    joined = nbrs.join(m, "u")
    to_min = joined.filter(F.col("v") != F.col("m")).select(
        F.col("m").alias("a"), F.col("v").alias("b")
    )
    self_link = m.select(F.col("m").alias("a"), F.col("u").alias("b"))
    return to_min.unionByName(self_link)


def _canon(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    use_local_checkpoint: bool = True,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Edges (a, b) -> star edges (root, member), root = component min.

    Returns the converged edge set: every member points at its component's
    minimum node id. Nodes appearing in no edge are absent (callers
    coalesce to self — see :func:`assign_clusters`).

    Driver round-trips are batched: the convergence checksum runs every
    SECOND round (the converged star set is a fixed point of
    large-star/small-star, so one possibly-redundant extra round trades
    for halving the per-round driver actions that would otherwise
    serialize the critical path). With ``reliable_checkpoint`` the lineage
    truncation uses ``.checkpoint()`` against the SparkContext's
    checkpoint dir (fault-tolerant storage — required at cluster scale,
    where executor loss would invalidate `localCheckpoint` blocks);
    callers must have called ``sc.setCheckpointDir`` first.

    Raises RuntimeError if the iteration hits ``max_iter`` rounds without
    converging — silently returning a non-converged edge set would corrupt
    downstream cluster assignments.
    """

    def _truncate(df: DataFrame) -> DataFrame:
        if reliable_checkpoint:
            return df.checkpoint(eager=False)
        if use_local_checkpoint:
            # lazy: materialized by the next checksum collect — no extra
            # action per round
            return df.localCheckpoint(eager=False)
        return df

    cur = _truncate(_canon(edges))
    prev_sig = None
    rounds = 0
    while rounds < max_iter:
        cur = _truncate(_canon(_small_star(_large_star(cur))))
        rounds += 1
        if rounds % 2 == 0 or rounds >= max_iter:
            sig = _edge_checksum(cur)
            if sig == prev_sig or sig[0] == 0:
                return cur  # star-shaped: (a=root, b=member)
            prev_sig = sig
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(last checksum {prev_sig})"
    )


def assign_clusters(
    docs: DataFrame, edges: DataFrame, id_col: str = "doc_id", max_iter: int = 50
) -> DataFrame:
    """All docs -> (doc_id, cluster_id); singletons cluster to themselves."""
    stars = connected_components(edges, max_iter=max_iter)
    membership = stars.select(
        F.col("b").alias(id_col), F.col("a").alias("_root")
    ).unionByName(
        stars.select(F.col("a").alias(id_col), F.col("a").alias("_root"))
    ).groupBy(id_col).agg(F.min("_root").alias("_root"))
    return (
        docs.select(id_col)
        .dropDuplicates([id_col])
        .join(membership, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_root"), F.col(id_col)).alias("cluster_id"),
        )
    )
