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
    edges: DataFrame, max_iter: int = 50, use_local_checkpoint: bool = True
) -> DataFrame:
    """Edges (a, b) -> star edges (root, member), root = component min.

    Returns the converged edge set: every member points at its component's
    minimum node id. Nodes appearing in no edge are absent (callers
    coalesce to self — see :func:`assign_clusters`).
    """
    cur = _canon(edges)
    if use_local_checkpoint:
        # lazy local checkpoint: materialized by the checksum collect right
        # after — one action per round instead of two
        cur = cur.localCheckpoint(eager=False)
    prev_sig = _edge_checksum(cur)
    for _ in range(max_iter):
        nxt = _canon(_small_star(_large_star(cur)))
        if use_local_checkpoint:
            nxt = nxt.localCheckpoint(eager=False)
        sig = _edge_checksum(nxt)
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    return cur  # star-shaped: (a=root, b=member)


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
