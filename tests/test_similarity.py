"""Embedding similarity tests: brute-force exactness vs NumPy, ANN recall
on *clustered* vectors (the regime sign-LSH is designed for)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from frizbee_spark.operators.similarity import (
    ann_topk,
    brute_force_topk,
    embedding_near_dup_pairs,
)


def _clustered_vectors(n=200, dim=32, n_clusters=20, noise=0.05, seed=5):
    # noise is per-coordinate; total perturbation |noise*g| ~ noise*sqrt(dim)
    # = 0.28 against unit centers -> same-cluster cosine ~ 0.96, the regime
    # sign-LSH is built for (near-dup embeddings)
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    vecs = centers[assign] + noise * rng.normal(size=(n, dim))
    return vecs, assign


@pytest.fixture(scope="module")
def emb(spark):
    vecs, _ = _clustered_vectors()
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.mark.spark
class TestBruteForce:
    def test_matches_numpy(self, spark, emb):
        vecs, _ = _clustered_vectors()
        M = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        S = M @ M.T
        np.fill_diagonal(S, -2)
        got = brute_force_topk(emb, query_ids=[0, 7], k=3).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cosine"]))
        for q in (0, 7):
            want = np.argsort(-np.round(S[q], 4), kind="stable")[:3]
            got_ids = [n for n, _ in by_q[q]]
            # compare cosine values (id ties can legitimately reorder)
            want_cos = sorted(np.round(S[q][want], 4), reverse=True)
            got_cos = sorted((c for _, c in by_q[q]), reverse=True)
            assert np.allclose(got_cos, want_cos, atol=2e-4)
            assert len(got_ids) == 3

    def test_deterministic(self, emb):
        a = sorted(map(tuple, brute_force_topk(emb, [3], 5).collect()))
        b = sorted(map(tuple, brute_force_topk(emb, [3], 5).collect()))
        assert a == b


@pytest.mark.spark
class TestAnn:
    def test_recall_on_clustered_data(self, emb):
        queries = list(range(10))
        exact = brute_force_topk(emb, queries, 3).collect()
        approx = ann_topk(emb, queries, 3, n_planes=8, n_tables=16).collect()
        exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
        approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
        recall = len(exact_set & approx_set) / len(exact_set)
        assert recall >= 0.85, f"ANN recall {recall}"

    def test_candidates_sublinear(self, emb):
        # with 8 planes / 200 vecs, bucket join visits far fewer than all
        from frizbee_spark.operators.similarity import lsh_bucket_ids

        b = lsh_bucket_ids(emb, dim=32, n_planes=8, n_tables=1)
        sizes = b.groupBy("table_id", "bucket").count().collect()
        assert max(r["count"] for r in sizes) < 100


@pytest.mark.spark
class TestNearDupPairs:
    def test_finds_planted_duplicates(self, spark):
        rng = np.random.default_rng(17)
        base = rng.normal(size=(50, 32))
        dup = base[:10] + 0.01 * rng.normal(size=(10, 32))  # cos ~ 0.9999
        vecs = np.vstack([base, dup])
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = embedding_near_dup_pairs(df, threshold=0.99,
                                       n_planes=10, n_tables=8).collect()
        found = {(r["a"], r["b"]) for r in got}
        want = {(i, 50 + i) for i in range(10)}
        assert len(want & found) >= 9  # >= 90% of planted dups

    def test_blocked_exact_matches_catalyst_path(self, spark):
        # multi-block Gram scan == per-pair Catalyst cosine, incl. rounding
        from frizbee_spark.operators.similarity import (
            _cosine_expr, blocked_all_pairs_cosine)
        from pyspark.sql import functions as F

        rng = np.random.default_rng(23)
        vecs = rng.normal(size=(120, 16))
        rows = [(i * 7 + 3, [float(x) for x in v]) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = sorted(
            (r["a"], r["b"], r["cosine"])
            for r in blocked_all_pairs_cosine(df, 0.3, block_size=32).collect()
        )
        base = df.select(F.col("vec_id"), F.col("embedding").alias("vec"))
        exp = sorted(
            (r["a"], r["b"], r["cosine"])
            for r in base.alias("x").join(
                base.alias("y"), F.col("x.vec_id") < F.col("y.vec_id"))
            .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"),
                    F.round(_cosine_expr("x.vec", "y.vec"), 4).alias("cosine"))
            .filter(F.col("cosine") >= 0.3).collect()
        )
        assert len(got) > 0
        assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in exp]
        assert all(abs(c1 - c2) < 1e-9 for (_, _, c1), (_, _, c2) in zip(got, exp))

    def test_dense_lsh_config_routes_to_blocked(self, spark):
        # planes=4/tables=32 passes ~2x all-pairs through the bucket union
        # -> must plan the exact Gram scan (no bucket join in the plan)
        rng = np.random.default_rng(5)
        rows = [(i, [float(x) for x in v])
                for i, v in enumerate(rng.normal(size=(40, 8)))]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        plan = embedding_near_dup_pairs(
            df, threshold=0.4, n_planes=4, n_tables=32
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "dropDuplicates" not in plan and "table_id" not in plan


@pytest.mark.spark
class TestIVF:
    def _clustered(self, spark, n_blobs=8, per_blob=40, dim=24):
        rng = np.random.default_rng(31)
        centers = rng.normal(size=(n_blobs, dim)) * 4
        vecs = np.vstack([
            centers[b] + rng.normal(size=(per_blob, dim))
            for b in range(n_blobs)
        ])
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_recall_vs_brute_force_on_clustered_data(self, spark):
        from frizbee_spark.operators.similarity import brute_force_topk, ivf_topk

        df = self._clustered(spark)
        qids = [0, 45, 123, 200, 280]
        exact = brute_force_topk(df, qids, k=10).collect()
        got = ivf_topk(df, qids, k=10, n_centroids=8, nprobe=3,
                       sample_size=1000).collect()
        want = {(r["query_id"], r["neighbor_id"]) for r in exact}
        found = {(r["query_id"], r["neighbor_id"]) for r in got}
        assert len(want & found) / len(want) >= 0.9

    def test_deterministic_across_runs(self, spark):
        from frizbee_spark.operators.similarity import ivf_topk

        df = self._clustered(spark, n_blobs=4, per_blob=25)
        a = sorted(map(tuple, ivf_topk(df, [3, 77], k=5, n_centroids=4,
                                       nprobe=2).collect()))
        b = sorted(map(tuple, ivf_topk(df, [3, 77], k=5, n_centroids=4,
                                       nprobe=2).collect()))
        assert a == b and len(a) == 10

    def test_candidates_bounded_by_probe_fraction(self, spark):
        # with nprobe=1 of 8 lists, each query scans ~1/8 of the table
        from frizbee_spark.operators.similarity import (
            ivf_assign, ivf_train_centroids)

        df = self._clustered(spark)
        cents = ivf_train_centroids(df, n_centroids=8, sample_size=1000)
        sizes = ivf_assign(df, cents).groupBy("list_id").count().collect()
        assert len(sizes) >= 6  # clusters actually spread across lists
        assert max(r["count"] for r in sizes) < 320  # no single mega-list

    def test_empty_query_set_returns_empty(self, spark):
        from frizbee_spark.operators.similarity import ivf_topk

        df = self._clustered(spark, n_blobs=2, per_blob=10)
        out = ivf_topk(df, [999_999], k=3, n_centroids=2, nprobe=1)
        assert out.count() == 0
        assert out.columns == ["query_id", "neighbor_id", "cosine"]


@pytest.mark.spark
class TestIvfCertifiedExact:
    """r3: ivf_topk(certify=True) is exact by construction (ball-tree
    bound over list angular radii) — verified on the WORST case,
    unstructured near-orthogonal vectors, where the bound must force
    re-probes rather than silently losing neighbors."""

    def _unstructured(self, spark, n=300, dim=24, seed=11):
        rng = np.random.default_rng(seed)
        vecs = rng.normal(size=(n, dim))
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_exact_on_unstructured(self, spark):
        from frizbee_spark.operators.similarity import brute_force_topk, ivf_topk
        from frizbee_spark.util import release_tracked

        df = self._unstructured(spark)
        qids = [0, 50, 150]
        exact = sorted(map(tuple, brute_force_topk(df, qids, k=5).collect()))
        got = sorted(map(tuple, ivf_topk(df, qids, k=5, n_centroids=12,
                                         nprobe=2, certify=True).collect()))
        release_tracked()
        assert got == exact

    def test_exact_on_clustered(self, spark, emb):
        from frizbee_spark.operators.similarity import brute_force_topk, ivf_topk
        from frizbee_spark.util import release_tracked

        qids = [0, 40, 99]
        exact = sorted(map(tuple, brute_force_topk(emb, qids, k=5).collect()))
        got = sorted(map(tuple, ivf_topk(emb, qids, k=5, n_centroids=16,
                                         nprobe=4, certify=True).collect()))
        release_tracked()
        assert got == exact


@pytest.mark.spark
class TestDriverAnnClustered:
    """The driver ANN queries run over the derived clustered corpus
    (__spark_entry__._clustered_emb) at a scale-sane config; their
    brute-force oracles are valid because candidate recall is exactly
    1.0 there (deterministic hyperplanes) / certification (IVF). Assert
    the equality at every fixture scale, including sf0.1 (the bench)."""

    @pytest.mark.parametrize("sf_dir", [
        "/root/testdata/sf0.001", "/root/testdata/sf0.1",
    ])
    def test_ann_topk_equals_bruteforce(self, spark, sf_dir):
        import os

        import __spark_entry__ as E
        from frizbee_spark.operators.similarity import brute_force_topk

        if not os.path.isdir(sf_dir):
            pytest.skip(f"{sf_dir} missing")
        cb = E._clustered_emb(spark, sf_dir)
        exact = sorted(map(tuple,
                           brute_force_topk(cb, [0, 1, 2, 3, 4], k=5).collect()))
        got = sorted(map(tuple, E.q_ann_topk(spark, sf_dir).collect()))
        assert got == exact

    def test_ivf_topk_equals_bruteforce_sf0001(self, spark):
        import __spark_entry__ as E
        from frizbee_spark.operators.similarity import brute_force_topk
        from frizbee_spark.util import release_tracked

        sf_dir = "/root/testdata/sf0.001"
        cb = E._clustered_emb(spark, sf_dir)
        exact = sorted(map(tuple,
                           brute_force_topk(cb, [5, 6, 7, 8, 9], k=5).collect()))
        got = sorted(map(tuple, E.q_ivf_topk(spark, sf_dir).collect()))
        release_tracked()
        assert got == exact


@pytest.mark.spark
class TestSemanticDedup:
    """semantic_dedup = near-dup graph -> CC -> min-id representative.
    Reference: NumPy all-pairs cosine + union-find, same rounding rule."""

    def _reference(self, vecs, threshold):
        M = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        C = M @ M.T
        C = np.sign(C) * np.floor(np.abs(C) * 1e4 + 0.5) / 1e4  # HALF_UP, 4dp
        parent = list(range(len(vecs)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        a_idx, b_idx = np.nonzero(np.triu(C >= threshold, k=1))
        for a, b in zip(a_idx, b_idx):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {i: find(i) for i in range(len(vecs))}

    def test_matches_union_find_reference(self, spark, emb):
        from frizbee_spark.operators.similarity import semantic_dedup
        from frizbee_spark.util import release_tracked

        vecs, _ = _clustered_vectors()
        want = self._reference(vecs, 0.9)
        sizes = {}
        for r in want.values():
            sizes[r] = sizes.get(r, 0) + 1
        # dense LSH config -> exact blocked-Gram route, so the graph is
        # exactly the reference's (no LSH recall question in this test)
        got = semantic_dedup(emb, threshold=0.9, n_planes=4,
                             n_tables=32).collect()
        release_tracked()
        assert len(got) == len(vecs)  # partition of all ids
        for row in got:
            assert row.cluster_id == want[row.vec_id]
            assert row.cluster_size == sizes[want[row.vec_id]]
            assert row.keep == (row.vec_id == want[row.vec_id])

    def test_keep_is_one_per_cluster_and_min_id(self, spark, emb):
        from frizbee_spark.operators.similarity import semantic_dedup
        from frizbee_spark.util import release_tracked

        rows = semantic_dedup(emb, threshold=0.9, n_planes=4,
                              n_tables=32).collect()
        release_tracked()
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, []).append(r)
        for cid, members in by_cluster.items():
            kept = [r.vec_id for r in members if r.keep]
            assert kept == [min(r.vec_id for r in members)] == [cid]

    def test_orthogonal_vectors_all_singletons(self, spark):
        from frizbee_spark.operators.similarity import semantic_dedup
        from frizbee_spark.util import release_tracked

        eye = np.eye(8)
        rows = [(i, [float(x) for x in eye[i]]) for i in range(8)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = semantic_dedup(df, threshold=0.5, n_planes=4,
                             n_tables=32).collect()
        release_tracked()
        assert sorted((r.vec_id, r.cluster_id, r.cluster_size, r.keep)
                      for r in got) == [(i, i, 1, True) for i in range(8)]
