"""Connected-components correctness vs a union-find oracle (differential
testing, the reference's pattern 2 — see SURVEY.md §5)."""

import numpy as np
import pytest

from frizbee_spark.operators.components import assign_clusters, connected_components


def _oracle(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # root = min of component
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    label = {}
    for r, members in comp.items():
        m = min(members)
        for v in members:
            label[v] = m
    return label


@pytest.mark.spark
class TestConnectedComponents:
    def _run(self, spark, n_nodes, edges):
        nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
        edf = spark.createDataFrame([(a, b) for a, b in edges] or [], "a long, b long")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in assign_clusters(nodes, edf).collect()
        }
        want = _oracle(n_nodes, edges)
        assert got == want

    def test_path_graph(self, spark):
        self._run(spark, 12, [(i, i + 1) for i in range(9)])

    def test_star_and_singletons(self, spark):
        self._run(spark, 10, [(0, i) for i in range(1, 6)])

    def test_two_components_merge(self, spark):
        edges = [(0, 1), (1, 2), (5, 6), (6, 7), (2, 5)]
        self._run(spark, 9, edges)

    def test_random_graph_matches_oracle(self, spark):
        rng = np.random.default_rng(13)
        n = 200
        edges = [tuple(sorted(e)) for e in rng.integers(0, n, size=(150, 2)).tolist()
                 if e[0] != e[1]]
        self._run(spark, n, edges)

    def test_empty_edges(self, spark):
        self._run(spark, 5, [])

    def test_star_output_shape(self, spark):
        edf = spark.createDataFrame([(3, 7), (7, 9), (1, 2)], "a long, b long")
        stars = connected_components(edf).collect()
        for r in stars:
            assert r["a"] < r["b"]
        roots = {r["a"] for r in stars}
        assert roots == {1, 3}


@pytest.mark.spark
class TestReliableCheckpoint:
    def test_reliable_checkpoint_same_result(self, spark, tmp_path):
        from frizbee_spark.operators.components import connected_components

        spark.sparkContext.setCheckpointDir(str(tmp_path / "cc_ckpt"))
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (12, 11), (20, 21)], "a long, b long"
        )
        plain = sorted(map(tuple, connected_components(edges).collect()))
        reliable = sorted(map(tuple, connected_components(
            edges, reliable_checkpoint=True).collect()))
        assert plain == reliable
        assert (1, 3) in plain and (10, 12) in plain

    def test_non_convergence_raises(self, spark):
        from frizbee_spark.operators.components import connected_components

        edges = spark.createDataFrame([(i, i + 1) for i in range(20)],
                                      "a long, b long")
        with pytest.raises(RuntimeError):
            connected_components(edges, max_iter=1, driver_max_edges=0)

    def test_driver_vs_distributed_identical(self, spark):
        import numpy as np

        from frizbee_spark.operators.components import connected_components

        rng = np.random.default_rng(11)
        pairs = [tuple(sorted(e)) for e in
                 rng.integers(0, 300, size=(250, 2)).tolist() if e[0] != e[1]]
        edges = spark.createDataFrame(pairs, "a long, b long")
        via_driver = sorted(map(tuple, connected_components(edges).collect()))
        via_dist = sorted(map(tuple, connected_components(
            edges, driver_max_edges=0).collect()))
        assert via_driver == via_dist
