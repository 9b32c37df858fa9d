"""host_pagerank: exact parity with a pure-Python integer reference,
approximation quality vs float PageRank, and plan/lifecycle invariants."""

import pytest
from pyspark.sql import functions as F

from frizbee_spark.operators.graph import host_pagerank
from frizbee_spark.operators.webnorm import extract_links, host_graph
from frizbee_spark.util import release_tracked


def _py_pagerank(edges, n_iter=10, d=85, scale=10**12):
    """Independent driver-side reference of the exact integer spec."""
    es = sorted({(s, t) for s, t in edges if s != t})
    nodes = sorted({s for s, _ in es} | {t for _, t in es})
    n = len(nodes)
    deg = {}
    for s, _ in es:
        deg[s] = deg.get(s, 0) + 1
    base = scale // n
    rank = {h: base for h in nodes}
    for _ in range(n_iter):
        dangling = sum(r for h, r in rank.items() if h not in deg)
        share = dangling // n
        incoming = {h: 0 for h in nodes}
        for s, t in es:
            incoming[t] += rank[s] // deg[s]
        rank = {
            h: ((100 - d) * base + d * (incoming[h] + share)) // 100
            for h in nodes
        }
    return rank


def _edges(n_hosts=23, n_docs=400):
    out = []
    for i in range(n_docs):
        src = f"h{i % n_hosts}"
        out.append((src, f"h{(i * 7 + 3) % n_hosts}"))
        out.append((src, f"h{(i * 3 + 11) % n_hosts}"))
    return out


@pytest.mark.spark
class TestHostPagerank:
    def _run(self, spark, edges, **kw):
        df = spark.createDataFrame(edges, "src string, dst string")
        try:
            rows = host_pagerank(df, **kw).collect()
        finally:
            release_tracked()
        return {r.host: r.rank_u for r in rows}

    def test_exact_parity_with_reference(self, spark):
        edges = _edges()
        assert self._run(spark, edges) == _py_pagerank(edges)

    def test_parity_with_dangling_nodes(self, spark):
        # 'sink' has in-links only; its mass must recirculate uniformly
        edges = [("a", "sink"), ("b", "sink"), ("a", "b"), ("b", "a")]
        assert self._run(spark, edges) == _py_pagerank(edges)

    def test_duplicate_edges_and_self_loops_collapse(self, spark):
        edges = [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c"), ("c", "a")]
        want = _py_pagerank([("a", "b"), ("b", "c"), ("c", "a")])
        assert self._run(spark, edges) == want

    def test_close_to_float_pagerank(self, spark):
        import numpy as np

        edges = _edges(n_hosts=17, n_docs=300)
        got = self._run(spark, edges, n_iter=25)
        es = sorted({e for e in edges if e[0] != e[1]})
        nodes = sorted({s for s, _ in es} | {t for _, t in es})
        idx = {h: i for i, h in enumerate(nodes)}
        n = len(nodes)
        deg = np.zeros(n)
        for s, _ in es:
            deg[idx[s]] += 1
        r = np.full(n, 1.0 / n)
        for _ in range(25):
            inc = np.zeros(n)
            for s, t in es:
                inc[idx[t]] += r[idx[s]] / deg[idx[s]]
            dang = r[deg == 0].sum()
            r = 0.15 / n + 0.85 * (inc + dang / n)
        mine = np.array([got[h] for h in nodes], dtype=float) / 10**12
        # integer floor leak is parts-in-1e9 here; 1e-6 is generous
        assert np.abs(mine - r).max() < 1e-6

    def test_mass_conservation_bound(self, spark):
        edges = _edges()
        got = self._run(spark, edges)
        scale = 10**12
        total = sum(got.values())
        n_nodes = len(got)
        # floor leaks only: never above scale, bounded loss per the spec
        assert total <= scale
        assert scale - total < 10 * (n_nodes + 2 * len(edges) + 100)

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            host_pagerank(df, n_iter=0)
        with pytest.raises(ValueError):
            host_pagerank(df, damping_pct=101)

    def test_composes_with_extract_links(self, spark):
        # src_host comes lowercased from host_of() in a real pipeline
        rows = [
            (1, "ha.example",
             '<p><a href="https://hB.example/x">b</a>'
             '<a href="/rel">r</a></p>'),
            (2, "hb.example",
             '<p><A HREF="https://hA.example/y">a</A>'
             '<a href="https://hB.example/self">s</a></p>'),
        ]
        df = spark.createDataFrame(rows, "doc_id long, src_host string, html string")
        links = extract_links(df).join(
            df.select("doc_id", "src_host"), "doc_id")
        edges = host_graph(links)
        got = {(r.src, r.dst) for r in edges.collect()}
        # the relative href ('' host) and the self-link both drop
        assert got == {("ha.example", "hb.example"),
                       ("hb.example", "ha.example")}
        try:
            ranks = host_pagerank(edges).collect()
        finally:
            release_tracked()
        assert {r.host for r in ranks} == {"ha.example", "hb.example"}
        assert len({r.rank_u for r in ranks}) == 1  # symmetric 2-cycle
