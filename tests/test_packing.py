"""pack_sequences: concat-and-chunk packing manifest invariants."""

import pytest
from pyspark.sql import functions as F

from frizbee_spark.operators.packing import pack_sequences


def _docs(spark, n=200, tok_lo=1, tok_hi=40):
    # deterministic fake corpus: doc i has (i % span + tok_lo) tokens
    span = tok_hi - tok_lo + 1
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(tok_lo + i % span)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.spark
class TestPackSequences:
    SEQ = 64

    def test_manifest_is_exact_running_sum(self, spark):
        out = pack_sequences(_docs(spark), self.SEQ, n_shards=4).toPandas()
        for shard, g in out.groupby("shard"):
            g = g.sort_values("doc_id").reset_index(drop=True)
            cum = 0
            for r in g.itertuples():
                assert r.tok_offset == cum
                assert r.seq_first == cum // self.SEQ
                assert r.seq_last == (cum + r.n_tokens - 1) // self.SEQ
                assert r.seq_offset == cum % self.SEQ
                cum += r.n_tokens

    def test_straddle_iff_crossing_a_cut(self, spark):
        out = pack_sequences(_docs(spark), self.SEQ, n_shards=4).toPandas()
        for r in out.itertuples():
            straddles = r.seq_last > r.seq_first
            assert straddles == (r.seq_offset + r.n_tokens > self.SEQ)

    def test_token_conservation_per_shard(self, spark):
        # stream length == sum of member docs (no gaps, no overlaps)
        out = pack_sequences(_docs(spark), self.SEQ, n_shards=4).toPandas()
        for shard, g in out.groupby("shard"):
            assert (g.tok_offset + g.n_tokens).max() == g.n_tokens.sum()

    def test_append_only_stability(self, spark):
        # appending docs with HIGHER ids never rewrites existing rows
        d1 = _docs(spark, n=150)
        d2 = _docs(spark, n=200)
        m1 = (
            pack_sequences(d1, self.SEQ, n_shards=4)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        m2 = (
            pack_sequences(d2, self.SEQ, n_shards=4)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert m1.equals(m2.iloc[: len(m1)].reset_index(drop=True))

    def test_null_text_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "a b"), (2, None), (3, "c")], "doc_id long, text string"
        )
        out = pack_sequences(df, self.SEQ).toPandas()
        assert sorted(out.doc_id) == [1, 3]

    def test_single_exchange_plan(self, spark):
        plan = (
            pack_sequences(_docs(spark, 20), self.SEQ, n_shards=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1

    def test_validation(self, spark):
        d = _docs(spark, 5)
        with pytest.raises(ValueError):
            pack_sequences(d, 0)
        with pytest.raises(ValueError):
            pack_sequences(d, 64, n_shards=0)


from frizbee_spark.operators.packing import select_to_budget
from frizbee_spark.util import release_tracked


def _budget_oracle(rows, budget):
    """Brute-force prefix rule: (id, weight, cost) -> selected list."""
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    out, cum, rank = [], 0, 0
    for i, w, c in order:
        rank += 1
        cum += c
        if cum > budget:
            break
        out.append((i, w, c, cum, rank))
    return out


@pytest.mark.spark
class TestSelectToBudget:
    def _rows(self, n=500):
        # weights collide on purpose (i % 37) so the id tiebreak binds
        return [(i, (i * 13) % 37, 1 + (i * 7) % 50) for i in range(n)]

    def _run(self, spark, rows, budget, **kw):
        df = spark.createDataFrame(rows, "doc_id long, w long, cost long")
        try:
            out = (
                select_to_budget(df, budget, "w", "cost", **kw)
                .orderBy("sel_rank")
                .collect()
            )
        finally:
            release_tracked()
        return [
            (r.doc_id, r.weight, r.cost, r.cum_cost, r.sel_rank) for r in out
        ]

    def test_matches_brute_force_prefix(self, spark):
        rows = self._rows()
        for budget in (0, 1, 137, 2_000, 10**9):
            assert self._run(spark, rows, budget) == _budget_oracle(
                rows, budget
            ), budget

    def test_partition_count_invariance(self, spark):
        rows = self._rows(300)
        want = _budget_oracle(rows, 900)
        for nparts in (1, 3, 17):
            assert (
                self._run(spark, rows, 900, num_partitions=nparts) == want
            ), nparts

    def test_strict_prefix_not_knapsack(self, spark):
        # rank 2 overflows; rank 3 would fit but the prefix rule stops
        rows = [(1, 10, 5), (2, 9, 100), (3, 8, 1)]
        assert self._run(spark, rows, 10) == [(1, 10, 5, 5, 1)]

    def test_nulls_dropped_and_validation(self, spark):
        df = spark.createDataFrame(
            [(1, 5, None), (2, None, 3), (3, 4, 2)],
            "doc_id long, w long, cost long",
        )
        try:
            got = select_to_budget(df, 100, "w", "cost").collect()
        finally:
            release_tracked()
        assert [(r.doc_id, r.cum_cost) for r in got] == [(3, 2)]
        with pytest.raises(ValueError):
            select_to_budget(df, -1, "w", "cost")

    def test_head_partitions_only_when_budget_small(self, spark):
        # budget smaller than the first doc -> empty, and still exact
        rows = self._rows(100)
        assert self._run(spark, rows, 0) == []
