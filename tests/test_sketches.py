"""Portable-hash HLL: accuracy within theoretical error, branch
selection, null totality, shuffle-order invariance, plan shape."""

import pytest
from pyspark.sql import functions as F

from frizbee_spark.operators.sketches import hll_distinct


@pytest.mark.spark
class TestHllDistinct:
    def test_accuracy_raw_branch(self, spark):
        # stderr at p=10 is ~1.04/sqrt(1024) ~= 3.3%; allow 3 sigma
        df = spark.range(10000).select(
            F.col("id").cast("string").alias("x"))
        r = hll_distinct(df, ["x"], include_exact=True).collect()[0]
        assert r["method"] == "raw"
        assert r["exact_distinct"] == 10000
        assert abs(r["distinct_est"] - 10000) / 10000 < 0.10

    def test_linear_branch_small_cardinality(self, spark):
        df = spark.range(5000).select(
            (F.col("id") % 7).cast("string").alias("y"))
        r = hll_distinct(df, ["y"]).collect()[0]
        assert r["method"] == "linear"
        assert abs(r["distinct_est"] - 7) < 1.0

    def test_all_null_column_counts_zero(self, spark):
        df = spark.range(100).select(
            F.lit(None).cast("string").alias("z"))
        r = hll_distinct(df, ["z"], include_exact=True).collect()[0]
        assert (r["distinct_est"], r["n_filled"], r["exact_distinct"]) \
            == (0.0, 0, 0)
        assert r["method"] == "linear"

    def test_shuffle_order_invariance(self, spark):
        # integer scaled_sum makes the estimate independent of partition
        # layout — the property the textbook float sum does not have
        df = spark.range(3000).select(F.col("id").cast("string").alias("x"))
        a = hll_distinct(df, ["x"]).collect()[0]
        b = hll_distinct(df.repartition(13, "x"), ["x"]).collect()[0]
        c = hll_distinct(df.coalesce(1), ["x"]).collect()[0]
        assert a["scaled_sum"] == b["scaled_sum"] == c["scaled_sum"]
        assert a["distinct_est"] == b["distinct_est"] == c["distinct_est"]

    def test_plan_two_exchanges_no_distinct(self, spark):
        # sketch path: bucket groupBy + 1-row final agg = 2 exchanges,
        # and no exact-distinct aggregate unless asked
        df = spark.range(100).select(F.col("id").cast("string").alias("x"))
        plan = hll_distinct(df, ["x"])._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange") <= 2
        assert "count(distinct" not in plan.lower()
        assert "partial_max" in plan  # registers combine map-side

    def test_validation(self, spark):
        df = spark.range(10).select(F.col("id").cast("string").alias("x"))
        with pytest.raises(ValueError, match="at least one"):
            hll_distinct(df, [])
        with pytest.raises(ValueError, match="p must be"):
            hll_distinct(df, ["x"], p=2)
