"""Physical-plan hygiene tests: the plans we claim are the plans we get."""

import pytest
from pyspark.sql import functions as F

from frizbee_spark.plans.inspect import (
    formatted_plan,
    plan_report,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    uses_broadcast_join,
)


@pytest.fixture(scope="module")
def pq(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "docs.parquet")
    spark.createDataFrame(
        [(i, f"text {i}", "en" if i % 2 else "de", i * 10) for i in range(100)],
        "doc_id long, text string, lang string, n_chars long",
    ).write.parquet(p)
    return p


@pytest.mark.spark
class TestPlanHygiene:
    def test_filter_pushdown_reaches_scan(self, spark, pq):
        df = spark.read.parquet(pq).filter(F.col("lang") == "en").select("doc_id")
        pf = pushed_filters(df)
        assert any("lang" in f for f in pf), pf

    def test_column_pruning(self, spark, pq):
        df = spark.read.parquet(pq).select("doc_id", "lang")
        cols = read_schema_columns(df)
        assert set(cols) == {"doc_id", "lang"}  # text/n_chars NOT read

    def test_min_length_filter_pushdown_fuzzy(self, spark, pq):
        # the fuzzy operator's min-length filter must be a Catalyst
        # predicate, not hidden inside the UDF (survey F2)
        from frizbee_spark.constants import MatchConfig
        from frizbee_spark.operators.fuzzy import fuzzy_match

        df = fuzzy_match(spark.read.parquet(pq), "needle-string",
                         text_col="text", id_cols=["doc_id"],
                         config=MatchConfig(max_typos=0, sort=False))
        plan = formatted_plan(df)
        assert "length" in plan  # length(text) >= ... appears in the plan

    def test_broadcast_join_for_small_side(self, spark, pq):
        big = spark.read.parquet(pq)
        small = spark.createDataFrame([(0,), (1,)], "doc_id long")
        j = big.join(F.broadcast(small), "doc_id")
        assert uses_broadcast_join(j)

    def test_shuffle_count_visible(self, spark, pq):
        df = spark.read.parquet(pq).groupBy("lang").count()
        assert shuffle_count(df) >= 1

    def test_signature_stage_reads_minimal_columns(self, spark, pq):
        from frizbee_spark.operators.dedup import compute_signatures, normalize_text

        docs = normalize_text(spark.read.parquet(pq), "text")
        sigs = compute_signatures(docs)
        cols = read_schema_columns(sigs)
        # only doc_id + text feed the signature scan — no n_chars/lang
        assert "n_chars" not in cols and "lang" not in cols

    def test_report_shape(self, spark, pq):
        rep = plan_report(spark.read.parquet(pq).select("doc_id"))
        assert set(rep) == {"pushed_filters", "read_columns", "codegen_stages",
                            "broadcast_join", "shuffles"}
