"""Source connector tests (survey S1/S2/S4)."""

import os

import pytest

from frizbee_spark.sources.readers import load_documents, read_text_lines, write_table


@pytest.mark.spark
class TestReaders:
    def test_parquet_autodetect(self, spark, tmp_path):
        p = str(tmp_path / "t.parquet")
        spark.createDataFrame([(1, "a")], "doc_id long, text string").write.parquet(p)
        got = load_documents(spark, p)
        assert got.count() == 1

    def test_text_lines(self, spark, tmp_path):
        p = str(tmp_path / "lines.txt")
        with open(p, "w") as f:
            f.write("src/main.rs\nsrc/lib.rs\nREADME.md\n")
        got = read_text_lines(spark, p).collect()
        assert len(got) == 3
        texts = {r["text"] for r in got}
        assert texts == {"src/main.rs", "src/lib.rs", "README.md"}
        # ids deterministic across re-reads
        again = {(r["doc_id"], r["text"]) for r in read_text_lines(spark, p).collect()}
        assert again == {(r["doc_id"], r["text"]) for r in got}

    def test_write_table_roundtrip(self, spark, tmp_path):
        p = str(tmp_path / "out")
        df = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
        write_table(df, p)
        assert spark.read.parquet(p).count() == 2
