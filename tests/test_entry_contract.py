"""Driver-contract conformance: entry() smoke, every queries() entry runs,
and every oracle_sql() entry value-matches its Spark query under the
driver's comparison semantics (sorted column names, order-insensitive
rows, rounded floats)."""

import os

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64).round(4)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.spark
class TestEntryContract:
    def test_entry_smoke(self, spark):
        df = E.entry(spark)
        rows = df.count()
        assert rows > 0
        assert [f.name for f in df.schema.fields] == ["doc_id", "cluster_id", "cluster_size"]

    def test_every_oracle_has_query(self):
        qs, orc = E.queries(), E.oracle_sql()
        assert set(orc) <= set(qs)
        assert len(qs) >= 15

    @pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
    def test_query_matches_oracle(self, spark, duck, name):
        sdf = _canon(E.queries()[name](spark, SF).toPandas())
        ddf = _canon(duck.execute(E.oracle_sql()[name]).df())
        assert list(sdf.columns) == list(ddf.columns), (
            f"column mismatch: {list(sdf.columns)} vs {list(ddf.columns)}"
        )
        assert sdf.shape == ddf.shape
        pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False)

    @pytest.mark.parametrize(
        "name", sorted(set(E.queries()) - set(E.oracle_sql()))
    )
    def test_rows_only_queries_run(self, spark, name):
        df = E.queries()[name](spark, SF)
        pdf = df.toPandas()
        # stable schema + deterministic output across two runs
        pdf2 = E.queries()[name](spark, SF).toPandas()
        assert list(pdf.columns) == list(pdf2.columns)
        a = _canon(pdf) if len(pdf) else pdf
        b = _canon(pdf2) if len(pdf2) else pdf2
        if len(pdf):
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
