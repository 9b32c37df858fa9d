"""Driver-contract conformance: entry() smoke, every queries() entry runs,
every oracle_sql() entry value-matches its Spark query under the driver's
comparison semantics (sorted column names, order-insensitive rows, rounded
floats) — and the whole contract survives a VANILLA SparkSession (the
harness's actual environment: no Arrow, default config)."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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

    def test_vanilla_session_contract(self):
        """entry() + all queries() under a bare
        ``SparkSession.builder.master("local[2]").getOrCreate()`` in a
        FRESH subprocess — no Arrow, no repo session config. This is the
        driver harness's environment, and the one every in-repo check
        used to skip: r3's numpy.float64-in-array<double>
        createDataFrame regression (ann_topk/ivf_topk red in
        CORRECTNESS_r03) passed 270 curated-session tests and only
        failed here. Reverting that fix (__spark_entry__.py
        _clustered_emb_with_protos: V.tolist()) makes this test fail.

        Measured wall: ~70s for all 33 queries at sf0.001 — the
        non-Arrow toPandas path is exercised on every result too.
        """
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "vanilla_contract.py"),
             SF, "local[2]"],
            capture_output=True, text=True, timeout=900, cwd=REPO,
        )
        assert out.returncode == 0, (
            "vanilla-session contract failed:\n"
            + out.stdout[-4000:] + "\n" + out.stderr[-2000:]
        )
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("VANILLA_CONTRACT_JSON=")]
        assert line, out.stdout[-2000:]
        import json

        summary = json.loads(line[0].split("=", 1)[1])
        assert summary["failed"] == []
        # every contract surface ran: entry + all registered queries
        assert summary["n_queries"] == 1 + len(E.queries())

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
