"""Local stand-in for the driver's correctness gate: run every queries()
entry AND its oracle_sql() on the same parquet tables, compare row count,
schema (column names sorted), and a value hash over sorted columns/rows.

Usage: python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            col = col.round(6)
        h.update(pd.util.hash_pandas_object(col, index=False).values.tobytes())
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E
    from frizbee_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    n_pass = n_fail = n_noor = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"{name:28s} SPARK ERROR: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"{name:28s} rows={len(sdf):6d}  (no_oracle)")
            n_noor += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"{name:28s} ORACLE ERROR: {ex}")
            n_fail += 1
            continue
        s, o = norm_frame(sdf), norm_frame(odf)
        rows_ok = len(s) == len(o)
        schema_ok = list(s.columns) == list(o.columns)
        hash_ok = rows_ok and schema_ok and value_hash(s) == value_hash(o)
        ok = rows_ok and schema_ok and hash_ok
        n_pass += ok
        n_fail += (not ok)
        print(f"{name:28s} rows {len(s):6d}/{len(o):6d} "
              f"schema={'ok' if schema_ok else list(s.columns) + ['|'] + list(o.columns)} "
              f"hash={'ok' if hash_ok else 'MISMATCH'}")
        if not hash_ok and rows_ok and schema_ok and len(s) == len(o):
            diff = (s != o)
            bad_cols = [c for c in s.columns if diff[c].any()]
            print(f"    differing columns: {bad_cols[:5]}")
            for c in bad_cols[:2]:
                idx = diff[c].idxmax()
                print(f"    first diff col={c} row={idx}: spark={s[c][idx]!r} oracle={o[c][idx]!r}")
    print(f"\npass={n_pass} fail={n_fail} no_oracle={n_noor}")
    spark.stop()


if __name__ == "__main__":
    main()
