"""Run driver-contract queries against their DuckDB oracles, mirroring
the driver's compare (sorted column names, row counts, value hash).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
Defaults: /root/testdata/sf0.01, all queries.
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def value_hash(df) -> str:
    import pandas as pd

    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        if d[c].dtype == object:
            d[c] = d[c].astype(str)
        elif str(d[c].dtype).startswith("float"):
            d[c] = d[c].round(6)
    rows = sorted(tuple(str(v) for v in r) for r in d.itertuples(index=False))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb

    import __spark_entry__ as E
    from frizbee_spark.session import get_spark
    from frizbee_spark.util import release_tracked

    spark = get_spark("oracle-check", cores=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    names = sys.argv[2:] or list(qs)
    failed = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            release_tracked()
            if name not in oracles:
                print(f"{name}: rows={len(sdf)} (rows-only, no oracle)")
                continue
            odf = con.execute(oracles[name]).df()
            rows = len(sdf) == len(odf)
            schema = sorted(sdf.columns) == sorted(odf.columns)
            hmatch = value_hash(sdf) == value_hash(odf) if rows and schema else False
            ok = rows and schema and hmatch
            print(f"{name}: rows={len(sdf)}/{len(odf)} schema={schema} hash={hmatch}"
                  + ("" if ok else "  <-- FAIL"))
            if not ok:
                failed.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failed.append(name)
    E.release_clustered_cache()  # session end: drain the ANN corpus cache
    spark.stop()
    print("FAILED:", failed if failed else "none")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
