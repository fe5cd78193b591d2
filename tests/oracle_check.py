"""Local replica of the driver's correctness gate: run each queries()[name]
on Spark and its oracle_sql()[name] on DuckDB at a given sf, compare
row-count + sorted values. Usage: python tests/oracle_check.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from spatialindex_spark.plans import get_session

    spark = get_session(app="oracle-check", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        sdf = fn(spark, sf_dir).toPandas()
        spark_secs = time.perf_counter() - t0
        if name not in oracles:
            print(f"{name:18s} rows={len(sdf):6d}  (rows-only check, "
                  f"no oracle)  [{spark_secs:6.2f}s]")
            continue
        odf = con.execute(oracles[name]).df()
        a, b = normalize(sdf), normalize(odf.rename(columns=str))
        ok_rows = len(a) == len(b)
        ok_schema = list(a.columns) == list(b.columns)
        ok_vals = ok_rows and ok_schema and a.equals(b.astype(a.dtypes.to_dict(), errors="ignore"))
        if not ok_vals and ok_rows and ok_schema:
            # numeric tolerance fallback for float columns
            import numpy as np
            ok_vals = True
            for c in a.columns:
                if a[c].dtype.kind == "f":
                    if not np.allclose(a[c], b[c].astype(float), atol=1e-9, equal_nan=True):
                        ok_vals = False
                elif not (a[c].astype(str) == b[c].astype(str)).all():
                    ok_vals = False
        status = "OK " if ok_vals else "FAIL"
        print(f"{name:18s} rows={len(sdf):6d} oracle={len(odf):6d} schema={'ok' if ok_schema else 'MISMATCH'} values={status} [{spark_secs:6.2f}s]")
        if not ok_vals:
            failures.append(name)
            print("  spark cols:", list(sdf.columns), " oracle cols:", list(odf.columns))
            if ok_rows and ok_schema:
                diff = (a != b).any(axis=1)
                print("  first diffs:\n", a[diff].head(3), "\n  vs\n", b[diff].head(3))
    print("\nFAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
