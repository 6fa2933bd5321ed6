"""Local mimic of the driver's correctness gate: run every queries() entry
via Spark and its oracle_sql() via DuckDB on the same sf dir, compare
row-count, column names/dtypes, and order-insensitive values.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype(np.float64)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype(np.int64)
        else:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from maxx_spark.session import get_spark

    spark = get_spark("oracle-compare", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in osql:
            print(f"OK?  {name}: rows-only check, {len(sdf)} rows")
            continue
        try:
            odf = con.execute(osql[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex).splitlines()[0]}")
            failed.append(name)
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            failed.append(name)
            continue
        a, b = canon(sdf), canon(odf)
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failed.append(name)
            continue
        eq = True
        for c in a.columns:
            if a[c].dtype == np.float64:
                ok = np.allclose(a[c].to_numpy(), b[c].to_numpy(), rtol=0, atol=0, equal_nan=True)
                exact = ok
                close = np.allclose(a[c].to_numpy(), b[c].to_numpy(), rtol=1e-12, atol=1e-12, equal_nan=True)
                if not exact:
                    eq = False
                    print(f"  {name}.{c}: exact={exact} close={close}")
            else:
                if not a[c].equals(b[c]):
                    eq = False
                    bad = (a[c] != b[c])
                    print(f"  {name}.{c}: {int(bad.sum())} mismatches, e.g. {a[c][bad].head(3).tolist()} vs {b[c][bad].head(3).tolist()}")
        dt_a, dt_b = dict(sdf.dtypes.astype(str)), dict(odf.dtypes.astype(str))
        # Declared dtype equivalences: pandas materializes Spark timestamps
        # as ns and DuckDB's as us — same instants, different unit. Anything
        # else that differs is a genuine schema mismatch and FAILS here
        # (CLAUDE.md invariant: dtypes must match the oracle exactly).
        _ts = ("datetime64[ns]", "datetime64[us]")
        real_diff = {
            k: (dt_a[k], dt_b.get(k))
            for k in dt_a
            if dt_a[k] != dt_b.get(k)
            and not (dt_a[k] in _ts and dt_b.get(k) in _ts)
        }
        if real_diff:
            eq = False
            print(f"  {name}: dtype mismatch {real_diff}")
        if eq:
            print(f"PASS {name}: {len(a)} rows")
        else:
            print(f"FAIL {name}: value mismatch")
            failed.append(name)
    print("\n==", "ALL PASS" if not failed else f"FAILED: {failed}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
