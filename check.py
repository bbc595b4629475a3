#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare (dev tool only, not
part of the library). Usage: python3 check.py <sfDir> <outDir> [keys...]

Reads outDir/<name>/*.parquet (Spark result) and runs the matching SQL from
outDir/oracle_sql.json in DuckDB over the sfDir parquet tables, registering
each table name as a view. Compares: row count, column names (sorted), and
values (columns sorted by name, rows in result order, doubles compared
bitwise after round-trip through float64).
"""
import sys, os, json, glob
import duckdb, pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        # read the whole directory: robust if coalesce(1) is ever dropped
        spark_tbl = pq.read_table(f"{out_dir}/{name}")
        spark_df = spark_tbl.to_pandas()
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: cols {s_cols} vs {d_cols}"); n_fail += 1; continue
        # dtype parity: the driver hash-compares VALUES, so an int64
        # column on one side rendered float64 on the other (e.g. DuckDB
        # HUGEINT sums) hash-mismatches at equal values — r01's two
        # hash_match=false were exactly this. Treat dtype skew as FAIL.
        def is_dt(df, c):  # date/datetime cols are normalized pre-compare
            v = df[c].dropna()
            return (str(df[c].dtype).startswith("datetime") or
                    (len(v) and type(v.iloc[0]).__name__ in ("date", "datetime", "Timestamp")))
        dt = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
              for c in s_cols if str(spark_df[c].dtype) != str(duck_df[c].dtype)
              and not (is_dt(spark_df, c) and is_dt(duck_df, c))]
        if dt:
            print(f"FAIL {name}: dtype skew {dt}"); n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}"); n_fail += 1; continue
        s = spark_df[s_cols].reset_index(drop=True)
        d = duck_df[d_cols].reset_index(drop=True)
        mismatch = None
        import numpy as np
        def unarr(v):
            if isinstance(v, (np.ndarray, list)):
                return tuple(v)
            return v
        # the driver hashes the VALUES' textual form, so -0.0 vs 0.0 is a
        # real mismatch there even though == treats them equal; canonical
        # fix is normalizing floats through copysign-aware bit compare
        def signfix(v):
            if isinstance(v, float) and v == 0.0 and np.signbit(v):
                return "-0.0(BITS)"
            if isinstance(v, tuple):
                return tuple(signfix(x) for x in v)
            return v
        for c in s_cols:
            sv, dv = s[c].map(unarr).map(signfix), d[c].map(unarr).map(signfix)
            try:
                import pandas as pd
                if str(sv.dtype).startswith("datetime") or str(dv.dtype).startswith("datetime"):
                    sv = pd.to_datetime(sv).astype("datetime64[us]")
                    dv = pd.to_datetime(dv).astype("datetime64[us]")
                eq = (sv.astype(object).where(sv.notna(), None) ==
                      dv.astype(object).where(dv.notna(), None)) | (sv.isna() & dv.isna())
                if not eq.all():
                    i = eq[~eq].index[0]
                    mismatch = f"col {c} row {i}: spark={sv[i]!r} duck={dv[i]!r}"
                    break
            except Exception as e:
                mismatch = f"col {c}: compare error {e}"; break
        if mismatch:
            print(f"FAIL {name}: {mismatch}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    if only and n_pass + n_fail == 0:
        print(f"ERROR: no oracle entries matched filter {sorted(only)} "
              f"(typo'd query name?)")
        sys.exit(2)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
