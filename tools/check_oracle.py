#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/oracle_sql.json, registers the fixture tables from
<sfDir> as DuckDB views, runs each oracle SQL, and compares against the
Spark result parquet at <verifyOutDir>/<name>/ — columns sorted by name,
rows sorted, values compared exactly (after both engines' own rounding).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_path, "*.parquet"))
        if not files:
            print(f"[MISS] {name}: no spark output at {spark_path}")
            n_bad += 1
            continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            print(f"[ERR ] {name}: reading spark output: {e}")
            n_bad += 1
            continue
        try:
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"[ERR ] {name}: oracle sql failed: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[BAD ] {name}: columns {list(got.columns)} vs oracle {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"[BAD ] {name}: rows {len(got)} vs oracle {len(want)}")
            n_bad += 1
            continue
        # the driver HASHES values, so representation matters: a DuckDB
        # HUGEINT surfacing as float64 (un-cast SUM of integers) hashes
        # differently from Spark's int64 even when numerically equal.
        # Width differences (int32 vs int64, datetime ns vs us) hash the
        # same driver-side (CORRECTNESS_r07 evidence), so compare KIND.
        dtype_bad = [c for c in got.columns
                     if got[c].dtype.kind != want[c].dtype.kind]
        if dtype_bad:
            print(f"[BAD ] {name}: dtype mismatch "
                  + ", ".join(f"{c}: spark {got[c].dtype} vs oracle {want[c].dtype}"
                              for c in dtype_bad))
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            # pandas treats -0.0 == 0.0, but the driver hashes bit patterns:
            # compare float sign bits explicitly
            import numpy as np
            for c in got.columns:
                if got[c].dtype.kind == "f" and want[c].dtype.kind == "f":
                    gv, wv = got[c].to_numpy(), want[c].to_numpy()
                    mask = ~(pd.isna(gv) | pd.isna(wv))
                    if (np.signbit(gv[mask]) != np.signbit(wv[mask])).any():
                        raise AssertionError(f"float sign-bit mismatch in {c}"
                                             " (likely -0.0 vs +0.0)")
            print(f"[ OK ] {name}: {len(got)} rows")
            n_ok += 1
        except AssertionError as e:
            print(f"[BAD ] {name}: value mismatch\n{str(e)[:2000]}")
            print("spark:\n", got.head(10))
            print("oracle:\n", want.head(10))
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
