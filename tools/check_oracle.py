#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the same
testdata parquet tables, and compares: columns sorted by name, rows sorted by
all values, exact equality. Reports per-query PASS/FAIL with diffs.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # normalize datetime resolution: Spark parquet reads back as [ns],
    # DuckDB emits [us]; assert_frame_equal(check_exact=True) compares
    # raw int64s across resolutions and mass-fails identical frames
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))],
                        ignore_index=True)
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            n_rowsonly += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"[FAIL] {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            # also flag row-ORDER divergence (a comparer that doesn't sort
            # rows would fail there even when the sorted sets match)
            gu = got[sorted(got.columns)].reset_index(drop=True)
            wu = want[sorted(want.columns)].reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(gu, wu, check_dtype=False,
                                              check_exact=True)
                order = ""
            except AssertionError:
                order = "  [WARN row order differs]"
            print(f"[PASS] {name}: {len(g)} rows{order}")
            n_pass += 1
        except AssertionError as e:
            print(f"[FAIL] {name}: value mismatch\n{str(e)[:800]}")
            # show first differing cells
            for c in g.columns:
                neq = (g[c] != w[c]) & ~(g[c].isna() & w[c].isna())
                if neq.any():
                    i = neq.idxmax()
                    print(f"   first diff col={c} row={i}: got={g[c][i]!r} want={w[c][i]!r}")
            n_fail += 1
    print(f"\n{n_pass} PASS, {n_fail} FAIL, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
