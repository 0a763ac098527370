#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [q_a,q_b,...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB over the sfDir tables,
sorts columns by name, canonicalizes values, and diffs. The optional
third argument restricts the check to a comma-separated query subset
(pairs with Verify's SPARK_GRAFT_ONLY for targeted runs, e.g. the
adversarial fixture gate).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        missing = only - set(oracle)
        assert not missing, f"unknown queries in subset: {sorted(missing)}"
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            sdf = canon(pd.read_parquet(spark_path))
            ddf = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ERROR    {name}: {e}"); n_bad += 1; continue
        if list(sdf.columns) != list(ddf.columns):
            print(f"SCHEMA   {name}: spark={list(sdf.columns)} duck={list(ddf.columns)}")
            n_bad += 1; continue
        if len(sdf) != len(ddf):
            print(f"ROWS     {name}: spark={len(sdf)} duck={len(ddf)}"); n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False,
                                          check_exact=True)
            print(f"OK       {name} ({len(sdf)} rows)"); n_ok += 1
        except AssertionError as e:
            msg = str(e).splitlines()
            print(f"MISMATCH {name}: {msg[0] if msg else e}")
            neq = (sdf != ddf) & ~(sdf.isna() & ddf.isna())
            bad_cols = [c for c in sdf.columns if neq[c].any()]
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                print(f"  col {c} row {i}: spark={sdf[c][i]!r} duck={ddf[c][i]!r}"
                      f" (n_bad={int(neq[c].sum())})")
            n_bad += 1
    print(f"\n{n_ok} OK, {n_bad} BAD")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
