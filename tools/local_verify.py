#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 correctness gate.

Usage: python3 tools/local_verify.py [sf_dir] [out_dir]
Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle_sql.json entry in DuckDB against the sf_dir tables, and
compares: schema (column names), row count, and values (sorted columns
by name, sorted rows, floats rounded to 9 significant digits).
"""
import sys, json, glob, math, os

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    import numpy as np
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return None
        return round(float(v), 9)
    if isinstance(v, np.integer):
        return int(v)
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize float noise
    for c in df.columns:
        if df[c].dtype in ("float64", "float32", "object"):
            df[c] = df[c].apply(_norm_cell)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort",
                        key=lambda s: s.map(lambda x: (x is None, x)))
    return df


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{OUT_DIR}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    names = sorted([os.path.basename(d) for d in glob.glob(f"{OUT_DIR}/*") if os.path.isdir(d)])
    for name in names:
        try:
            spark_df = pd.concat([pd.read_parquet(p) for p in
                                  glob.glob(f"{OUT_DIR}/{name}/*.parquet")], ignore_index=True)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL: {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only: {len(spark_df)} rows " + ("OK" if len(spark_df) > 0 else "EMPTY!")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-FAIL: {e}"
            continue
        # The driver's harness sorts RAW columns with pandas and dies on
        # unhashable array cells (the q_pq round-9 red). Refuse arrays
        # here so the local gate matches the driver's behavior.
        arr_cols = [c for c in spark_df.columns
                    if spark_df[c].map(lambda v: isinstance(v, (list, tuple))
                                       or type(v).__name__ == "ndarray").any()]
        if arr_cols:
            results[name] = (f"ARRAY-COLUMNS: {arr_cols} would break the driver "
                             "harness sort - reshape to scalar rows (posexplode)")
            continue
        # Dtype parity: the driver hashes EXACT values, so DuckDB HUGEINT
        # (pandas float64, e.g. SUM(BIGINT) -> 921.0) against Spark int64
        # (921) is a driver hash FAIL even though check_dtype=False + rtol
        # below would pass it (the r11 q_collocations red). Fail any column
        # where one side is integer-kind and the other float-kind.
        shared = set(spark_df.columns) & set(duck_df.columns)
        dtype_bad = []
        for c in sorted(shared):
            sk, dk = spark_df[c].dtype.kind, duck_df[c].dtype.kind
            if {sk, dk} == {"i", "f"} or {sk, dk} == {"u", "f"}:
                dtype_bad.append(f"{c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}")
        if dtype_bad:
            results[name] = ("DTYPE-MISMATCH (driver exact-hash would fail; "
                             "CAST the oracle column): " + "; ".join(dtype_bad))
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH: spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH: spark={len(a)} duck={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-12)
                results[name] = "MATCH"
            except AssertionError as e:
                diff = str(e).split("\n")[0:6]
                # show first differing rows
                neq = (a.astype(str) != b.astype(str)).any(axis=1)
                sample = ""
                if neq.any():
                    i = neq.idxmax()
                    sample = f" | first diff row {i}: spark={a.loc[i].tolist()} duck={b.loc[i].tolist()}"
                results[name] = "VALUE-MISMATCH: " + " ".join(diff)[:300] + sample
    ok = sum(1 for v in results.values() if v == "MATCH" or v.startswith("rows-only") and "OK" in v)
    for k, v in results.items():
        print(f"{'PASS' if v == 'MATCH' or (v.startswith('rows-only') and 'OK' in v) else 'FAIL'} {k}: {v}")
    print(f"\n{ok}/{len(results)} pass")


if __name__ == "__main__":
    main()
