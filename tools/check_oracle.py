#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (with each
testdata parquet registered as a view named after the table), sort both
by column name, and compare values. Not part of the Scala library —
uses the driver-side python stack purely as a local pre-commit gate.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def bit_diff(g: pd.DataFrame, w: pd.DataFrame):
    """Bitwise float compare — catches -0.0 vs 0.0 and last-ulp drift that
    pandas' tolerant equality hides but the driver's value hash does not."""
    import numpy as np
    for c in g.columns:
        a, b = g[c].to_numpy(), w[c].to_numpy()
        if a.dtype.kind == "f" and b.dtype.kind == "f":
            av, bv = a.astype("f8").view("u8"), b.astype("f8").view("u8")
            if not np.array_equal(av, bv):
                idx = np.nonzero(av != bv)[0][:3]
                return (f"col {c} float-bit diff rows {idx.tolist()}: "
                        f"spark={a[idx].tolist()} duck={b[idx].tolist()}")
    return None


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = pd.read_parquet(qdir)
        sql = oracles.get(name)
        if sql is None:
            status = "ROWS-ONLY" if len(got) > 0 else "EMPTY!"
            print(f"{status:10s} {name} rows={len(got)}")
            if len(got) == 0:
                n_fail += 1
            else:
                n_pass += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL-COLS  {name}: spark={list(g.columns)} duck={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL-ROWS  {name}: spark={len(g)} duck={len(w)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            bd = bit_diff(g, w)
            if bd is not None:
                print(f"FAIL-BITS  {name}: {bd}")
                n_fail += 1
            else:
                print(f"PASS       {name} rows={len(g)}")
                n_pass += 1
        except AssertionError as e:
            print(f"FAIL-VALS  {name}: {str(e).splitlines()[-1] if str(e) else e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
