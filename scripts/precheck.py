#!/usr/bin/env python3
"""Local stand-in for the driver's t2 DuckDB-oracle compare.

Usage: python3 scripts/precheck.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle in DuckDB over views of <sfDir>'s parquet tables, reads our parquet
result, sorts columns by name, and compares values cell-by-cell in row
order (strict — every declared query must have a total order). Exit 1 on
any mismatch, with the first few differing cells printed for diagnosis.
"""
import sys, json, math, glob
from decimal import Decimal

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(x):
    if x is None:
        return "NULL"
    if isinstance(x, float):
        return "NaN" if math.isnan(x) else repr(x)
    if isinstance(x, np.floating):
        return canon(float(x))
    if isinstance(x, (np.integer, int, bool, np.bool_)):
        return str(int(x))
    if isinstance(x, Decimal):
        s = format(x, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return s
    if isinstance(x, np.ndarray):
        return "[" + ",".join(canon(v) for v in x.tolist()) + "]"
    if isinstance(x, (list, tuple)):
        return "[" + ",".join(canon(v) for v in x) + "]"
    if x != x:  # pandas NaT
        return "NULL"
    return str(x)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails, skipped = [], []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS {name} :: no verify output")
            fails.append(name)
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"ERR  {name} :: {str(e)[:300]}")
            fails.append(name)
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        probs = []
        if list(got.columns) != list(exp.columns):
            probs.append(f"cols {list(got.columns)} vs {list(exp.columns)}")
        elif len(got) != len(exp):
            probs.append(f"rows {len(got)} vs {len(exp)}")
        else:
            for c in got.columns:
                a = got[c].map(canon).to_numpy()
                b = exp[c].map(canon).to_numpy()
                neq = a != b
                if neq.any():
                    i = int(np.argmax(neq))
                    probs.append(
                        f"col {c}: {int(neq.sum())} diffs, first row {i}: "
                        f"{a[i]!r} vs {b[i]!r}")
        if probs:
            print(f"FAIL {name} :: " + "; ".join(probs))
            fails.append(name)
        else:
            print(f"OK   {name} ({len(got)} rows)")
    n = len([k for k in oracle if not only or k in only])
    print(f"--- {n - len(fails)}/{n} oracle queries match")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
