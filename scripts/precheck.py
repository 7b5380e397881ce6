#!/usr/bin/env python3
"""Local stand-in for the driver's t2 DuckDB-oracle compare — DRIVER-FAITHFUL.

Usage: python3 scripts/precheck.py <sfDir> <verifyOutDir> [query ...]

Round-1 lesson (VERDICT.md "What's wrong" #3): the old precheck
canonicalized Decimals (stripped trailing zeros) and serialized ndarrays,
which the driver's comparator does NOT do — that leniency turned 19 real
failures into a false local 70/70. This version replicates the driver's
observable behavior:

  - OUR result is read the way the driver reads it: pandas/pyarrow over the
    Spark parquet, so DECIMAL columns surface as Python Decimal objects and
    array columns as ndarrays — NOT through DuckDB (which would float-ify
    decimals and mask the mismatch).
  - The ORACLE is read via duckdb .df() (decimal -> float64), as the driver
    does.
  - Both frames are column-name-sorted, then ROW-SORTED BY ALL COLUMNS with
    pandas sort_values — an ndarray cell raises the same
    "unhashable type: 'numpy.ndarray'" the driver reports (we surface it as
    ERR instead of crashing the whole run).
  - Values compare strictly: a Decimal is tagged and keeps its trailing
    zeros, so Decimal('2.5000') NEVER equals float 2.5. Floats compare by
    repr (bit-exact). No leniency beyond date/timestamp unification, which
    round 1 proved the driver performs (timestamp-keyed queries were green).

Exit 1 on any mismatch, with the first few differing cells printed.
"""
import sys, json, math, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(x):
    """Strict canonical form. Decimals are type-tagged and keep trailing
    zeros; floats are repr (bit-exact); only date/timestamp spellings are
    unified across the two read paths."""
    if x is None:
        return "NULL"
    if isinstance(x, (np.floating, float)):
        f = float(x)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(x, (np.integer, int, np.bool_, bool)):
        return str(int(x))
    if isinstance(x, Decimal):
        return "dec:" + format(x, "f")  # trailing zeros preserved -> never
                                        # equal to a float's repr
    if isinstance(x, pd.Timestamp):
        return x.isoformat()
    if isinstance(x, datetime.datetime):
        return pd.Timestamp(x).isoformat()
    if isinstance(x, datetime.date):
        return pd.Timestamp(x).isoformat()
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
    fails = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")  # pyarrow: decimals
                                                        # stay Decimal
            exp = con.execute(sql).df()                 # decimals -> float64
        except Exception as e:
            print(f"ERR  {name} :: read: {str(e)[:300]}")
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
            try:  # the driver's row sort — dies on ndarray cells, as it must
                cols = list(got.columns)
                got = got.sort_values(cols, kind="mergesort").reset_index(drop=True)
                exp = exp.sort_values(cols, kind="mergesort").reset_index(drop=True)
            except TypeError as e:
                print(f"ERR  {name} :: driver-sort would crash: {str(e)[:160]}")
                fails.append(name)
                continue
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
