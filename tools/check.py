#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB with views named after the parquet tables in <sfDir>,
and compares against the Spark result parquet at <verifyOutDir>/<name>/.

The comparison deliberately mimics the driver's asymmetric read paths:
the Spark result is loaded with pandas.read_parquet (pyarrow types:
DECIMAL -> decimal.Decimal objects, INT32 stays int32) while the oracle
is fetched via duckdb's .df() (DECIMAL/HUGEINT -> float64). Round 1
proved the driver gate is sensitive to exactly this: 10 queries with
bit-identical values failed its hash because one side materialized
Decimal and the other float. Values are compared EXACTLY (string repr of
the canonical kind) — no float tolerance. If this script passes, the
driver should too.

Dev tool only — NOT part of the library (the library is pure Scala/Spark).
"""
import decimal
import glob
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical (kind, repr) for a cell. Int width is normalized
    (int32 == int64: str() of both is the same and the driver matched
    row_number int32 against DuckDB int64 in round 1), but Decimal vs
    float is NOT normalized — that distinction is what the driver's
    hash rejects."""
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return ("null", "")
    if isinstance(v, (bool, np.bool_)):
        return ("bool", str(bool(v)))
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, (int, np.integer)):
        return ("int", str(int(v)))
    if isinstance(v, (float, np.floating)):
        return ("float", repr(float(v)))
    if isinstance(v, (list, np.ndarray)):
        return ("list", repr([canon(x) for x in v]))
    return (type(v).__name__, str(v))


def rows_key(df):
    cols = [c.lower() for c in df.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(canon(row[i]) for i in order))
    out.sort()
    return sorted(cols), out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want_cols, want = rows_key(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            got_df = pd.concat([pd.read_parquet(f) for f in files],
                               ignore_index=True)
            got_cols, got = rows_key(got_df)
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            n_fail += 1
            continue
        if want_cols != got_cols:
            print(f"FAIL {name}: columns differ: oracle={want_cols} "
                  f"spark={got_cols}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: row count differs: oracle={len(want)} "
                  f"spark={len(got)}")
            n_fail += 1
            continue
        bad = None
        for w, g in zip(want, got):
            if w != g:
                bad = (w, g)
                break
        if bad:
            print(f"FAIL {name}: first diff:\n  oracle: {bad[0]}\n"
                  f"  spark:  {bad[1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
