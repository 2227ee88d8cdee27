#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB with views named after the parquet tables in <sfDir>,
and compares against the Spark result parquet at <verifyOutDir>/<name>/.
Rows are compared as sorted multisets; floats with tolerance.

Dev tool only — NOT part of the library (the library is pure Scala/Spark).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def approx_eq(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-7, abs_tol=1e-9)
    return False


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
            want_rel = con.sql(sql)
            want_cols = [c.lower() for c in want_rel.columns]
            want = rows_key(want_rel.fetchall(), want_cols)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [c.lower() for c in got_rel.columns]
            got = rows_key(got_rel.fetchall(), got_cols)
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            n_fail += 1
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns differ: oracle={sorted(want_cols)} "
                  f"spark={sorted(got_cols)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: row count differs: oracle={len(want)} "
                  f"spark={len(got)}")
            n_fail += 1
            continue
        bad = None
        for w, g in zip(want, got):
            if len(w) != len(g) or not all(approx_eq(a, b)
                                           for a, b in zip(w, g)):
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
