#!/usr/bin/env python3
"""Produce the round artifacts the judge expects IN GIT (README
checklist rule #3): CORRECTNESS_r{N}.json in the driver's shape from a
completed `graft.Verify` dump, and BENCH_r{N}.json from a bench log.

Usage:
  python3 tools/round_artifacts.py correctness <N> <sfDir> <verifyOutDir>
  python3 tools/round_artifacts.py bench <N> <benchLog> <rc> [cpus] [sf]
  python3 tools/round_artifacts.py verify <N>   # pre-commit round check

Both producing modes REFUSE to run next to a LEAKCHECK.json whose
`round` field isn't N (the r15 stale-artifact regression); `verify`
checks the whole round-N set and is run before committing artifacts.

The correctness comparison is tools/check.py's (same canonicalisation,
same asymmetric pandas/duckdb read paths); the per-query record shape
mirrors the driver's: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err} with `no_oracle` rows for queries that
ship only a rows-only gate. Dev tool only — NOT part of the library.
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import check as checkmod  # reuse canon/rows_key/TABLES

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def art_path(prefix, n):
    """The one filename rule for round-stamped artifacts (ADVICE r16:
    verify() looked for zero-padded names under REPO while the
    producers wrote unpadded names into the CWD — a single-digit round
    or an off-root invocation made verify miss what was just written).
    Producers and verify both resolve through here: REPO-anchored,
    zero-padded to 2 digits (matching every committed artifact,
    BENCH_r01..)."""
    return os.path.join(REPO, f"{prefix}_r{int(n):02d}.json")


def check_leakcheck_round(n):
    """Refuse to stamp round-N artifacts next to a stale LEAKCHECK
    (VERDICT r15 #3: HEAD committed a round-14 LEAKCHECK.json into the
    round-15 artifact set). LEAKCHECK is driver-generated; if its
    `round` field lags, the artifact set is inconsistent and must not
    be committed until the driver refreshes it (or the mismatch is
    consciously overridden with ROUND_ARTIFACTS_ALLOW_STALE=1)."""
    path = os.path.join(REPO, "LEAKCHECK.json")
    if not os.path.exists(path):
        return
    lc_round = json.load(open(path)).get("round")
    if lc_round == int(n):
        return
    msg = (f"LEAKCHECK.json says round {lc_round}, but round-{n} artifacts "
           f"are being produced — a stale LEAKCHECK must not be committed "
           f"into this round's artifact set.")
    if os.environ.get("ROUND_ARTIFACTS_ALLOW_STALE") == "1":
        print(f"WARNING (overridden): {msg}", file=sys.stderr)
        return
    sys.exit(f"REFUSED: {msg} Set ROUND_ARTIFACTS_ALLOW_STALE=1 to override.")


def verify(n):
    """Pre-commit consistency check of the round-N artifact set: every
    round-stamped artifact in the tree must carry round N."""
    n = int(n)
    bad = []
    lc = os.path.join(REPO, "LEAKCHECK.json")
    if os.path.exists(lc):
        r = json.load(open(lc)).get("round")
        if r != n:
            bad.append(f"LEAKCHECK.json round={r} (want {n})")
    bench = art_path("BENCH", n)
    if not os.path.exists(bench):
        bad.append(f"BENCH_r{n:02d}.json missing")
    else:
        r = json.load(open(bench)).get("n")
        if r != n:
            bad.append(f"BENCH_r{n:02d}.json n={r} (want {n})")
    corr = art_path("CORRECTNESS", n)
    if not os.path.exists(corr):
        bad.append(f"CORRECTNESS_r{n:02d}.json missing")
    if bad:
        for b in bad:
            print(f"MISMATCH: {b}", file=sys.stderr)
        return 1
    print(f"round {n} artifact set consistent "
          f"(BENCH, CORRECTNESS, LEAKCHECK round fields)")
    return 0


def correctness(n, sf_dir, out_dir):
    check_leakcheck_round(n)
    con = duckdb.connect()
    for t in checkmod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    res = {}
    for name in names:
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            got_df = pd.concat([pd.read_parquet(f) for f in files],
                               ignore_index=True)
            row["spark_rows"] = len(got_df)
        except Exception as e:
            row["err"] = f"spark output unreadable: {e}"
            res[name] = row
            continue
        if name not in oracle:
            row["err"] = "no_oracle"
            res[name] = row
            continue
        try:
            want_cols, want = checkmod.rows_key(con.sql(oracle[name]).df())
        except Exception as e:
            row["err"] = f"oracle SQL error: {e}"
            res[name] = row
            continue
        got_cols, got = checkmod.rows_key(got_df)
        row["oracle_rows"] = len(want)
        row["rows_match"] = len(want) == len(got)
        row["schema_match"] = want_cols == got_cols
        row["hash_match"] = (row["rows_match"] and row["schema_match"]
                             and want == got)
        res[name] = row
    path = art_path("CORRECTNESS", n)
    json.dump(res, open(path, "w"), indent=1)
    npass = sum(1 for v in res.values() if v["hash_match"])
    nnone = sum(1 for v in res.values() if v["err"] == "no_oracle")
    nfail = len(res) - npass - nnone
    print(f"{path}: {len(res)} queries, {npass} hash-pass, "
          f"{nnone} no_oracle, {nfail} FAIL")
    return 1 if nfail else 0


def bench(n, log_path, rc, cpus, sf):
    check_leakcheck_round(n)
    tail = open(log_path, errors="replace").read()[-2000:]
    out = {"n": int(n), "rc": int(rc), "cpus": int(cpus),
           "sf": float(sf), "tail": tail}
    path = art_path("BENCH", n)
    json.dump(out, open(path, "w"), indent=1)
    print(f"{path}: rc={rc}")
    return 0


def main():
    mode = sys.argv[1]
    if mode == "correctness":
        sys.exit(correctness(int(sys.argv[2]), sys.argv[3], sys.argv[4]))
    elif mode == "bench":
        n, log, rc = sys.argv[2], sys.argv[3], sys.argv[4]
        cpus = sys.argv[5] if len(sys.argv) > 5 else "32"
        sf = sys.argv[6] if len(sys.argv) > 6 else "0.1"
        sys.exit(bench(n, log, rc, cpus, sf))
    elif mode == "verify":
        sys.exit(verify(sys.argv[2]))
    else:
        sys.exit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
