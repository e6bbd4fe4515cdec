#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
library itself is pure Scala/Spark).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
fixture parquet tables, loads the Spark result parquet, sorts columns by
name, and compares values both order-sensitively and order-insensitively.
"""
import json, sys, glob, os, time
import duckdb
import pandas as pd

# Oracle wall-time alarm: round 9's gate silently recorded ZERO results
# because four oracles took 4-5 min EACH in DuckDB (unfenced CTE chains)
# and the driver's budget ran out. Flag anything slow enough to threaten
# the budget so the regression is visible the day it is introduced.
# 30 s: the one legitimately heavy oracle (x44 — ten materialized
# variant chains) runs 10-16 s depending on load; the failure mode this
# alarm exists for is the 100-seconds class.
SLOW_ORACLE_SECS = 30.0
# HARD budget tripwires — the r9 failure class made a FAILURE, not a
# flag: one oracle in the 100-seconds class, or a full pass beyond five
# minutes, exits non-zero so the regression cannot land quietly. The
# 30 s flag above stays as the early warning.
HARD_ORACLE_SECS = 100.0
HARD_TOTAL_SECS = 300.0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.decode() if isinstance(v, bytes) else v)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    no_oracle = []
    slow_names = []
    hard_names = []
    total_secs = 0.0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if name not in oracle:
            no_oracle.append(name)
            continue
        # the budgeted clock times the DUCKDB EXECUTION only: the
        # pandas parquet loads and the frame compare are this replica's
        # own overhead (the driver loads Spark results separately), and
        # counting them made a green run on a slow/loaded VM hard-fail
        # with no real oracle regression (r13 note: VM-to-VM drift)
        # secs initialized BEFORE the try so a failure raised after the
        # DuckDB query already ran (e.g. inside compare) keeps the
        # measured execution time: a slow oracle must not escape the
        # budget total or the SLOW ORACLE warning just because its
        # comparison errored
        secs = 0.0
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))], ignore_index=True))
            t0 = time.time()
            want = norm(con.sql(oracle[name]).df())
            secs = time.time() - t0
            status, detail = compare(got, want)
        except Exception as e:
            status, detail = "ERROR", str(e)[:300]
        total_secs += secs
        slow = f"  [SLOW ORACLE {secs:.1f}s - gate budget risk]" if secs > SLOW_ORACLE_SECS else ""
        if slow:
            slow_names.append((name, round(secs, 1)))
        if secs > HARD_ORACLE_SECS:
            hard_names.append((name, round(secs, 1)))
        if status == "OK":
            n_pass += 1
            print(f"  OK    {name} ({detail}, {secs:.1f}s){slow}")
        else:
            n_fail += 1
            print(f"  {status}  {name}: {detail}{slow}")
    print(f"\n{n_pass} pass, {n_fail} fail; rows-only (no oracle): {no_oracle}")
    if slow_names:
        print(f"SLOW ORACLES (> {SLOW_ORACLE_SECS:.0f}s, budget risk): {slow_names}")
    budget_fail = False
    if hard_names:
        print(f"HARD FAIL: oracle(s) over {HARD_ORACLE_SECS:.0f}s: {hard_names}")
        budget_fail = True
    if total_secs > HARD_TOTAL_SECS:
        print(f"HARD FAIL: full oracle pass {total_secs:.1f}s exceeds "
              f"{HARD_TOTAL_SECS:.0f}s budget")
        budget_fail = True
    return 1 if (n_fail or budget_fail) else 0

def compare(got, want):
    if list(got.columns) != list(want.columns):
        return "FAIL", f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"
    if len(got) != len(want):
        return "FAIL", f"row count differs: spark={len(got)} oracle={len(want)}"
    # dtype-tolerant value compare
    g = got.astype(str).reset_index(drop=True)
    w = want.astype(str).reset_index(drop=True)
    ordered = g.equals(w)
    gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    ws = w.sort_values(by=list(w.columns)).reset_index(drop=True)
    unordered = gs.equals(ws)
    if ordered:
        return "OK", f"{len(got)} rows, ordered"
    if unordered:
        return "WARN-ORDER", f"{len(got)} rows match only after row sort"
    diff = (gs != ws).any(axis=1)
    i = diff.idxmax()
    return "FAIL", f"values differ at sorted-row {i}: spark={gs.loc[i].to_dict()} oracle={ws.loc[i].to_dict()}"

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
