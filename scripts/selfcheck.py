#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing oracle_sql.json on the same parquet tables.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [query ...]
       python3 scripts/selfcheck.py --gate [bench_out.json]

--gate is the ROUND-CLOSE PERFORMANCE ASSERTION: it reads the bench
output's gate_ratio_canary_normalized (this run's BASELINE_QUERIES
total vs the recorded r01 vintage, host-normalized by the JVM canary
pair) and exits nonzero when the 2.0x ceiling is breached or the field
is missing — a regression fails loudly instead of being a JSON field
someone must remember to read.
"""
import sys, json, glob, os

GATE_CEILING = 2.0

def gate(path: str) -> int:
    try:
        bench = json.load(open(path))
    except Exception as e:
        print(f"GATE FAIL: cannot read {path}: {type(e).__name__}: {e}")
        return 1
    ratio = bench.get("gate_ratio_canary_normalized")
    if not isinstance(ratio, (int, float)):
        print(f"GATE FAIL: {path} has no numeric gate_ratio_canary_normalized "
              "(run graft.Bench with BASELINE_QUERIES.txt present)")
        return 1
    n = bench.get("gate_n", 0)
    if not n:
        print(f"GATE FAIL: {path} measured zero baseline queries (gate_n=0)")
        return 1
    if ratio > GATE_CEILING:
        print(f"GATE FAIL: gate_ratio_canary_normalized={ratio:.3f} > "
              f"{GATE_CEILING} over {n} baseline queries "
              f"(raw={bench.get('gate_ratio_raw')}, "
              f"canary_factor={bench.get('gate_canary_factor')})")
        return 1
    print(f"GATE PASS: gate_ratio_canary_normalized={ratio:.3f} <= "
          f"{GATE_CEILING} over {n} baseline queries")
    return 0

if len(sys.argv) > 1 and sys.argv[1] == "--gate":
    sys.exit(gate(sys.argv[2] if len(sys.argv) > 2 else "bench_out.json"))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical value form: everything to string (exact), floats via repr
    def cell(v):
        if v is None or v is pd.NaT:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    out = df.apply(lambda c: c.map(cell))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pq = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}"); n_fail += 1; continue
        if g.equals(e):
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            neq = (g != e).any(axis=1)
            idx = list(g.index[neq])[:3]
            print(f"FAIL {name}: {int(neq.sum())}/{len(g)} rows differ; first diffs:")
            for i in idx:
                for c in g.columns:
                    if g.at[i, c] != e.at[i, c]:
                        print(f"    row {i} col {c}: spark={g.at[i,c]!r} duck={e.at[i,c]!r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
