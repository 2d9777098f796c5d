#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
from oracle_sql.json in DuckDB against the sf parquet tables, compare
with the Verify-dumped parquet (column-name-sorted, row-sorted, value
hash). Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, hashlib
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    # sort columns by name, then rows lexicographically by repr
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(round(v, 9))
            else:
                v = repr(v)
            vals.append(v)
        out.append("\x1f".join(vals))
    out.sort()
    h = hashlib.sha256("\n".join(out).encode()).hexdigest()
    return h, [cols[i] for i in order]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        grows, gcols = got.fetchall(), [c[0] for c in got.description]
        if name not in oracle:
            print(f"[rows-only] {name}: {len(grows)} rows")
            continue
        want = con.execute(oracle[name])
        wrows, wcols = want.fetchall(), [c[0] for c in want.description]
        gh, gco = canon(grows, gcols)
        wh, wco = canon(wrows, wcols)
        ok = gh == wh and gco == wco
        status = "OK " if ok else "FAIL"
        print(f"[{status}] {name}: spark {len(grows)}r cols={gco} vs duckdb {len(wrows)}r cols={wco}")
        if not ok:
            failures += 1
            if gco != wco:
                print("   column mismatch")
            else:
                # show first differing canonical rows
                gl = sorted("\x1f".join(map(repr, [r[i] for i in sorted(range(len(gcols)), key=lambda i: gcols[i])])) for r in grows)
                wl = sorted("\x1f".join(map(repr, [r[i] for i in sorted(range(len(wcols)), key=lambda i: wcols[i])])) for r in wrows)
                for a, b in zip(gl, wl):
                    if a != b:
                        print(f"   spark : {a[:200]}")
                        print(f"   duckdb: {b[:200]}")
                        break
                if len(gl) != len(wl):
                    print(f"   row count: spark {len(gl)} vs duckdb {len(wl)}")
    for name in oracle:
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"[MISS] {name}: oracle present but no spark output")
            failures += 1
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
