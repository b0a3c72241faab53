#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB against the testdata parquet and diff it against the engine's
Verify output parquet (columns sorted by name, rows sorted, exact values).

Usage: compare.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(
            round(v, 9) if isinstance(v, float) else v for v in r))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
            want = want[sorted(want.columns)]
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            got = got[sorted(got.columns)]
            if list(want.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(want.columns)}")
                bad += 1
                continue
            wt, gt = [str(t) for t in want.dtypes], [str(t) for t in got.dtypes]
            if wt != gt:
                print(f"WARN {name}: dtypes engine={gt} oracle={wt}")
            w, g = norm(want.itertuples(index=False, name=None)), \
                   norm(got.itertuples(index=False, name=None))
            if len(w) != len(g):
                print(f"FAIL {name}: rows {len(g)} vs oracle {len(w)}")
                bad += 1
            elif w != g:
                diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
                print(f"FAIL {name}: values differ, e.g. got/want {diffs}")
                bad += 1
            else:
                print(f"ok   {name}: {len(g)} rows")
                ok += 1
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
            bad += 1
    print(f"\n{ok} ok, {bad} failing")
    sys.exit(1 if bad else 0)

main()
