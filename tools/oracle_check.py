#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle_sql.json entry in vanilla DuckDB over the same testdata
parquet, and compares row counts, sorted schemas, and sorted row values.
"""
import sys, json, glob, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    except Exception:
        pass

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result"); fail += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: cols {gcols} vs {ecols}"); fail += 1; continue
    got, exp = got[gcols], exp[ecols]
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fail += 1; continue

    def norm(df):
        rows = []
        for r in df.itertuples(index=False):
            rows.append(tuple(
                round(v, 9) if isinstance(v, float) and not math.isnan(v) else
                ("NaN" if isinstance(v, float) and math.isnan(v) else v) for v in r))
        return sorted(rows, key=lambda t: tuple(str(x) for x in t))

    g, e = norm(got), norm(exp)
    if g != e:
        bad = next((i for i, (a, b) in enumerate(zip(g, e)) if a != b), None)
        print(f"FAIL {name}: value mismatch at sorted row {bad}:\n  spark={g[bad]}\n  duck ={e[bad]}")
        fail += 1
        continue
    print(f"ok   {name} ({len(got)} rows)")
    ok += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
