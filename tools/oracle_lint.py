#!/usr/bin/env python3
"""Lint SparkEntry.oracleSql for the bug classes that have burned rounds:
DuckDB type widenings the driver's hash compare cannot survive.

Usage: python3 tools/oracle_lint.py /root/testdata/sf0.001 /tmp/verify_out

For each oracle_sql.json entry, DESCRIBE the query in vanilla DuckDB over
the testdata views and flag output columns whose DuckDB type differs from
anything Spark can emit byte-identically:

  - HUGEINT / UHUGEINT  (sum over INT/BIGINT widens; pandas renders it as
    float -> hash mismatch even when values agree; this cost q59 a round)
  - DECIMAL(..)         (Spark side is double/long; scale differences and
    decimal rendering break the value hash)
  - FLOAT               (32-bit; Spark emits 64-bit doubles -> 1-ulp noise)

DOUBLE columns are reported as an informational note (not a failure):
they are fine IF both sides round to <=6dp or the values are
exact-representable (the repo convention) -- the lint cannot see the
Spark side, so it only surfaces where to look.

Exit 1 on any hard flag, 0 otherwise. Run after graft.Verify has written
oracle_sql.json (any SF dir works; DESCRIBE never scans rows).
"""
import sys, json
import duckdb

HARD = ("HUGEINT", "UHUGEINT", "DECIMAL", "FLOAT")

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    flags, notes, described = 0, 0, 0
    for name, sql in sorted(oracle.items()):
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FLAG {name}: oracle does not DESCRIBE: {e}")
            flags += 1
            continue
        described += 1
        for col, typ, *_ in cols:
            base = typ.upper()
            if base.startswith(HARD):
                print(f"FLAG {name}.{col}: {typ} — cast to BIGINT/DOUBLE in the "
                      f"oracle (and match the Spark side) or the hash compare "
                      f"will mismatch on rendering")
                flags += 1
            elif base == "DOUBLE":
                print(f"note {name}.{col}: DOUBLE — ok only if both sides "
                      f"round(...,6) or values are exact-representable")
                notes += 1
    print(f"\n{described} oracles described, {flags} flags, {notes} double notes")
    sys.exit(1 if flags else 0)

if __name__ == "__main__":
    main()
