#!/usr/bin/env python3
"""Standing validator for the engine's 6dp rounding law
(graft/util/Round6.scala): rz6(x) = sign(x)*floor(|x|*1e6 + 0.5)/1e6
must agree with DuckDB's round(x, 6) on DOUBLE inputs — the oracle
engine's operational convention the whole determinism contract rests on.

Transport matters: values are shipped to DuckDB as PARQUET, never as SQL
literals. A 17-significant-digit literal like `-1.4814224999999999::DOUBLE`
parses as DECIMAL(17,16) first, and that conversion is LOSSY (the int128
mantissa exceeds 2^53), handing DuckDB a neighboring double and
manufacturing fake mismatches (124/35000 in the literal-transport version
of this script; 0 with parquet). Contract oracles never feed such
literals — every compared value is computed in-engine — but any future
hand-written probe must remember this.

Stress population targets the boundary structure that could diverge:
  - random products of 6dp decimals (the class where Spark's own
    shortest-string `round` DOES diverge from rz6/DuckDB:
    4.875 * 0.052972 = 0.2582385 -> Spark round 0.258239,
    rz6 = DuckDB = 0.258238)
  - products engineered to land EXACTLY on ...5e-7 boundaries
  - k*1e-6 +/- 5e-7 synthetic boundary values, both signs
  - snapped-sum quotients (the PCA covariance class)
  - ln/sqrt outputs (the idf/norm class)

Run: python3 tools/round6_check.py   -> expects "0 mismatches", exit 0.
Last validated: 180k values, 0 mismatches (DuckDB v1.0.0).
"""
import math
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def rz6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def main() -> None:
    rng = random.Random(7)
    classes = {}
    classes["product"] = [
        (rng.randrange(-10_000_000, 10_000_000) / 1e6) *
        (rng.randrange(-1_000_000, 1_000_000) / 1e6) for _ in range(50000)]
    classes["exact_half_product"] = [
        0.0005 * ((rng.randrange(1, 2_000_000) * 2 + 1) / 1e3) *
        rng.choice([1, -1]) for _ in range(30000)]
    cb = []
    for _ in range(15000):
        k = rng.randrange(-500_000_000, 500_000_000)
        cb += [k / 1e6 + 5e-7, k / 1e6 - 5e-7]
    classes["synthetic_boundary"] = cb
    classes["quotient"] = [
        rz6(rng.randrange(0, 2_000_000_000) / 1e6) / rng.randrange(2, 1000)
        for _ in range(50000)]
    classes["transcendental"] = [
        -math.log(rng.randrange(1, 1 << 48) / float(1 << 48)) /
        (1 + rng.randrange(0, 100)) for _ in range(20000)]

    con = duckdb.connect()
    total = bad_total = 0
    for name, xs in classes.items():
        pq.write_table(pa.table({"x": pa.array(xs, pa.float64())}),
                       "/tmp/_round6_check.parquet")
        duck = [r[0] for r in con.execute(
            "SELECT round(x, 6) FROM read_parquet('/tmp/_round6_check.parquet')"
        ).fetchall()]
        bad = [(x, rz6(x), d) for x, d in zip(xs, duck) if rz6(x) != d]
        for x, mine, theirs in bad[:3]:
            print(f"MISMATCH [{name}] x={x!r}: rz6={mine!r} duckdb={theirs!r}")
        print(f"{name}: {len(bad)}/{len(xs)} mismatches")
        total += len(xs)
        bad_total += len(bad)
    print(f"{total} values checked, {bad_total} mismatches")
    raise SystemExit(1 if bad_total else 0)


if __name__ == "__main__":
    main()
