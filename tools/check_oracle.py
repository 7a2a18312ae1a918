#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage:
  python3 tools/check_oracle.py [sfDir] [outDir]

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run first
(writes one parquet dir per query + oracle_sql.json). For each query with
oracle SQL: registers the sfDir tables as DuckDB views, runs the oracle,
loads the Spark result, sorts columns by name, and compares values
row-by-row. Reports per-query PASS/FAIL with a diff sample.
"""
import json
import math
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    con = duckdb.connect()
    # Bound DuckDB's memory and give it a spill dir: the 30x q_truss replay
    # drove an unbounded process to 97 GB RSS and a kernel OOM kill that
    # took the REST of the gate with it. With a limit, an oversized oracle
    # raises a catchable OutOfMemoryException (reported as ERROR below) or
    # spills and completes — either way the remaining queries still run.
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        t0 = time.time()
        res_dir = out_dir / name
        if not res_dir.exists():
            print(f"MISSING {name}: no spark result at {res_dir}")
            n_fail += 1
            continue
        try:
            ora = con.execute(oracle[name])
            ora_cols = [d[0] for d in ora.description]
            ora_rows = ora.fetchall()
            spark_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            sp_cols = list(spark_rel.columns)
            sp_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"ERROR  {name}: {e}")
            n_fail += 1
            continue

        if sorted(c.lower() for c in ora_cols) != sorted(c.lower() for c in sp_cols):
            print(f"FAIL   {name}: column mismatch spark={sorted(sp_cols)} oracle={sorted(ora_cols)}")
            n_fail += 1
            continue
        o_ix = sorted(range(len(ora_cols)), key=lambda i: ora_cols[i].lower())
        s_ix = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i].lower())
        o_vals = [tuple(norm(r[i]) for i in o_ix) for r in ora_rows]
        s_vals = [tuple(norm(r[i]) for i in s_ix) for r in sp_rows]
        if len(o_vals) != len(s_vals):
            print(f"FAIL   {name}: rowcount spark={len(s_vals)} oracle={len(o_vals)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_vals, o_vals)) if a != b]
        if bad:
            i, a, b = bad[0]
            cols = sorted(sp_cols, key=str.lower)
            print(f"FAIL   {name}: {len(bad)}/{len(s_vals)} rows differ; first at {i}")
            for c, x, y in zip(cols, a, b):
                mark = " " if x == y else "*"
                print(f"      {mark} {c}: spark={x} oracle={y}")
            n_fail += 1
        else:
            # elapsed = DuckDB oracle run + compare, so slow-oracle queries
            # are identifiable when gating the big ScaleUp corpora.
            print(f"PASS   {name}: {len(s_vals)} rows ({time.time() - t0:.1f}s)", flush=True)
            n_pass += 1

    # queries without oracle: rows-only presence check
    declared = {p.name for p in out_dir.iterdir() if p.is_dir()}
    for name in sorted(declared - set(oracle)):
        n = con.execute(f"SELECT count(*) FROM '{out_dir / name}/*.parquet'").fetchone()[0]
        status = "ROWS" if n > 0 else "EMPTY"
        if n == 0:
            n_fail += 1
        else:
            n_skip += 1
        print(f"{status}   {name}: {n} rows (no oracle)")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
