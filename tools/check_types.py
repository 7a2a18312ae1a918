#!/usr/bin/env python3
"""Oracle output-type sweep (r4 verdict hash-sensitivity class, automated).

The driver's compare hashes DuckDB values against Spark values; DuckDB
widens some expressions (sum -> HUGEINT, avg of DECIMAL -> DECIMAL) into
types whose textual/hashed form diverges from Spark's BIGINT/DOUBLE even
when the math agrees. Every oracle must therefore emit only types both
engines render identically. This script DESCRIBEs each oracle query over
the sfDir views and reports any column outside the allowed set.

Usage:
  python3 tools/check_types.py [sfDir] [oracle_sql.json]

Exit 0 = clean; exit 1 = violations (one "VIOLATION query column type"
line each). Invoked by OracleTypeSpec so the sweep runs with `sbt test`,
before the driver gate can trip on it.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types Spark and DuckDB render identically through the driver compare.
# TIMESTAMP_NS appears when an oracle passes the events ts through
# untouched (nanos parquet) — the Spark side reads the same column via the
# nanosAsLong conversion, so its micros-truncated rendering matches only
# if the oracle truncates too; oracles that SELECT ts must cast, which is
# why the raw TIMESTAMP_NS is NOT in the allowed set.
ALLOWED = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP",
           "BOOLEAN"}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    oracle_path = Path(sys.argv[2] if len(sys.argv) > 2 else
                       "/tmp/oracle_sql.json")
    oracle = json.loads(oracle_path.read_text())

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    violations = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
        except Exception as e:  # noqa: BLE001 - report and count
            print(f"VIOLATION {name} <describe-failed> {e}")
            violations += 1
            continue
        for col, typ, *_ in desc:
            if typ not in ALLOWED:
                print(f"VIOLATION {name} {col} {typ}")
                violations += 1
    print(f"{len(oracle)} oracles swept, {violations} violations")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
