#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage:
  python3 tools/check_oracle.py [sfDir] [outDir] [--tier fast|heavy|all]
                                [--only q_a,q_b] [--budget SECONDS]

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run first
(writes one parquet dir per query + oracle_sql.json). For each query with
oracle SQL: registers the sfDir tables as DuckDB views, runs the oracle,
loads the Spark result, sorts columns by name, and compares values
row-by-row. Reports per-query PASS/FAIL with a diff sample.

Tiers (the scale-gate protocol): the HEAVY set is the oracles whose DuckDB
replay ran >200 s at the 30x ScaleUp leg (ngram 1013 s, truss 1503 s,
minhash ~13 min, canonical ~9 min, simhash, semantic) — a full re-gate at
scale is `--tier fast` (minutes) plus a targeted `--tier heavy` run in the
background, instead of one overnight ad-hoc pass. Default: all. Queries in
the out dir but outside the selected tier are SKIPPED loudly, never
silently counted.
"""
import gc
import json
import math
import os
import re
import sys
import threading
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB replay cost >200 s at the 30x leg (bench/NOTES.md r10 timings).
HEAVY = {"q_dedup_ngram", "q_dedup_ngram_pairs", "q_dedup_minhash",
         "q_dedup_canonical", "q_dedup_simhash", "q_dedup_semantic",
         "q_truss"}


def duck_mem_limit():
    """GRAFT_DUCK_MEM if set, else min(48 GB, 80% of MemAvailable) — a
    hardcoded 48GB on a smaller box never engages before the kernel OOM
    killer, reintroducing the gate-wide kill the limit exists to prevent."""
    env = os.environ.get("GRAFT_DUCK_MEM")
    if env:
        return env
    try:
        txt = Path("/proc/meminfo").read_text()
        kb = int(re.search(r"MemAvailable:\s+(\d+) kB", txt).group(1))
        return f"{min(48, max(1, int(kb * 0.8 / 1048576)))}GB"
    except Exception:
        return "48GB"


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def main():
    argv = list(sys.argv[1:])
    tier = "all"
    if "--tier" in argv:
        i = argv.index("--tier")
        tier = argv[i + 1]
        del argv[i:i + 2]
    assert tier in ("fast", "heavy", "all"), f"bad tier {tier}"
    # --only q_a,q_b: restrict to named queries (for targeted heavy-tier
    # replays at scale, where each oracle is individually hours-class and a
    # query the Spark side declared infeasible must not count as MISSING).
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    # --budget SECONDS: per-oracle wall budget. A replay that exceeds it is
    # interrupted (duckdb con.interrupt() from a watchdog thread) and
    # reported as DEFER — loud and resumable via --only, never a silent
    # hang that eats the whole gate window. 0 (default) = unbounded.
    budget = 0.0
    if "--budget" in argv:
        i = argv.index("--budget")
        budget = float(argv[i + 1])
        del argv[i:i + 2]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out_dir = Path(argv[1] if len(argv) > 1 else "/tmp/verify_out")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    def in_tier(name):
        if only is not None and name not in only:
            return False
        return (tier == "all" or (tier == "heavy") == (name in HEAVY))

    con = duckdb.connect()
    # Bound DuckDB's memory and give it a spill dir: the 30x q_truss replay
    # drove an unbounded process to 97 GB RSS and a kernel OOM kill that
    # took the REST of the gate with it. With a limit, an oversized oracle
    # raises a catchable OutOfMemoryException (reported as ERROR below) or
    # spills and completes — either way the remaining queries still run.
    con.execute(f"SET memory_limit='{duck_mem_limit()}'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = n_skip = n_tier_skip = n_defer = 0
    for name in sorted(oracle):
        if not in_tier(name):
            print(f"SKIP   {name}: outside --tier {tier}")
            n_tier_skip += 1
            continue
        t0 = time.time()
        res_dir = out_dir / name
        if not res_dir.exists():
            print(f"MISSING {name}: no spark result at {res_dir}")
            n_fail += 1
            continue
        # STREAMED compare (r11): both result sets are fetched in bounded
        # chunks on separate cursors instead of two whole-result fetchall()s
        # — a multi-million-row result (q_cdc_chunk at 100x is 2x 3.2M rows
        # plus their normalized tuples) otherwise holds several GB of Python
        # objects per query and, across a six-query 100x gate, drove the
        # process into allocation failure even though each query passes
        # alone. Both sides are already deterministically ordered (every
        # oracle ORDER BYs a unique key; the Spark dump is coalesce(1) of an
        # ordered plan), so chunkwise zip is the same row-by-row compare.
        CHUNK = 262144
        cur_o = con.cursor()
        cur_s = con.cursor()
        timer = None
        budget_hit = {"v": False}
        if budget > 0:
            def _interrupt(c=cur_o, flag=budget_hit):
                flag["v"] = True
                try:
                    c.interrupt()
                except Exception:
                    pass
            timer = threading.Timer(budget, _interrupt)
            timer.start()
        try:
            ro = cur_o.execute(oracle[name])
            ora_cols = [d[0] for d in ro.description]
            rs = cur_s.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
            sp_cols = [d[0] for d in rs.description]

            if sorted(c.lower() for c in ora_cols) != sorted(c.lower() for c in sp_cols):
                print(f"FAIL   {name}: column mismatch spark={sorted(sp_cols)} oracle={sorted(ora_cols)}")
                n_fail += 1
                continue
            o_ix = sorted(range(len(ora_cols)), key=lambda i: ora_cols[i].lower())
            s_ix = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i].lower())

            n_rows = 0
            n_bad = 0
            first_bad = None
            count_mismatch = None
            while True:
                o_chunk = ro.fetchmany(CHUNK)
                s_chunk = rs.fetchmany(CHUNK)
                if len(o_chunk) != len(s_chunk):
                    count_mismatch = (n_rows + len(s_chunk), n_rows + len(o_chunk))
                    break
                if not o_chunk:
                    break
                for orow, srow in zip(o_chunk, s_chunk):
                    a = tuple(norm(srow[i]) for i in s_ix)
                    b = tuple(norm(orow[i]) for i in o_ix)
                    if a != b:
                        n_bad += 1
                        if first_bad is None:
                            first_bad = (n_rows, a, b)
                    n_rows += 1
                del o_chunk, s_chunk
        except Exception as e:
            if budget_hit["v"]:
                print(f"DEFER  {name}: oracle exceeded --budget {budget:.0f}s "
                      f"— rerun with --only {name}", flush=True)
                n_defer += 1
            else:
                print(f"ERROR  {name}: {e}")
                n_fail += 1
            continue
        finally:
            if timer is not None:
                timer.cancel()
            cur_o.close()
            cur_s.close()
            gc.collect()

        if count_mismatch is not None:
            # Chunk-aligned fetches diverged: one side ran out first. The
            # reported counts are lower bounds past the divergence point.
            sp_n, ora_n = count_mismatch
            print(f"FAIL   {name}: rowcount spark>={sp_n} oracle>={ora_n}")
            n_fail += 1
        elif first_bad is not None:
            i, a, b = first_bad
            cols = sorted(sp_cols, key=str.lower)
            print(f"FAIL   {name}: {n_bad}/{n_rows} rows differ; first at {i}")
            for c, x, y in zip(cols, a, b):
                mark = " " if x == y else "*"
                print(f"      {mark} {c}: spark={x} oracle={y}")
            n_fail += 1
        else:
            # elapsed = DuckDB oracle run + compare, so slow-oracle queries
            # are identifiable when gating the big ScaleUp corpora.
            print(f"PASS   {name}: {n_rows} rows ({time.time() - t0:.1f}s)", flush=True)
            n_pass += 1

    # queries without oracle: rows-only presence check (fast-tier work —
    # skipped entirely on a heavy-only run)
    declared = {p.name for p in out_dir.iterdir() if p.is_dir()}
    for name in sorted(declared - set(oracle)):
        if only is not None and name not in only:
            n_tier_skip += 1
            continue
        if tier == "heavy":
            n_tier_skip += 1
            continue
        n = con.execute(f"SELECT count(*) FROM '{out_dir / name}/*.parquet'").fetchone()[0]
        status = "ROWS" if n > 0 else "EMPTY"
        if n == 0:
            n_fail += 1
        else:
            n_skip += 1
        print(f"{status}   {name}: {n} rows (no oracle)")

    extra = f", {n_tier_skip} outside --tier {tier}" if n_tier_skip else ""
    if n_defer:
        extra += f", {n_defer} DEFERRED past --budget {budget:.0f}s"
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only{extra}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
