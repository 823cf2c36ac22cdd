#!/usr/bin/env python3
"""Time repo oracle SQL (or ad-hoc SQL) in DuckDB over a parquet dir —
the BENCH100 cross-engine column. Fresh connection per query, 32
threads, fetchall, best of N (default 2): the r12 protocol.

Usage:
  python3 scripts/duck_time.py <tabledir> q06_agg_tpch_q1 q14_multi_join ...
  python3 scripts/duck_time.py <tabledir> --sql "SELECT ..." [--sql ...]

Oracle SQL comes from /tmp/graft_verify/oracle_sql.json (set
GRAFT_ORACLE_JSON to override). Table views are registered for every
standard table present in <tabledir>.
"""
import glob, json, os, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
REPS = int(os.environ.get("GRAFT_DUCK_REPS", "2"))


def connect(tabledir):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = f"{tabledir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table = a directory of parts
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def main():
    tabledir = sys.argv[1]
    args = sys.argv[2:]
    oracle_path = os.environ.get("GRAFT_ORACLE_JSON",
                                 "/tmp/graft_verify/oracle_sql.json")
    oracles = {}
    if os.path.exists(oracle_path):
        with open(oracle_path) as f:
            oracles = json.load(f)
    jobs = []
    i = 0
    while i < len(args):
        if args[i] == "--sql":
            jobs.append((f"sql{len(jobs)}", args[i + 1])); i += 2
        else:
            if args[i] not in oracles:
                sys.exit(f"unknown query '{args[i]}' in {oracle_path}; "
                         f"available: {', '.join(sorted(oracles)) or '(none)'}")
            jobs.append((args[i], oracles[args[i]])); i += 1
    if REPS < 1:
        sys.exit(f"GRAFT_DUCK_REPS must be >= 1 (got {REPS})")
    out = {}
    for name, sql in jobs:
        best = None
        for _ in range(REPS):
            con = connect(tabledir)  # fresh connection: cold catalog
            t0 = time.time()
            rows = con.execute(sql).fetchall()
            sec = time.time() - t0
            con.close()
            best = sec if best is None else min(best, sec)
        out[name] = round(best, 3)
        print(f"[duck] {name} best={best:.3f}s rows={len(rows)}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
