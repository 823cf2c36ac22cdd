#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare values (sorted rows, sorted columns).

Usage: python3 scripts/local_verify.py [sfdir] [outdir] [query ...]
"""
import json, math, subprocess, sys
import datetime, decimal

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
ONLY = set(sys.argv[3:])

import duckdb
import pyarrow.parquet as pq
import glob, os

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

with open(f"{OUT}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(v):
    """Type-tagged canonical form. The driver's hash is type-aware: DuckDB
    HUGEINT (windowed SUM of BIGINT) arrives via Arrow as decimal128 and
    must NOT compare equal to Spark's int64 even when the value matches."""
    if v is None: return "null"
    if isinstance(v, bool): return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v): return "float:NaN"
        return f"float:{repr(v)}"
    if isinstance(v, int): return f"int:{v}"
    if isinstance(v, decimal.Decimal): return f"dec:{v}"
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date): return f"date:{v.isoformat()}"
    if isinstance(v, (list, tuple)): return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes): return f"bin:{v.hex()}"
    return f"{type(v).__name__}:{v}"

def table_key(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    keyed = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return keyed

fails = 0
for name in sorted(oracles):
    if ONLY and name not in ONLY: continue
    sql = oracles[name]
    pdir = f"{OUT}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        tbl = pq.read_table(pdir)
    except Exception as e:
        print(f"FAIL {name}: read spark output: {e}"); fails += 1; continue
    if "_graft_error" in tbl.column_names:
        print(f"FAIL {name}: spark error: {tbl.column('_graft_error')[0].as_py()}")
        fails += 1; continue
    try:
        # .arrow() (not fetchall) so DuckDB types surface exactly as the
        # driver's Arrow-based compare sees them (HUGEINT -> decimal128).
        otbl = con.execute(sql).arrow()
        ocols = otbl.column_names
        orows = [tuple(col[i].as_py() for col in otbl.columns)
                 for i in range(otbl.num_rows)]
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); fails += 1; continue
    scols = tbl.column_names
    srows = [tuple(col[i].as_py() for col in tbl.columns) for i in range(tbl.num_rows)]
    if sorted(scols) != sorted(ocols):
        print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
        fails += 1; continue
    sk, ok = table_key(srows, scols), table_key(orows, ocols)
    if len(sk) != len(ok):
        print(f"FAIL {name}: rows spark={len(sk)} oracle={len(ok)}"); fails += 1; continue
    if sk != ok:
        bad = next(i for i in range(len(sk)) if sk[i] != ok[i])
        print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
        print(f"  spark : {sk[bad]}")
        print(f"  oracle: {ok[bad]}")
        print(f"  spark schema : {tbl.schema}".replace(chr(10), " "))
        print(f"  oracle schema: {otbl.schema}".replace(chr(10), " "))
        fails += 1; continue
    print(f"OK   {name}: {len(sk)} rows")

# rows-only queries (no oracle): just check output exists and has rows
for pdir in sorted(glob.glob(f"{OUT}/*/")):
    name = os.path.basename(pdir.rstrip("/"))
    if name in oracles or (ONLY and name not in ONLY): continue
    try:
        t = pq.read_table(pdir)
        if "_graft_error" in t.column_names:
            print(f"FAIL {name}: spark error: {t.column('_graft_error')[0].as_py()}")
            fails += 1; continue
        n = t.num_rows
        print(f"OK?  {name}: {n} rows (no oracle)" if n > 0 else f"FAIL {name}: 0 rows")
        if n == 0: fails += 1
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1

sys.exit(1 if fails else 0)
