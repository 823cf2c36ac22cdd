#!/usr/bin/env python3
"""Execute the SQL the graft dialects GENERATE against a live engine.

`graft.sources.jdbc.DialectDump` renders DDL for the full type breadth,
every upsert mode, limit/offset composition, and the unparser's WHERE
clauses; this script runs the duckdb/postgres dialect output in an
in-memory DuckDB and the sqlite dialect output in REAL sqlite3 (python
stdlib), and checks SEMANTICS, not just acceptance: conflict modes must
leave the table in the state the writer assumes, offsets must skip,
LIKE escapes must not wildcard, EXTRACT/MOD/CAST must select exactly
the expected rows. The reference validates its dialects against live
Docker databases the same way (core/tests/docker/mod.rs:53-100).
Running sqlite SQL in actual sqlite (not DuckDB acceptance-mode) is
what caught the typed-literal bug: `DATE '…'` is a parse error there.

Usage: python3 scripts/dialect_live_check.py [dump.json]
       (no arg: runs sbt runMain graft.sources.jdbc.DialectDump itself)
"""
import datetime
import json
import sqlite3
import subprocess
import sys

import duckdb

if len(sys.argv) > 1:
    dump = json.load(open(sys.argv[1]))
else:
    out = subprocess.run(
        ["sbt", "runMain graft.sources.jdbc.DialectDump"],
        capture_output=True, text=True, cwd="/root/repo").stdout
    line = next(l for l in out.splitlines() if l.startswith("[info] {"))
    dump = json.loads(line[len("[info] "):])

# seed rows: k 1..8 — b, i, d, dec, s, dt, ts, bin derived
def row(k):
    return (
        k, k % 2 == 0, k % 4, k / 2.0, round(k * 1.11, 2), f"v_{k}",
        datetime.date(1994 + (k % 3), 1 + k % 12, 1 + k % 27),
        datetime.datetime(1994 + (k % 3), 1 + k % 12, 1 + k % 27, 12, 0, 0),
        bytes([k % 256, (255 - k) % 256]), [k, k * 3])

SEED = [row(k) for k in range(1, 9)]

# expected WHERE-sample counts, computed over SEED in python
def year(d): return d.year
EXPECT = {
    "eq_long": sum(1 for r in SEED if r[0] == 5),
    "in_int": sum(1 for r in SEED if r[2] in (1, 3)),
    "like_escaped": sum(1 for r in SEED if "x%y" in r[5]),
    "starts_with": sum(1 for r in SEED if r[5].startswith("v_")),
    "mod_routed": sum(1 for r in SEED if r[0] % 3 == 1),
    "extract_year": sum(1 for r in SEED if year(r[6]) == 1995),
    "cast_double_gt": sum(1 for r in SEED if float(r[4]) > 3.5),
    "arith_case": sum(1 for r in SEED if r[0] + 1 > 5),
    "upper_concat": sum(1 for r in SEED if (r[5] + "!").upper() == "V_2!"),
    "substring": sum(1 for r in SEED if r[5][0:2] == "v_"),
    "coalesce_abs": sum(1 for r in SEED if abs(r[0] - 9) == 1),
    "date_literal": sum(1 for r in SEED if r[6] >= datetime.date(1995, 1, 1)),
    "ts_literal": sum(1 for r in SEED if r[7] < datetime.datetime(1996, 1, 1)),
}

fails = 0


def check(label, cond, detail=""):
    global fails
    if cond:
        print(f"OK   {label}")
    else:
        fails += 1
        print(f"FAIL {label}: {detail}")


def sqlite_row(r):
    # sqlite stores dates/timestamps as TEXT (ISO-8601), booleans and
    # decimals through INTEGER/REAL affinity — bind what the writer's
    # setters would send over that wire.
    base = (r[0], int(r[1]), r[2], r[3], float(r[4]), r[5],
            r[6].isoformat(), r[7].strftime("%Y-%m-%d %H:%M:%S"), r[8])
    return base + ((json.dumps(r[9]),) if len(r) > 9 else ())


for dialect in ["duckdb", "postgres", "sqlite"]:
    d = dump[dialect]
    # duckdb/postgres run in live DuckDB; the sqlite dialect runs in
    # REAL sqlite3 — full WHERE/conflict/offset semantics on all three.
    if dialect == "sqlite":
        con = sqlite3.connect(":memory:")
        seed_rows = [sqlite_row(r) for r in SEED]
        bind = sqlite_row
    else:
        con = duckdb.connect()
        seed_rows = SEED
        bind = lambda r: r
    try:
        con.execute(d["create"])
        for r in seed_rows:
            con.execute(d["insert"], list(r))

        def state():
            return {r[0]: r for r in con.execute(
                f'SELECT * FROM {d["table"]} ORDER BY 1').fetchall()}

        # WHERE-clause semantics over the PRISTINE seed (before mutations)
        for label, sql in d["where"].items():
            if sql is None:
                check(f"{dialect}: where[{label}] rendered", False,
                      "unparser returned None")
                continue
            got = con.execute(sql).fetchall()[0][0]
            check(f"{dialect}: where[{label}] == {EXPECT[label]}",
                  got == EXPECT[label], f"got {got}: {sql}")

        # native-array (duckdb/postgres) or JSON-TEXT (sqlite) round-trip
        st0 = state()
        want = [5, 15] if dialect != "sqlite" else json.dumps([5, 15])
        check(f"{dialect}: array column round-trips", st0[5][9] == want,
              repr(st0[5][9]))

        # conflict update: same keys, shifted payload -> payload replaced
        shifted = [
            (r[0], not r[1], r[2] + 10, r[3], r[4], r[5] + "_u", r[6], r[7], r[8])
            for r in SEED[:4]]
        for r in shifted:
            con.execute(d["upsert_update"], list(bind(r)))
        st = state()
        check(f"{dialect}: upsert update replaces payload",
              all(st[r[0]][5] == r[5] and st[r[0]][2] == r[2] for r in shifted)
              and len(st) == len(SEED), str(st.get(1)))

        # conflict do-nothing: clobbering payloads must NOT land; new key inserts
        for r in [(r[0], r[1], r[2], r[3], r[4], "CLOB", r[6], r[7], r[8])
                  for r in SEED[:2]] + [row(100)[:9]]:
            con.execute(d["upsert_nothing"], list(bind(r)))
        st = state()
        check(f"{dialect}: upsert do_nothing preserves + inserts new",
              st[1][5] != "CLOB" and st[2][5] != "CLOB" and 100 in st, str(st.get(1)))

        # target-less do-nothing (PK constraint decides)
        con.execute(d["upsert_all"], list(bind((1, True, 0, 0.0, 0.0, "CLOB2",
                                                SEED[0][6], SEED[0][7], b""))))
        con.execute(d["upsert_all"], list(bind(row(101)[:9])))
        st = state()
        check(f"{dialect}: upsert do_nothing_all skips conflicts",
              st[1][5] != "CLOB2" and 101 in st, str(st.get(1)))

        # topn + offset: k DESC skip 2 take 3 over k in {1..8,100,101}
        got = [r[0] for r in con.execute(d["topn"]).fetchall()]
        check(f"{dialect}: ORDER BY + offset/fetch composition",
              got == [8, 7, 6], str(got))

        if d.get("analyze"):
            con.execute(d["analyze"]) if dialect == "duckdb" else None
            if dialect == "duckdb":
                check(f"{dialect}: ANALYZE accepted", True)
    except Exception as e:
        check(f"{dialect}: execution", False, repr(e))
    finally:
        con.close()

# session-settings registry: the rendered SET statements must be accepted
# by a live engine and observably change its configuration
con = duckdb.connect()
try:
    for stmt in dump.get("settings", []):
        con.execute(stmt)
    mem = con.execute("SELECT current_setting('memory_limit')").fetchone()[0]
    check("settings: memory_limit applied", "Gi" in mem or "GB" in mem, mem)
    tmp = con.execute("SELECT current_setting('temp_directory')").fetchone()[0]
    check("settings: temp_directory applied", tmp == "/tmp/graft_dlc_tmp", tmp)
    pio = con.execute("SELECT current_setting('preserve_insertion_order')").fetchone()[0]
    check("settings: preserve_insertion_order applied", pio is False or pio == "false", repr(pio))
except Exception as e:
    check("settings: execution", False, repr(e))
finally:
    con.close()

print(("PASS" if fails == 0 else "FAIL") + f" dialect live check ({fails} failures)")
sys.exit(1 if fails else 0)
