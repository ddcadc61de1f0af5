#!/usr/bin/env python3
"""Dev-time replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against
views named after the parquet tables in <sfDir>, and compares against
the Spark parquet dump in <verifyOutDir>/<name>/. Columns are compared
sorted by name; values exactly (floats must be bit-identical — the
Exact.scala portability contract guarantees that).
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # board contract: every dumped query has a twin and vice versa —
    # an ungated query is a failure here, not a driver discovery
    import os
    dumped = {d for d in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, d))}
    if dumped and dumped != set(oracle):
        only_dump = sorted(dumped - set(oracle))
        only_sql = sorted(set(oracle) - dumped)
        if only_dump:
            print(f"FAIL board: queries without a twin: {only_dump}")
            n_fail += len(only_dump)
        if only_sql:
            print(f"NOTE board: {len(only_sql)} twins with no dump here "
                  f"(partial dev run) — checking dumped queries only")
    for name in sorted(set(oracle) & dumped if dumped else set(oracle)):
        sql = oracle[name]
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ: oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        # the driver's hash is TYPE-sensitive for decimal-vs-integer
        # (round-13 q57: values bit-identical, hash red on int64 vs
        # decimal128) while tolerating int-width and decimal-vs-float
        # differences (q39/q41/t93 green for rounds) — FAIL the known
        # red class, WARN the rest so drift stays visible
        def fam(t):
            t = str(t)
            if t.startswith("decimal"): return "decimal"
            if t.startswith(("int", "uint")): return "int"
            if t in ("float", "double", "halffloat"): return "float"
            return t
        tdif = [(c, str(want.schema.field(c).type), str(got.schema.field(c).type))
                for c in wcols
                if str(want.schema.field(c).type) != str(got.schema.field(c).type)]
        tbad = [d for d in tdif if {fam(d[1]), fam(d[2])} == {"decimal", "int"}]
        if tbad:
            print(f"FAIL {name}: decimal-vs-integer type mismatch (the "
                  f"driver-hash-red class): {tbad}")
            n_fail += 1
            continue
        if tdif:
            print(f"WARN {name}: arrow types differ (driver-tolerated "
                  f"class): {tdif}")
        if want.num_rows != got.num_rows:
            print(f"FAIL {name}: rows differ: oracle={want.num_rows} spark={got.num_rows}")
            n_fail += 1
            continue
        wd = {c: want.column(c).to_pylist() for c in wcols}
        gd = {c: got.column(c).to_pylist() for c in gcols}
        bad = []
        for c in wcols:
            for i, (a, b) in enumerate(zip(wd[c], gd[c])):
                if isinstance(a, float) and isinstance(b, float):
                    ok = (a == b) or (math.isnan(a) and math.isnan(b))
                else:
                    ok = a == b
                if not ok:
                    bad.append((c, i, a, b))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: value mismatches: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({want.num_rows} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    # board-size vs STATUS.md declared count (the round-13/14
    # compounding-debt class: STATUS said 264 when the board was 266)
    try:
        import re
        status = open("/root/repo/STATUS.md").read()
        m = re.search(r"board = (\d+) gated queries", status)
        declared = int(m.group(1)) if m else None
        print(f"board size: {len(oracle)} twins; STATUS.md declares: {declared}")
        if declared is not None and declared != len(oracle):
            print(f"WARN STATUS.md is stale: declares {declared}, "
                  f"board has {len(oracle)}")
    except OSError:
        pass
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
