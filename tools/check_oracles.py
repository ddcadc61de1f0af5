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
    for name in sorted(oracle):
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
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
