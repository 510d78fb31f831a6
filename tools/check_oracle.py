#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with the sfDir
tables registered as views, then compares: schema (column names sorted),
row count, and exact values (rows sorted by all columns).
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'").fetch_arrow_table()
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: query error: {str(e)[:300]}"); n_fail += 1; continue
        gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}"); n_fail += 1; continue
        if got.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} != {exp.num_rows}"); n_fail += 1; continue
        # sort columns by name, rows by all values; compare stringified
        g = got.select(gcols).to_pylist()
        e = exp.select(ecols).to_pylist()
        key = lambda r: json.dumps({k: str(v) for k, v in r.items()}, sort_keys=True)
        g.sort(key=key); e.sort(key=key)
        bad = None
        for i, (a, b) in enumerate(zip(g, e)):
            for c in gcols:
                av, bv = a[c], b[c]
                if str(av) != str(bv):
                    bad = (i, c, av, bv); break
            if bad: break
        if bad:
            i, c, av, bv = bad
            print(f"FAIL {name}: row {i} col {c}: spark={av!r} duckdb={bv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({got.num_rows} rows)")
            n_pass += 1
        if got.num_rows == 0:
            print(f"  WARN {name}: zero rows (weak signal)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
