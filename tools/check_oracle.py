#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--typed]

Reads each <verifyOutDir>/<name> parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with the sfDir
tables registered as views, then compares: schema (column names sorted),
row count, and exact values (rows sorted by all columns).

Default mode compares STRINGIFIED values — enough to catch numeric
divergence, blind to type divergence. `--typed` additionally compares the
arrow TYPES of every column (after canonicalizing string width variants)
and the values as typed Python objects — this is the mode that models the
driver's typed-hash gate: a DuckDB HUGEINT/DECIMAL(38,0) sum vs a Spark
int64 is a FAIL here even when the digits agree (the round-14
q_event_transitions failure class). Floats compare bit-exact (struct
pack), so a last-bit libm delta is also a FAIL.
"""
import sys, json, glob, os, struct, datetime
import duckdb
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_type(t):
    """Canonicalize arrow types that differ only by storage width.

    Integer WIDTHS canonicalize (Spark length()/size()/row_number() are
    int32 where DuckDB's are int64 — the driver's r14 record shows those
    queries hash-green, so its gate treats widths as equal). INT vs
    DECIMAL does NOT canonicalize: that pair was the driver's actual
    q_event_transitions red (DuckDB HUGEINT window-SUM → decimal128 vs
    Spark int64) and must stay a local FAIL."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"  # ignore tz: Spark writes UTC-adjusted
    return str(t)


def canon_val(v):
    """Typed canonical form: exact for ints/decimals/strings, bit-exact
    for floats, recursive for lists/structs. Datetimes normalize to
    epoch micros (UTC): canon_type ignores tz, so the value compare
    must too — a tz-aware Spark timestamp vs DuckDB's naive one is the
    same instant, and aware == naive is always False in Python."""
    if isinstance(v, float):
        return ("f64", struct.pack("<d", v).hex())
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat(timespec="microseconds"))
    if isinstance(v, list):
        return tuple(canon_val(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, canon_val(x)) for k, x in sorted(v.items()))
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    typed = "--typed" in sys.argv[3:]
    only = [a for a in sys.argv[3:] if not a.startswith("--")]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
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
        if typed:
            bad_t = None
            for c in gcols:
                gt = canon_type(got.schema.field(c).type)
                et = canon_type(exp.schema.field(c).type)
                if gt != et:
                    bad_t = (c, gt, et); break
            if bad_t:
                c, gt, et = bad_t
                print(f"FAIL {name}: TYPE col {c}: spark={gt} duckdb={et}")
                n_fail += 1; continue
        # sort columns by name, rows by all values; compare
        g = got.select(gcols).to_pylist()
        e = exp.select(ecols).to_pylist()
        if typed:
            norm = lambda r: {k: canon_val(v) for k, v in r.items()}
            g = [norm(r) for r in g]; e = [norm(r) for r in e]
        key = lambda r: json.dumps({k: str(v) for k, v in r.items()}, sort_keys=True)
        g.sort(key=key); e.sort(key=key)
        bad = None
        for i, (a, b) in enumerate(zip(g, e)):
            for c in gcols:
                av, bv = a[c], b[c]
                eq = (av == bv) if typed else (str(av) == str(bv))
                if not eq:
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
