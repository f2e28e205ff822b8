#!/usr/bin/env python3
"""Dev-only mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, sorts
columns by name and rows by value, and diffs exactly (floats exact, with a
near-miss report to guide tolerance decisions).
"""
import duckdb, glob, json, math, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def key(row):
    return [(v is None, str(v)) for v in row]


def load_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = [tuple(canon(data[i][r]) for i in range(len(cols)))
            for r in range(tbl.num_rows)]
    return cols, sorted(rows, key=key)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_tbl = duckdb.connect().execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            exp_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, gr = load_rows(got_tbl)
        ec, er = load_rows(exp_tbl)
        if gc != ec:
            print(f"FAIL {name}: columns spark={gc} oracle={ec}")
            n_fail += 1
            continue
        if gr == er:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
            continue
        n_fail += 1
        print(f"FAIL {name}: rows spark={len(gr)} oracle={len(er)}")
        shown = 0
        for i in range(max(len(gr), len(er))):
            a = gr[i] if i < len(gr) else None
            b = er[i] if i < len(er) else None
            if a != b and shown < 5:
                print(f"  row {i} spark={a}")
                print(f"  row {i} oracl={b}")
                shown += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
