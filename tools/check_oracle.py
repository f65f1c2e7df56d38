#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness leg: run graft.Verify output
against DuckDB oracles on the same parquet tables and diff values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, int):
        return float(v) if False else v
    return str(v)


def norm_table(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort(key=lambda t: tuple(("" if x is None else str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob
    produced = sorted(
        p.rstrip("/").split("/")[-1] for p in glob.glob(f"{out_dir}/*/"))
    for name in produced:
        got_rel = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_cols = [d[0] for d in got_rel.description]
        got_rows = got_rel.fetchall()
        if name not in oracle:
            status = "ROWS_ONLY" + ("(EMPTY!)" if len(got_rows) == 0 else "")
            print(f"  {name:28s} {status} rows={len(got_rows)}")
            continue
        try:
            exp_rel = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp_rel.description]
            exp_rows = exp_rel.fetchall()
        except Exception as e:
            print(f"✗ {name:28s} ORACLE_SQL_ERROR: {e}")
            n_fail += 1
            continue
        gc, gr = norm_table(got_cols, got_rows)
        ec, er = norm_table(exp_cols, exp_rows)
        if gc != ec:
            print(f"✗ {name:28s} SCHEMA got={gc} exp={ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"✗ {name:28s} VALUES rows got={len(gr)} exp={len(er)} "
                  f"first_diffs={diffs}")
        else:
            n_pass += 1
            print(f"✓ {name:28s} rows={len(gr)}")
    missing = sorted(set(oracle) - set(produced))
    for name in missing:
        print(f"✗ {name:28s} NO_SPARK_OUTPUT")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(produced) - n_pass - n_fail + len(missing)} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
