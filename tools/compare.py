#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB with the sfDir
tables registered as views, sorts columns by name and rows by all
columns, and compares values (exact for non-floats, 1e-9 rel for
floats). Dev tool only — NOT part of the shipped library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        g_cols = [d[0] for d in got.description]
        g_rows = got.fetchall()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(g_rows)} rows "
                  f"{'OK' if len(g_rows) > 0 else 'EMPTY!'}")
            if not g_rows:
                failures += 1
            continue
        try:
            want = con.execute(oracle[name])
            w_cols = [d[0] for d in want.description]
            w_rows = want.fetchall()
        except Exception as e:
            print(f"[FAIL-oracle-sql] {name}: {e}")
            failures += 1
            continue
        gc, gr = canon(g_rows, g_cols)
        wc, wr = canon(w_rows, w_cols)
        if gc != wc:
            print(f"[FAIL-schema] {name}: spark={gc} duck={wc}")
            failures += 1
            continue
        if len(gr) != len(wr):
            print(f"[FAIL-rows] {name}: spark={len(gr)} duck={len(wr)}")
            failures += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, wr)):
            if not all(eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"[FAIL-values] {name} row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            failures += 1
        else:
            print(f"[OK] {name}: {len(gr)} rows")
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
