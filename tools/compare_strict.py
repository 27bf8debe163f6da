#!/usr/bin/env python3
"""Strict (driver-equivalent-or-stronger) correctness gate.

Usage: python3 tools/compare_strict.py <sfDir> <verifyOutDir> [name ...]

Round 8 shipped 9 driver hash_match failures that tools/compare.py
passed — compare.py name-sorts columns, value-sorts rows, and allows
1e-9 float tolerance, all strictly weaker than the driver's hash. This
tool is the opposite: it under-approximates NOTHING the driver is
known to check.

Per query it compares, in RAW row order (the driver hash is
order-sensitive — the r8 join_null_bypass NULLS FIRST/LAST divergence
proved it):

  1. arrow-level column types (would have caught the r8
     quality_expectations HUGEINT/decimal128(38,0) oracle column),
     normalized by what 8 rounds of driver-green queries prove the
     driver tolerates: integer WIDTH differences (int32 vs int64 —
     30+ green queries carry them), timestamp UNIT and tz-flag
     differences (ns vs us, UTC-adjusted vs naive). Type KIND
     differences (decimal vs int/float, the HUGEINT case) still fail.
  2. bit-exact values: floats by IEEE-754 bit pattern (struct.pack),
     decimals by exact value AND scale, everything else by __eq__.
  3. latent-risk flags (reported even when the compare passes):
     DECIMAL or HUGEINT oracle output columns (the r8 failure
     classes), and NULLs appearing in any output column of a query
     whose oracle has a final ORDER BY (NULLS FIRST/LAST divergence
     risk).

Dev tool only — NOT part of the shipped library.
"""
import datetime
import decimal
import json
import math
import os
import struct
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_key(t: pa.DataType):
    """Canonical type KIND — collapses the differences 8 rounds of
    driver-green queries prove the driver tolerates (integer width,
    timestamp unit/tz) while keeping the ones it rejects (decimal vs
    anything, the r8 HUGEINT failure)."""
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return str(t)  # precision/scale kept: the failing class
    return str(t)


def bits(x):
    """Bit pattern of a float — 1 ulp of drift fails, as the driver
    hash would."""
    return struct.pack("<d", x)


def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return bits(a) == bits(b)
    if isinstance(a, float) != isinstance(b, float):
        return False
    # type_key tolerates timestamp tz-FLAG differences, so the value
    # compare must too: an aware vs naive datetime is == False in
    # Python even at the same instant (ADVICE r9) — normalize both to
    # naive UTC before comparing
    if isinstance(a, datetime.datetime) and isinstance(b, datetime.datetime):
        def naive_utc(d):
            if d.tzinfo is None:
                return d
            return d.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return naive_utc(a) == naive_utc(b)
    # Decimal __eq__ ignores scale (1.5 == 1.50) — compare the exponent
    # too, as the docstring promises; schema-level scale already
    # matched when both sides are arrow decimals, so this only bites
    # when a value sneaks in at a different quantum (ADVICE r9)
    if isinstance(a, decimal.Decimal) and isinstance(b, decimal.Decimal):
        return a == b and a.as_tuple().exponent == b.as_tuple().exponent
    return a == b


def compare_one(con, name, sql, spark_dir):
    problems, flags = [], []
    spark_tbl = pq.read_table(spark_dir)
    want = con.execute(sql)
    duck_tbl = want.fetch_arrow_table()

    g_names = sorted(spark_tbl.column_names)
    w_names = sorted(duck_tbl.column_names)
    if g_names != w_names:
        return [f"columns differ: spark={g_names} duck={w_names}"], flags
    # the driver name-sorts columns before hashing, so a raw-ORDER
    # divergence is not a failure — but it is worth surfacing, since
    # it usually means the Spark select and the oracle SELECT drifted
    # (ADVICE r9)
    if spark_tbl.column_names != duck_tbl.column_names:
        flags.append(f"latent: column ORDER differs "
                     f"(spark={spark_tbl.column_names} "
                     f"duck={duck_tbl.column_names}) — driver name-sorts, "
                     "so this passes, but the selects have drifted")

    for c in g_names:
        gt = type_key(spark_tbl.schema.field(c).type)
        wt = type_key(duck_tbl.schema.field(c).type)
        if gt != wt:
            problems.append(f"type[{c}]: spark={gt} duck={wt}")
        wt_raw = str(duck_tbl.schema.field(c).type)
        if wt_raw.startswith("decimal"):
            flags.append(f"latent[{c}]: oracle emits {wt_raw} "
                         "(r8 driver-hash failure class)")

    if spark_tbl.num_rows != duck_tbl.num_rows:
        problems.append(
            f"rows: spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}")
    if problems:
        return problems, flags

    g_rows = [tuple(r[c] for c in g_names) for r in spark_tbl.to_pylist()]
    w_rows = [tuple(r[c] for c in w_names) for r in duck_tbl.to_pylist()]
    has_order = "order by" in sql.lower()
    any_null = any(v is None for t in w_rows for v in t)
    if has_order and any_null:
        flags.append("latent: NULLs in output of an ORDER BY query "
                     "(NULLS FIRST/LAST divergence risk)")
    for i, (a, b) in enumerate(zip(g_rows, w_rows)):
        if not all(cell_eq(x, y) for x, y in zip(a, b)):
            problems.append(
                f"raw-order row {i}:\n    spark={a}\n    duck ={b}")
            break
    return problems, flags


def fresh_con(sf_dir):
    # one connection PER QUERY — cheap hygiene, NOT the fix for the
    # round-13 DuckDB 1.0.0 list_reduce flake: the second incident
    # (cross-ROW contamination in the unigram BACKTRACE fold) happened
    # DESPITE fresh connections, so the corrupted lambda state is
    # process-global, not connection-scoped (see the verify SKILL's
    # flake note). The actual fix was rewriting the unigram DP oracle
    # as recursive CTEs (no list_reduce lambdas on the hot path); the
    # CDC window-hash fold was unrolled to eight plain multiply-adds in
    # round 15 (a fixed 8-wide window needs no fold at all). Residual
    # list_reduce users — text_rolling_hash / sql_functions (unbounded
    # Horner, can't unroll), the BPE apply fold, the PQ sq_dist sum —
    # have never flaked; if one ever reds in a driver run, re-run solo
    # first and apply the recursive-CTE rewrite to THAT oracle.
    # Per-query connections stay because they cost nothing and keep
    # unrelated oracle state (temp views, settings) from leaking.
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main(sf_dir, out_dir, only):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    if only:
        names = [n for n in names if n in only]
    failures = 0
    flagged = 0
    for name in names:
        if name not in oracle:
            n = pq.read_table(f"{out_dir}/{name}").num_rows
            print(f"[rows-only] {name}: {n} rows"
                  f"{'' if n else ' EMPTY!'}")
            failures += 0 if n else 1
            continue
        try:
            problems, flags = compare_one(
                fresh_con(sf_dir), name, oracle[name], f"{out_dir}/{name}")
        except Exception as e:
            problems, flags = [f"exception: {e}"], []
        if problems:
            failures += 1
            print(f"[STRICT-FAIL] {name}")
            for p in problems:
                print(f"  {p}")
        else:
            print(f"[ok] {name}")
        for f in flags:
            flagged += 1
            print(f"  [flag] {name}: {f}")
    print(f"\n{len(names) - failures}/{len(names)} strict-match, "
          f"{flagged} latent flags")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
