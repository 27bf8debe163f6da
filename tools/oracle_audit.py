#!/usr/bin/env python3
"""Audit every oracle for the r8 latent-defect classes.

Usage: python3 tools/oracle_audit.py <sfDir> <oracle_sql.json>

The round-8 driver gate failed nine queries whose outputs were
bit-identical under the local DuckDB; the two locally identifiable
defects were (a) an oracle column typed HUGEINT (DuckDB sum(CASE..))
where Spark emits BIGINT, and (b) a final ORDER BY over a nullable
key relying on engine-default NULL placement (Spark NULLS FIRST,
DuckDB NULLS LAST). This script sweeps ALL oracles for those classes
plus the neighboring risks:

  1. HUGEINT / INT128 output columns        → always a defect (cast).
  2. DECIMAL output columns                 → r8 failure class; only
     grandfathered driver-green queries may keep them (allowlist).
  3. final ORDER BY naming a column whose result actually contains
     NULLs, without an explicit NULLS FIRST/LAST                → defect.
  4. multi-row result with NO final ORDER BY → row order undefined;
     the driver hash is order-sensitive (allowlist for queries whose
     order is pinned by construction).

Exit 1 on any non-allowlisted hit. Dev tool only.
"""
import json
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Driver-green DECIMAL outputs (passed the r8 driver hash; kept as the
# control group for the decimal-output failure class).
DECIMAL_OK = {"agg_incremental", "ivm_join", "q3_shipping_priority",
              "q5_local_supplier", "q6_forecast_revenue", "q14_promo",
              "q15_top_supplier", "q19_disjunctive"}


def final_order_by(sql):
    """The trailing ORDER BY clause at paren depth 0, if any.
    Single-quoted literals, double-quoted identifiers and -- comments
    are skipped — a lone '(' or a stray 'order by' inside any of them
    must not unbalance the depth or fake a clause (ADVICE r9)."""
    depth, i, last = 0, 0, None
    low = sql.lower()
    while i < len(low):
        c = low[i]
        if c == "'":
            i += 1
            while i < len(low) and low[i] != "'":
                i += 1
        elif c == '"':
            i += 1
            while i < len(low) and low[i] != '"':
                i += 1
        elif c == "-" and low.startswith("--", i):
            while i < len(low) and low[i] != "\n":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and low.startswith("order by", i):
            last = i
        i += 1
    if last is None:
        return None
    clause = sql[last + len("order by"):]
    return re.split(r"(?i)\blimit\b", clause)[0].strip()


def main(sf_dir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            cur = con.execute(sql)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
            types = {c: t for c, t, *_ in
                     con.execute(f"DESCRIBE ({sql})").fetchall()}
        except Exception as e:
            print(f"[AUDIT-FAIL] {name}: oracle errored: {e}")
            bad += 1
            continue
        problems = []
        for c, t in types.items():
            if "HUGEINT" in t or "INT128" in t:
                problems.append(f"HUGEINT output column '{c}' — cast "
                                "to BIGINT (§4 rule)")
            if "DECIMAL" in t and name not in DECIMAL_OK:
                problems.append(f"DECIMAL output column '{c}' ({t}) — "
                                "r8 driver-hash failure class; present "
                                "as pround-double/BIGINT")
        ob = final_order_by(sql)
        null_cols = {c for i, c in enumerate(cols)
                     if any(r[i] is None for r in rows)}
        if ob:
            for c in null_cols:
                # key may appear as a bare name or positional ordinal;
                # the ordinal must be a standalone token — (?<![\w.])
                # keeps the '1' in an alias like n1 from matching
                # (ADVICE r9)
                pos = str(cols.index(c) + 1)
                hit = re.search(rf"(?i)(\b{re.escape(c)}\b|(?<![\w.]){pos}(?![\w.]))", ob)
                if hit and "nulls" not in ob.lower():
                    problems.append(
                        f"ORDER BY over nullable '{c}' without NULLS "
                        "FIRST/LAST (Spark NULLS FIRST vs DuckDB LAST)")
        elif len(rows) > 1:
            problems.append("multi-row result with no final ORDER BY — "
                            "row order undefined under an "
                            "order-sensitive hash")
        if problems:
            bad += 1
            print(f"[AUDIT] {name}:")
            for p in problems:
                print(f"  {p}")
    print(f"\n{len(oracle) - bad}/{len(oracle)} oracles clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
