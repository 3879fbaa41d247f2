#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Dev tool only (NOT part of the shipped Scala library): after
`sbt "runMain graft.Verify <sfDir> <outDir>"` this compares each
query's parquet dump against its DuckDB oracle on the same testdata,
with exact value equality (stricter than the driver's hash compare).

Usage: python3 tools/verify_local.py [sfDir] [outDir]
"""
import json
import math
import os
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_types(cols, types):
    """Sorted-by-column-name list of (col, duckdb type string)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [(cols[i], str(types[i]).upper()) for i in order]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return [cols[i] for i in order], out


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    with open(os.path.join(OUT_DIR, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(OUT_DIR)
                   if os.path.isdir(os.path.join(OUT_DIR, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        got_rel = con.sql(f"SELECT * FROM read_parquet('{OUT_DIR}/{name}/*.parquet')")
        got_cols = list(got_rel.columns)
        got = got_rel.fetchall()
        if name not in oracles:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            n_noracle += 1
            continue
        try:
            exp_rel = con.sql(oracles[name])
            exp_cols = list(exp_rel.columns)
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {str(e)[:300]}")
            n_fail += 1
            continue
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
        if gc != ec:
            print(f"✗ {name}: COLUMN MISMATCH spark={gc} duck={ec}")
            n_fail += 1
            continue
        # Type-strict gate, settled by the round-17 width probes: the
        # driver hash renders a DECIMAL output as its fixed-scale
        # string on one side of the compare and its shortest float
        # repr on the other, so any trailing-zero value ("0.00" vs
        # "0.0") diverges at EVERY width. The contract is therefore:
        # ANY DECIMAL output column, on either side, is a hard FAIL —
        # recast through its string rendering to DOUBLE in both texts.
        # Other type drift (e.g. INTEGER vs BIGINT from differing
        # literal typing) is surfaced as a warning since the driver's
        # 299 green rows prove those pairings hash-compatible today.
        gt = canon_types(got_cols, got_rel.types)
        et = canon_types(exp_cols, exp_rel.types)
        type_fail = False
        for (c1, t1), (_, t2) in zip(gt, et):
            if "DECIMAL" in t1 or "DECIMAL" in t2:
                print(f"✗ {name}: DECIMAL OUTPUT COLUMN (banned) col={c1} "
                      f"spark={t1} duck={t2}")
                type_fail = True
            elif t1 != t2:
                print(f"! {name}: type warn col={c1} spark={t1} duck={t2}")
        if type_fail:
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"✗ {name}: ROWCOUNT spark={len(gr)} duck={len(er)}")
            n_fail += 1
            continue
        # compare both as-is (ordered) and sorted; report which holds
        ordered_ok = gr == er
        sorted_ok = ordered_ok or sorted(gr, key=repr) == sorted(er, key=repr)
        if ordered_ok:
            print(f"✓ {name}: OK rows={len(gr)}")
            n_pass += 1
        elif sorted_ok:
            print(f"~ {name}: SORTED-ONLY MATCH (row order differs!) rows={len(gr)}")
            n_fail += 1
        else:
            n_fail += 1
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
            print(f"✗ {name}: VALUE MISMATCH rows={len(gr)}")
            for i, a, b in bad:
                print(f"    row {i}:\n      spark={a}\n      duck ={b}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
