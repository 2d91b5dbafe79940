#!/usr/bin/env python3
"""Local differential checker mirroring the driver's t2 gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB on the same fixture tables and reports per-query row/schema/value
match. Dev-only tool; not part of the shipped library.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [name1,name2,...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip through repr to catch any drift
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(str(norm(x)) for x in v) + "]"
    return str(v)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            failures += 1
            continue
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            failures += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            failures += 1
            continue
        # compare column-name-sorted values, row order as produced
        gidx = [got.columns.index(c) for c in got_cols]
        eidx = [exp.columns.index(c) for c in exp_cols]
        bad = None
        for i, (gr, er) in enumerate(zip(got_rows, exp_rows)):
            g = tuple(norm(gr[j]) for j in gidx)
            e = tuple(norm(er[j]) for j in eidx)
            if g != e:
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: row {i}:\n  spark={g}\n  duck ={e}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got_rows)} rows")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    names = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], names))
