#!/usr/bin/env python3
"""Pandas-mode differential — STRICTER than check.py, mimicking a driver
that fetches DuckDB results via .df() (pandas) before hashing.

Why it exists: DuckDB widens integer SUM (including windowed sums) to
HUGEINT, which pandas renders as float64 — so "5" hashes as "5.0" and
the row mismatches even though fetchall()-based compares (check.py)
see identical values. Round 6's five hash-red queries were exactly
this. Run BOTH checkers; a query must pass both.

Usage: python3 tools/check_pandas.py <sfDir> <verifyOutDir> [names]
"""
import json, sys, hashlib
import duckdb
sf_dir, out_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3].split(",") if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
if names: oracle = {k: v for k, v in oracle.items() if k in names}
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        g = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        e = con.sql(sql).df()
    except Exception as ex:
        print(f"FAIL {name}: {str(ex)[:120]}"); fails += 1; continue
    g = g[sorted(g.columns)]; e = e[sorted(e.columns)]
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: cols"); fails += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}"); fails += 1; continue
    gh = hashlib.md5(g.astype(str).to_csv(index=False).encode()).hexdigest()
    eh = hashlib.md5(e.astype(str).to_csv(index=False).encode()).hexdigest()
    if gh != eh:
        diffcols = [c for c in g.columns if not (g[c].astype(str) == e[c].astype(str)).all()]
        print(f"FAIL {name}: hash; divergent cols {diffcols[:5]}"); fails += 1
    else:
        print(f"OK   {name}: {len(g)} rows")
print(f"{len(oracle)-fails}/{len(oracle)} pass")
