#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<name>/ parquet + oracle_sql.json), then this script runs each
oracle SQL in DuckDB over the same sf dir and compares values cell-by-cell
(columns sorted by name, rows in emitted order).

Usage: python3 tools/local_verify.py <sfDir> <verifyOut> [query ...]
"""
import json, math, sys, glob
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes, skipped = [], [], []
for name in sorted(oracle):
    if only and name not in only:
        continue
    # sorted: multi-part dumps concatenate in part-file name order, which
    # matches the query's global ORDER BY; bare glob order is arbitrary.
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        fails.append((name, "no spark output"))
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        fails.append((name, f"columns differ: spark={gc} oracle={ec}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"rowcount differ: spark={len(got)} oracle={len(exp)}"))
        continue
    got, exp = got[gc], exp[gc]
    bad = None
    for ci, c in enumerate(gc):
        gv, ev = got[c].tolist(), exp[c].tolist()
        for ri, (g, e) in enumerate(zip(gv, ev)):
            eq = (g == e)
            if not eq and isinstance(g, float) and isinstance(e, float):
                eq = (math.isnan(g) and math.isnan(e)) or g == e
            if not eq:
                bad = f"cell [{ri}][{c}]: spark={g!r} oracle={e!r}"
                break
        if bad:
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
if fails:
    print(f"FAIL {len(fails)}:")
    for n, why in fails:
        print(f"  {n}: {why}")
    sys.exit(1)
