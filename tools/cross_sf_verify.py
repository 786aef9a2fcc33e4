#!/usr/bin/env python3
"""Cross-SF oracle evidence: run the local_verify compare at extra scale
factors and write the committed artifact (CORRECTNESS_SF01_r{N}.json).

The driver's gate runs sf0.01 only; the SF-sensitive contracts (bloom fp
bounds, bucket caps, broadcast thresholds) deserve committed evidence at
a second and third scale each round.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/x001"
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1   /tmp/x01"
  python3 tools/cross_sf_verify.py <round> \
      /root/testdata/sf0.001:/tmp/x001 /root/testdata/sf0.1:/tmp/x01

Exit 0 iff every query hash-matches at every SF.
"""
import json, glob, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    per = {}
    for name in sorted(oracle):
        # sorted: part-file names (part-00000, part-00001, ...) sort
        # lexicographically in write order, so the concatenation preserves
        # the query's global ORDER BY; bare glob order is filesystem-
        # arbitrary and a multi-part dump could spuriously fail the
        # positional compare below.
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        entry = {"rows_match": False, "schema_match": False, "hash_match": False,
                 "spark_rows": 0, "oracle_rows": 0, "err": None}
        try:
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
            exp = con.execute(oracle[name]).fetchdf()
            gc, ec = sorted(got.columns), sorted(exp.columns)
            entry["spark_rows"], entry["oracle_rows"] = len(got), len(exp)
            entry["schema_match"] = gc == ec
            entry["rows_match"] = len(got) == len(exp)
            if entry["schema_match"] and entry["rows_match"]:
                got, exp = got[gc], exp[gc]
                ok = True
                for c in gc:
                    for g, e in zip(got[c].tolist(), exp[c].tolist()):
                        eq = (g == e) or (isinstance(g, float) and isinstance(e, float)
                                          and math.isnan(g) and math.isnan(e))
                        if not eq:
                            ok = False
                            break
                    if not ok:
                        break
                entry["hash_match"] = ok
        except Exception as e:
            entry["err"] = str(e)[:200]
        per[name] = entry
    return per


def main():
    rnd = int(sys.argv[1])
    results, all_ok = {}, True
    for pair in sys.argv[2:]:
        sf_dir, out_dir = pair.split(":", 1)
        sf_label = os.path.basename(sf_dir.rstrip("/"))
        per = compare(sf_dir, out_dir)
        results[sf_label] = per
        n_ok = sum(1 for v in per.values() if v["hash_match"])
        print(f"{sf_label}: {n_ok}/{len(per)} hash-match")
        for n, v in per.items():
            if not v["hash_match"]:
                print(f"  FAIL {n}: {v}")
                all_ok = False
    art = {"round": rnd,
           "note": "builder-run cross-SF oracle gate (tools/local_verify.py "
                   "semantics); driver gate runs sf0.01 -- this artifact adds "
                   "evidence at the other generated SFs",
           "results": results}
    path = os.path.join(os.path.dirname(__file__), "..",
                        f"CORRECTNESS_SF01_r{rnd:02d}.json")
    json.dump(art, open(path, "w"), indent=1)
    print(f"wrote {os.path.normpath(path)}")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
