#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs after `graft.Verify` has dumped query results to OUTDIR:
  - reads OUTDIR/<name>/ parquet (spark result)
  - runs OUTDIR/oracle_sql.json[<name>] in DuckDB over SFDIR parquet tables
  - compares schema (column names sorted), row count, and values
    (columns sorted by name, rows compared in result order AND as sorted
    multisets, so we catch both kinds of driver compare).

Usage: python3 tools/compare_oracle.py <sfDir> <outDir>
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet({files!r})")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.execute(oracle[name])
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}"); n_fail += 1; continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1; continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
            n_fail += 1; continue
        order = sorted(duck_cols)
        s_idx = [spark_cols.index(c) for c in order]
        d_idx = [duck_cols.index(c) for c in order]
        s_vals = [tuple(norm(r[i]) for i in s_idx) for r in spark_rows]
        d_vals = [tuple(norm(r[i]) for i in d_idx) for r in duck_rows]
        ordered_ok = s_vals == d_vals
        multiset_ok = sorted(map(repr, s_vals)) == sorted(map(repr, d_vals))
        if ordered_ok:
            print(f"PASS {name} ({len(s_vals)} rows)"); n_pass += 1
        elif multiset_ok:
            print(f"WARN {name}: values match but ROW ORDER differs"); n_fail += 1
            for i, (a, b) in enumerate(zip(s_vals, d_vals)):
                if a != b:
                    print(f"  first diff at row {i}:\n   spark={a}\n   duck ={b}"); break
        else:
            print(f"FAIL {name}: value mismatch"); n_fail += 1
            sset, dset = set(map(repr, s_vals)), set(map(repr, d_vals))
            only_s = list(sset - dset)[:2]; only_d = list(dset - sset)[:2]
            for x in only_s: print(f"   spark-only: {x[:300]}")
            for x in only_d: print(f"   duck-only : {x[:300]}")
            if not only_s and not only_d:
                for i, (a, b) in enumerate(zip(s_vals, d_vals)):
                    if a != b:
                        print(f"  first diff at row {i}:\n   spark={str(a)[:300]}\n   duck ={str(b)[:300]}"); break
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
