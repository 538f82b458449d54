#!/usr/bin/env python3
"""Dev-only oracle harness (mirrors the driver's t2 check; not shipped code).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every query's
oracle SQL from oracle_sql.json, and compares against the Spark result
parquet in <verifyOutDir>/<name>/ — columns sorted by name, rows sorted,
values stringified (floats repr'd) then hashed.
"""
import sys, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) for i in order))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISS  {name}: no spark output"); n_fail += 1; continue
        try:
            orows = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_fail += 1; continue
        sq = con.execute(f"SELECT * FROM read_parquet({spark_files!r})")
        srows = sq.fetchall()
        scols = [d[0] for d in sq.description]
        if sorted(scols) != sorted(ocols):
            print(f"SCHEMA {name}: spark={sorted(scols)} oracle={sorted(ocols)}"); n_fail += 1; continue
        a, b = canon(srows, scols), canon(orows, ocols)
        if a == b:
            print(f"OK    {name} ({len(a)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"DIFF  {name}: spark {len(a)} rows vs oracle {len(b)} rows")
            sa, sb = set(a), set(b)
            for r in list(sa - sb)[:3]: print(f"   spark-only: {r}")
            for r in list(sb - sa)[:3]: print(f"   oracle-only: {r}")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"   first row diff @ {i}:\n     spark : {x}\n     oracle: {y}")
                    break
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
