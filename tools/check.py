#!/usr/bin/env python3
"""Dev-only oracle harness (mirrors the driver's t2 check; not shipped code).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [name ...]

Registers each testdata parquet as a DuckDB view, runs every query's
oracle SQL from oracle_sql.json, and compares against the Spark result
parquet in <verifyOutDir>/<name>/ — columns sorted by name, rows sorted,
values stringified (floats repr'd) then hashed. TYPE-SENSITIVE: arrow
column types must match too (the driver's hash compare is type-sensitive,
e.g. DuckDB HUGEINT vs Spark BIGINT fails even when values agree).
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(tbl):
    cols = sorted(tbl.column_names)
    rows = [tuple(str(tbl.column(c)[i].as_py()) for c in cols)
            for i in range(tbl.num_rows)]
    rows.sort()
    return rows

def arrow_types(tbl):
    return {c: str(tbl.schema.field(c).type) for c in tbl.column_names}

def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISS  {name}: no spark output"); n_fail += 1; continue
        try:
            otbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_fail += 1; continue
        stbl = con.execute(f"SELECT * FROM read_parquet({spark_files!r})").fetch_arrow_table()
        if sorted(stbl.column_names) != sorted(otbl.column_names):
            print(f"SCHEMA {name}: spark={sorted(stbl.column_names)} oracle={sorted(otbl.column_names)}")
            n_fail += 1; continue
        st, ot = arrow_types(stbl), arrow_types(otbl)
        tdiff = {c: (st[c], ot[c]) for c in st if st[c] != ot[c]}
        if tdiff:
            print(f"TYPE  {name}: {tdiff}"); n_fail += 1; continue
        a, b = canon(stbl), canon(otbl)
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
    main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:]))
