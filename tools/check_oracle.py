#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify's
parquet dumps against SparkEntry.oracleSql run in DuckDB on the same
testdata tables. Usage:

    python3 tools/check_oracle.py OUTDIR SFDIR [query ...]

Compares row count, column-name set, and the multiset of row values with
columns sorted by name (the driver's hash is over exactly that)."""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:]) or None
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failed = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        pq = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not pq:
            print(f"{name}: NO SPARK OUTPUT")
            failed += 1
            continue
        sdf = con.execute(f"SELECT * FROM read_parquet('{pq[0]}')").fetchdf()
        odf = con.execute(sql).fetchdf()
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        ok_schema = scols == ocols
        ok_rows = len(sdf) == len(odf)
        ok_hash = False
        if ok_schema and ok_rows:
            a = sorted(map(repr, sdf[scols].itertuples(index=False, name=None)))
            b = sorted(map(repr, odf[ocols].itertuples(index=False, name=None)))
            ok_hash = a == b
            if not ok_hash:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"{name}: HASH MISMATCH first diffs: {diff}")
        status = "ok" if (ok_schema and ok_rows and ok_hash) else \
            f"FAIL schema={ok_schema}({scols} vs {ocols}) rows={ok_rows}({len(sdf)} vs {len(odf)}) hash={ok_hash}"
        if "FAIL" in status:
            failed += 1
        print(f"{name}: {status}")
    sys.exit(1 if failed else 0)

main()
