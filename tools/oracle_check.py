#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare: for each entry in
outDir/oracle_sql.json, register the sf tables as views, run the oracle SQL,
and compare rows/schema/values against the Spark parquet dump."""
import duckdb, json, sys, glob, os

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            if os.path.isdir(p) else
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    spark_path = f"{out_dir}/{name}"
    try:
        sp = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        oc = con.sql(sql).df()
        # normalize: sort columns by name, sort rows by all columns
        sp = sp[sorted(sp.columns)]
        oc = oc[sorted(oc.columns)]
        if list(sp.columns) != list(oc.columns):
            print(f"FAIL {name}: schema {list(sp.columns)} vs {list(oc.columns)}")
            fails += 1; continue
        if len(sp) != len(oc):
            print(f"FAIL {name}: rows {len(sp)} vs {len(oc)}")
            fails += 1; continue
        sp_s = sp.astype(str).sort_values(by=list(sp.columns)).reset_index(drop=True)
        oc_s = oc.astype(str).sort_values(by=list(oc.columns)).reset_index(drop=True)
        if not sp_s.equals(oc_s):
            diff = (sp_s != oc_s).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(sp_s)} rows differ; first:")
            idx = diff.idxmax()
            print("  spark :", sp_s.loc[idx].to_dict())
            print("  oracle:", oc_s.loc[idx].to_dict())
            fails += 1; continue
        print(f"OK   {name}: {len(sp)} rows")
    except Exception as e:
        print(f"ERR  {name}: {str(e).splitlines()[0][:200]}")
        fails += 1
print(f"\n{len(oracles)-fails}/{len(oracles)} oracles green")
sys.exit(1 if fails else 0)
