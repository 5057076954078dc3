#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: for each query dumped by
graft.Verify into OUTDIR, run its oracle SQL in DuckDB over the same sf dir
and compare (columns sorted by name, rows sorted, values hashed).

Usage: python3 project/compare_oracle.py /tmp/verify_r9 /root/testdata/sf0.01
"""
import sys, os, json, math
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)

fails = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    spark = con.execute(f"SELECT * FROM '{d}/*.parquet'").df()
    scols = sorted(spark.columns)
    srows = sorted(tuple(norm(v) for v in row) for row in
                   spark[scols].itertuples(index=False, name=None))
    if name not in oracles:
        print(f"{name}: rows-only ({len(srows)} rows)" +
              (" FAIL-EMPTY" if not srows else ""))
        fails += 0 if srows else 1
        continue
    oracle = con.execute(oracles[name]).df()
    ocols = sorted(oracle.columns)
    orows = sorted(tuple(norm(v) for v in row) for row in
                   oracle[ocols].itertuples(index=False, name=None))
    if scols != ocols:
        print(f"{name}: SCHEMA MISMATCH spark={scols} oracle={ocols}")
        fails += 1
    elif srows != orows:
        sset, oset = set(srows), set(orows)
        print(f"{name}: ROW MISMATCH spark={len(srows)} oracle={len(orows)} "
              f"only-spark={len(sset-oset)} only-oracle={len(oset-sset)}")
        for r in list(sset - oset)[:3]:
            print(f"   spark-only: {r}")
        for r in list(oset - sset)[:3]:
            print(f"  oracle-only: {r}")
        fails += 1
    else:
        print(f"{name}: OK ({len(srows)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
