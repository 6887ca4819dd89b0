#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <outDir> <sfDir>
  where <outDir> is what `graft.Verify` wrote (one parquet dir per query +
  oracle_sql.json). Registers each testdata table as a DuckDB view, runs
  every oracle SQL, and compares against the Spark parquet as a multiset of
  rows with columns sorted by name (the driver's documented normalization).
Exit 0 iff every query matches exactly.
"""
import sys, json, math
from pathlib import Path
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("num", repr(v))
    if isinstance(v, int):
        return ("num", repr(float(v)) if abs(v) < 2**52 else str(v))
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, (datetime.date, datetime.datetime)):
        return ("dt", v.isoformat())
    if isinstance(v, list):
        return ("list", tuple(norm(x) for x in v))
    return ("s", str(v))

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = out_dir / name
        if not spark_dir.exists():
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.sql(oracle[name])
            dcols, drows = canon(duck.columns, duck.fetchall())
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            n_fail += 1
            continue
        sp = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols, srows = canon(sp.columns, sp.fetchall())
        if [c.lower() for c in scols] != [c.lower() for c in dcols]:
            print(f"SCHEMA   {name}: spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if srows == drows:
            print(f"OK       {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            print(f"MISMATCH {name}: spark {len(srows)} rows vs duck {len(drows)}")
            dset, sset = set(drows), set(srows)
            diff_s = [r for r in srows if r not in dset][:3]
            diff_d = [r for r in drows if r not in sset][:3]
            for r in diff_s: print(f"  spark-only: {r}")
            for r in diff_d: print(f"  duck-only:  {r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
