#!/usr/bin/env python3
"""Per-oracle DuckDB timing ladder (round-15, VERDICT item 1).

Runs every oracle SQL in <oracle_sql.json> against <sfDir> parquet and logs
one line per oracle: `<seconds>\t<name>` (incrementally flushed so a
detached run can be watched with tail -f). The point is to find and then
prove-fixed the oracles that blow the driver's correctness-stage budget.

Usage: python3 tools/time_oracles.py <oracle_sql.json> <sfDir> [name ...]
"""
import sys, json, time
from pathlib import Path
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    oracle_path, sf_dir = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    oracle = json.loads(Path(oracle_path).read_text())
    names = only if only else sorted(oracle)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    total = 0.0
    for name in names:
        if name not in oracle:
            print(f"SKIP\t{name}", flush=True)
            continue
        t0 = time.time()
        try:
            n = len(con.sql(oracle[name]).df())
            dt = time.time() - t0
            total += dt
            print(f"{dt:9.2f}\t{name}\trows={n}", flush=True)
        except Exception as e:
            dt = time.time() - t0
            print(f"{dt:9.2f}\t{name}\tERROR: {e}", flush=True)
    print(f"{total:9.2f}\tTOTAL ({len(names)} oracles)", flush=True)


if __name__ == "__main__":
    main()
