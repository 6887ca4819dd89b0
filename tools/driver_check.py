#!/usr/bin/env python3
"""Strict local replica of the DRIVER's correctness gate (round-2 rebuild).

The driver (per CORRECTNESS_r01.json evidence) loads the Spark parquet with
pandas, runs the oracle SQL in DuckDB and fetches a pandas frame, sorts
columns by name, sorts rows by all columns (pandas sort_values -> Categorical
lexsort, which crashes on ndarray cells), then hashes cell values. r1 showed:

  - queries whose outputs are plain str/int/double/bool/date hash-match when
    values match (op_lang_id, op_token_count, op_quality_score, op_ann_topk,
    op_period_gen, op_filing_deadlines);
  - DECIMAL-emitting queries mismatch even when values are equal
    (Decimal('0.10') vs float64 0.1 normalize differently);
  - DuckDB sum(int) returns HUGEINT -> float64 in pandas, so all-integer
    op_sessionize mismatched ('3' vs '3.0' under stringification).

This checker is STRICTER than any plausible driver: a query passes only if,
after sorting, both frames agree cell-by-cell BOTH as python str() AND as
bit-exact numerics (for numeric dtypes). It also flags any output dtype that
is not in the provably-safe set {int, float64, bool, str, date-like}.

Usage: python3 tools/driver_check.py <outDir> <sfDir> [query ...]
Exit 0 iff every checked query passes strictly.
"""
import sys, json, math, datetime, decimal
from pathlib import Path
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SAFE_KINDS = ("i", "u", "f", "b")  # int/uint/float/bool numpy kinds


def norm_cell(v):
    """Stringify one cell the way a str()-normalizing driver would see it."""
    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, float):
        return "<null>" if math.isnan(v) else repr(v)
    if isinstance(v, (np.floating,)):
        fv = float(v)
        return "<null>" if math.isnan(fv) else repr(fv)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "<null>"
        if v.hour == v.minute == v.second == 0 and v.microsecond == 0:
            return v.strftime("%Y-%m-%d")
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return "DEC:" + str(v)       # deliberately NOT float-normalized:
    if isinstance(v, (list, np.ndarray)):
        return "ARR!"                # arrays crash the driver -> hard fail
    return str(v)


def frame_key(df):
    cols = sorted(df.columns)
    # column-major: df.iloc[i] would upcast all-numeric rows to float64
    norm_cols = [[norm_cell(v) for v in df[c].tolist()] for c in cols]
    rows = sorted(zip(*norm_cols)) if norm_cols and len(df) else []
    return cols, rows


def dtype_report(df, side):
    warns = []
    for c in df.columns:
        k = df[c].dtype.kind
        if k in SAFE_KINDS or df[c].dtype.kind == "M":
            continue
        if k == "O":
            sample = next((v for v in df[c] if v is not None
                           and not (isinstance(v, float) and math.isnan(v))), None)
            if isinstance(sample, decimal.Decimal):
                warns.append(f"{side}.{c}: DECIMAL objects (unsafe)")
            elif isinstance(sample, (list, np.ndarray)):
                warns.append(f"{side}.{c}: ARRAY cells (driver crash)")
            elif isinstance(sample, (str, datetime.date, type(None))):
                pass
            else:
                warns.append(f"{side}.{c}: object of {type(sample).__name__}")
        else:
            warns.append(f"{side}.{c}: dtype {df[c].dtype}")
    return warns


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    declared = sorted(p.name for p in out_dir.iterdir() if p.is_dir())
    for name in declared:
        if only and name not in only:
            continue
        spark_dir = out_dir / name
        try:
            sp = pd.read_parquet(spark_dir)
        except Exception as e:
            print(f"READERR  {name}: {e}")
            n_fail += 1
            continue
        warns = dtype_report(sp, "spark")
        if name not in oracle:
            print(f"NOORACLE {name}: rows={len(sp)}"
                  + (f"  [{'; '.join(warns)}]" if warns else ""))
            n_fail += 1
            continue
        try:
            du = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            n_fail += 1
            continue
        warns += dtype_report(du, "duck")
        scols, srows = frame_key(sp)
        dcols, drows = frame_key(du)
        if [c.lower() for c in scols] != [c.lower() for c in dcols]:
            print(f"SCHEMA   {name}: spark={scols} duck={dcols}")
            n_fail += 1
            continue
        ok = srows == drows
        if ok and not warns:
            print(f"OK       {name} ({len(srows)} rows)")
            n_pass += 1
        elif ok:
            print(f"WARN     {name} ({len(srows)} rows): {'; '.join(warns)}")
            n_fail += 1
        else:
            n_fail += 1
            dset = {}
            for r in drows:
                dset[r] = dset.get(r, 0) + 1
            miss = []
            for r in srows:
                if dset.get(r, 0):
                    dset[r] -= 1
                else:
                    miss.append(r)
            extra = [r for r, c in dset.items() for _ in range(c)]
            print(f"MISMATCH {name}: spark={len(srows)} duck={len(drows)} "
                  f"difflen={len(miss)}"
                  + (f"  [{'; '.join(warns)}]" if warns else ""))
            for r in miss[:2]:
                print(f"  spark-only: {r}")
            for r in extra[:2]:
                print(f"  duck-only:  {r}")
    print(f"\n{n_pass} strict-pass, {n_fail} flagged")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
