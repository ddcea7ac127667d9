#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run each oracle SQL from
Verify's oracle_sql.json in DuckDB over the fixture parquet tables, and
compare against the Spark result parquet written by graft.Verify.

Usage: check_oracle.py <sfDir> <verifyOutDir> [only1,only2,...]

The optional third arg restricts the compare to the named entries — a
dev tool for re-proving entries under change; the driver's gate runs
unfiltered.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 4))
    if isinstance(v, bool):
        return str(v).lower()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return ",".join(canon(x) for x in v)
    return str(v)


def rows_of(df):
    cols = sorted(df.columns)
    return [tuple(canon(r[c]) for c in cols) for _, r in df[cols].iterrows()], cols


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_path = f"{out_dir}/{name}"
        try:
            sdf = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
            odf = con.sql(oracle[name]).df()
            srows, scols = rows_of(sdf)
            orows, ocols = rows_of(odf)
            if scols != ocols:
                print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
                n_fail += 1
            elif srows != orows:
                n_fail += 1
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
                print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)} "
                      f"firstdiffs={diffs[:3]}"
                      + (f" extra_spark={srows[len(orows):][:2]}" if len(srows) > len(orows) else "")
                      + (f" extra_oracle={orows[len(srows):][:2]}" if len(orows) > len(srows) else ""))
            else:
                n_pass += 1
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {type(e).__name__}: {e}")
    # rows-only entries (no oracle): replicate the driver's rows>0 check
    for p in sorted(Path(out_dir).iterdir()):
        if p.is_dir() and p.name not in oracle and (
                only is None or p.name in only):
            n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            status = "ok" if n > 0 else "EMPTY"
            if n == 0:
                n_fail += 1
            print(f"rows-only {p.name}: {n} rows [{status}]")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
