#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/local_verify.py [sfDir] [outDir]

Reads outDir/<name>/ (spark parquet dirs) + outDir/oracle_sql.json,
runs each oracle in DuckDB against the sfDir parquet tables, and
compares schema + sorted values. Run graft.Verify first to produce
outDir.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if hasattr(v, "isoformat"):  # datetime.datetime / date / pd.Timestamp
        return v.isoformat()
    return repr(v)


def table_key(tbl):
    cols = sorted(tbl.column_names)
    pylist = tbl.select(cols).to_pylist()
    rows = sorted(
        tuple(norm_cell(r[c]) for c in cols) for r in pylist
    )
    return cols, rows


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    oracle = json.loads((OUT_DIR / "oracle_sql.json").read_text())
    n_pass = n_fail = n_rows_only = 0
    for d in sorted(OUT_DIR.iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        spark_tbl = pq.read_table(str(d))
        if name not in oracle:
            status = "ROWS-ONLY"
            n_rows_only += 1
            print(f"{status:10s} {name}: rows={spark_tbl.num_rows}")
            if spark_tbl.num_rows == 0:
                print(f"   WARN: zero rows from {name}")
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"{'ORACLE-ERR':10s} {name}: {e}")
            n_fail += 1
            continue
        sc, sr = table_key(spark_tbl)
        dc, dr = table_key(duck_tbl)
        if sc != dc:
            print(f"{'COLS-DIFF':10s} {name}: spark={sc} duck={dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"{'ROWS-DIFF':10s} {name}: spark={len(sr)} duck={len(dr)}")
            n_fail += 1
        elif sr != dr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            print(f"{'VAL-DIFF':10s} {name}: first diff at sorted row {bad}:")
            print(f"   spark: {sr[bad]}")
            print(f"   duck : {dr[bad]}")
            n_fail += 1
        else:
            # also compare arrow schema types loosely
            st = {f.name: str(f.type) for f in spark_tbl.schema}
            dt = {f.name: str(f.type) for f in duck_tbl.schema}
            mism = {k: (st[k], dt[k]) for k in st if st[k] != dt.get(k)}
            tag = f" (type-note: {mism})" if mism else ""
            print(f"{'PASS':10s} {name}: rows={spark_tbl.num_rows}{tag}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
