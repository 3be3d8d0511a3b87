#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles in oracle_sql.json over the same sf
tables; compare schema (sorted column names) and sorted row values.

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb


def load(sf_dir, out_dir):
    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def canon(df):
    """Sort columns by name, then rows by stringified values."""
    cols = sorted(df.columns)
    df = df[cols]
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, bool):
            return str(bool(v)).lower()
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = load(sf_dir, out_dir)
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" FAIL(empty)" if len(got) == 0 else "")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        gc, gr = canon(got)
        wc, wr = canon(want)
        if gc != wc:
            results[name] = f"SCHEMA_MISMATCH spark={gc} duckdb={wc}"
        elif len(gr) != len(wr):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(gr)} duckdb={len(wr)}"
        elif gr != wr:
            diffs = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b][:3]
            detail = "; ".join(f"row{i}: spark={gr[i]} duckdb={wr[i]}" for i in diffs)
            results[name] = f"VALUE_MISMATCH ({sum(a != b for a, b in zip(gr, wr))} rows) {detail}"
        else:
            results[name] = f"OK rows={len(gr)}"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_rows_only = sum(1 for v in results.values() if v.startswith("ROWS_ONLY") and "FAIL" not in v)
    n_bad = len(results) - n_ok - n_rows_only
    for k, v in sorted(results.items()):
        flag = "  " if v.startswith(("OK", "ROWS_ONLY")) and "FAIL" not in v else "XX"
        print(f"{flag} {k}: {v}")
    print(f"\n{n_ok} oracle-matched, {n_rows_only} rows-only, {n_bad} FAILED")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
