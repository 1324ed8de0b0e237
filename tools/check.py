#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
against the parquet tables in <sfDir>, load the Spark result parquet,
sort columns by name + rows by all values, and compare cell-by-cell
(exact; floats must be bit-identical after the decimal discipline of
SURVEY.md §4). NOT part of the library — dev tooling only.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                str(type(v)).find("ndarray") >= 0 else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        # partial dumps (SPARK_GRAFT_ONLY dev loop): skip queries that
        # were not dumped, but NAME them — in a full run a missing dump
        # means the driver died mid-Verify, and a silent skip would hide
        # which query (the n_ok count still fails the run either way)
        if not os.path.exists(f"{out_dir}/{name}"):
            print(f"SKIP {name} (no dump)")
            continue
        try:
            want = norm(con.sql(sql).df())
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: cols want={list(want.columns)} "
                  f"got={list(got.columns)}")
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            continue
        # The driver hashes raw values, so an int64 Spark column vs a
        # float64 oracle column (e.g. DuckDB SUM(int) → HUGEINT →
        # float64) hash-mismatches even when values are equal. Replicate
        # that strictness: dtype *kind* must agree per column.
        kind_bad = [c for c in want.columns
                    if want[c].dtype.kind != got[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind mismatch on {kind_bad}: " +
                  ", ".join(f"want {want[c].dtype} got {got[c].dtype}"
                            for c in kind_bad))
            continue
        try:
            pd.testing.assert_frame_equal(
                want, got, check_dtype=False, check_exact=True)
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1][:200]}")
    print(f"{n_ok}/{len(oracle)} queries match")
    return 0 if n_ok == len(oracle) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
