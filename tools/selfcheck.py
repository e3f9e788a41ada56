#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet,
and compares: schema (column names sorted), row count, and values both
as-ordered and row-sorted. Strict equality on values (floats compared exactly
— queries are expected to round); timestamps normalized to UTC-naive ns.

Dev tool only — NOT part of the Scala library.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
        # decimal → float for cross-engine compare
        if df[c].dtype == object and df[c].map(lambda v: type(v).__name__ == "Decimal").any():
            df[c] = df[c].astype(float)
        # datetime.date objects (Spark DATE via pyarrow) → datetime64
        if df[c].dtype == object and df[c].map(lambda v: type(v).__name__ == "date").any():
            df[c] = pd.to_datetime(df[c])
    return df.reset_index(drop=True)


def eq(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        return True
    except AssertionError:
        return False


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # Crashed queries write no output dir — cross-check the registered set
    # (queries.json manifest, falling back to oracle keys) so a crashing
    # registered query counts as a failure instead of silently vanishing.
    registered = set(oracle)
    try:
        manifest = json.load(open(f"{out_dir}/queries.json"))
        registered |= set(manifest.get("registered", []))
    except FileNotFoundError:
        pass
    for missing in sorted(registered - set(names)):
        print(f"  [FAIL-MISSING] {missing}: registered but no result dir (crashed?)")
        n_fail += 1
    for name in names:
        got = norm(pd.read_parquet(os.path.join(out_dir, name)))
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"  [FAIL-ORACLE-SQL] {name}: {e}")
            n_fail += 1
            continue
        ordered = eq(got, want)
        sg = got.sort_values(by=list(got.columns)).reset_index(drop=True) if len(got) else got
        sw = want.sort_values(by=list(want.columns)).reset_index(drop=True) if len(want) else want
        unordered = eq(sg, sw)
        if ordered:
            print(f"  [PASS] {name}: {len(got)} rows")
            n_pass += 1
        elif unordered:
            print(f"  [PASS-unordered-ONLY] {name}: {len(got)} rows (row order differs!)")
            n_fail += 1
        else:
            n_fail += 1
            print(f"  [FAIL] {name}: got {len(got)} rows / want {len(want)}; cols got={list(got.columns)} want={list(want.columns)}")
            both = got.merge(want, how="outer", indicator=True) if list(got.columns) == list(want.columns) else None
            if both is not None:
                diff = both[both["_merge"] != "both"]
                print(diff.head(6).to_string())
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
