#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
sf tables, canonicalize (sort columns by name, sort rows), and compare.

Usage: tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps to ns, ints to int64 where possible
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    import glob
    names = sorted(x.split("/")[-1] for x in glob.glob(f"{out_dir}/*")
                   if not x.endswith(".json"))
    for name in names:
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            fails += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(mine)} rows)")
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fails += 1
            continue
        a, b = canon(mine), canon(want)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            fails += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            fails += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(a)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")
            fails += 1
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
