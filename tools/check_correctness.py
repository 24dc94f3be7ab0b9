#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python tools/check_correctness.py <sfDir> <verifyOutDir>

Runs each oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against
the parquet tables in <sfDir>, loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name + rows by all columns, and
compares values exactly (with a loose float fallback report).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def norm_cell(v):
    if isinstance(v, float):
        return v
    if hasattr(v, "isoformat"):  # datetimes/dates
        return str(v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            duck_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if spark_df.shape != duck_df.shape:
            print(f"FAIL {name}: shape {spark_df.shape} vs {duck_df.shape}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: cols {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1
            continue
        # Driver hashes raw values, so an int64-vs-float64 dtype skew (e.g.
        # DuckDB list_sum returning HUGEINT->float) fails there even when
        # numeric == passes here. Flag dtype mismatches as failures.
        # Width differences (int32 vs int64) hash identically; kind
        # differences (int vs float) do not — r1 proved both empirically.
        def kind(dt):
            return getattr(dt, "kind", "O")
        dt_skew = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                   for c in spark_df.columns
                   if kind(spark_df[c].dtype) != kind(duck_df[c].dtype)]
        if dt_skew:
            print(f"FAIL {name}: dtype skew {dt_skew}")
            n_fail += 1
            continue
        mismatch = []
        for c in spark_df.columns:
            a = spark_df[c].map(norm_cell)
            b = duck_df[c].map(norm_cell)
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                idx = (~eq).idxmax()
                mismatch.append((c, a[idx], b[idx]))
        if mismatch:
            print(f"FAIL {name}: {len(mismatch)} col mismatches; first: "
                  f"{mismatch[0][0]!r} spark={mismatch[0][1]!r} duck={mismatch[0][2]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracles)} total oracles")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
