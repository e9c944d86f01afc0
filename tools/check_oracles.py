#!/usr/bin/env python3
"""Local pre-check that mimics the driver's correctness gate:
run `sbt "runMain graft.Verify <sfDir> <outDir>"` first, then this script
compares each <outDir>/<name> parquet against the DuckDB result of
<outDir>/oracle_sql.json's SQL over the same testdata parquet tables.

Usage: python3 tools/check_oracles.py <sfDir> <outDir>
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    # driver sorts columns by name before hashing values
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    prefixes = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        sql = oracles[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = normalize(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            duck_df = normalize(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok = True
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            ok = False
        elif len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            ok = False
        else:
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                try:
                    same = (a.astype(str).values == b.astype(str).values).all()
                except Exception:
                    same = False
                if not same:
                    diff = [(i, a.iloc[i], b.iloc[i]) for i in range(len(a))
                            if str(a.iloc[i]) != str(b.iloc[i])][:3]
                    print(f"FAIL {name}: col {c} differs, e.g. {diff}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
