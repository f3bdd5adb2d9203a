#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet, sorts
columns by name, and compares cell-by-cell.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb or abs(fa - fb) < 1e-9
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = canon(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            oracle_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(oracle_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} != "
                  f"{list(oracle_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(oracle_df):
            print(f"FAIL {name}: rows {len(spark_df)} != {len(oracle_df)}")
            n_fail += 1
            continue
        sv, ov = spark_df.values.tolist(), oracle_df.values.tolist()
        bad = None
        for i, (r1, r2) in enumerate(zip(sv, ov)):
            for j, (c1, c2) in enumerate(zip(r1, r2)):
                if not cells_equal(c1, c2):
                    bad = (i, spark_df.columns[j], c1, c2)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
