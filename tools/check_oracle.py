#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [nameFilter...]

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet, sorts
columns by name, and compares.

The compare is deliberately STRICT, because the driver hashes serialized
values: a DuckDB HUGEINT (int128, from an uncast sum()) and a Spark LONG
serialize differently even when numerically equal, and the driver flags
that as a hash mismatch. So this checker:

  - compares the DuckDB-DECLARED column type of both sides (the Spark
    parquet scanned back through DuckDB vs the oracle query) and fails on
    any difference — this is what catches HUGEINT-vs-BIGINT and
    HUGEINT-vs-DECIMAL(38,0) drift that pandas float conversion absorbs;
  - fetches rows with fetchall() (ints stay int, decimals stay Decimal,
    no float64 coercion) and compares cells EXACTLY — float tolerance is
    applied ONLY when the declared type is FLOAT/DOUBLE on both sides
    (probes bin-round doubles, so even those normally match exactly).
"""
import json
import math
import sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FLOATY = ("FLOAT", "DOUBLE", "REAL")


def fetch(con, sql):
    """Run sql; return (col_names_sorted, type_names_sorted, rows) with
    columns sorted by name (the driver's canonicalization). Uses the
    relation API: .types gives REAL DuckDB types (BIGINT vs HUGEINT vs
    DECIMAL(38,0)); DB-API cursor.description would collapse all of
    those to 'NUMBER' and miss exactly the drift this checker exists
    to catch."""
    rel = con.sql(sql)
    names = list(rel.columns)
    types = [str(t) for t in rel.types]
    rows = rel.fetchall()
    order = sorted(range(len(names)), key=lambda i: names[i])
    names_s = [names[i] for i in order]
    types_s = [types[i] for i in order]
    rows_s = [tuple(r[i] for i in order) for r in rows]
    return names_s, types_s, rows_s


def cells_equal(a, b, type_a, type_b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if type_a in FLOATY and type_b in FLOATY:
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) < 1e-9
    if isinstance(a, (int, Decimal)) and isinstance(b, (int, Decimal)):
        return a == b  # exact; type drift is caught at the schema level
    return a == b or str(a) == str(b)


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and not any(o in name for o in only):
            continue
        try:
            s_cols, s_types, s_rows = fetch(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            o_cols, o_types, o_rows = fetch(con, sql)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if s_cols != o_cols:
            print(f"FAIL {name}: columns {s_cols} != {o_cols}")
            n_fail += 1
            continue
        # Any DECIMAL-typed OUTPUT column is driver-hash-unsafe: the
        # driver hashes serialized values, and Spark DecimalType vs
        # DuckDB DECIMAL(38,0) serialize differently even when
        # bit-identical numerically (the q153 r5 lesson). Accumulate in
        # decimal if you must, but publish BIGINT/DOUBLE.
        dec = [f"{c}: spark={st} oracle={ot}"
               for c, st, ot in zip(s_cols, s_types, o_types)
               if "DECIMAL" in st or "DECIMAL" in ot]
        if dec:
            print(f"FAIL {name}: DECIMAL output column (driver-hash-"
                  f"unsafe) — {'; '.join(dec)}")
            n_fail += 1
            continue
        if s_types != o_types:
            diffs = [f"{c}: spark={st} oracle={ot}"
                     for c, st, ot in zip(s_cols, s_types, o_types)
                     if st != ot]
            print(f"FAIL {name}: declared types differ — {'; '.join(diffs)}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows {len(s_rows)} != {len(o_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (r1, r2) in enumerate(zip(s_rows, o_rows)):
            for j, (c1, c2) in enumerate(zip(r1, r2)):
                if not cells_equal(c1, c2, s_types[j], o_types[j]):
                    bad = (i, s_cols[j], c1, c2)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
