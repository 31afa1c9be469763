#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/local_check.py [verify_out_dir] [sf_dir]

For each query dir under verify_out_dir: read the Spark parquet result,
run the oracle SQL from oracle_sql.json against the sf parquet tables,
sort columns by name + rows by all columns, compare values (exact for
non-floats, rel 1e-9 for floats). Prints one line per query.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    # Round floats in the sort key so engine-level jitter (last-ulp
    # differences between Spark and DuckDB) cannot reorder the two sides
    # differently and mispair rows.
    def key(x):
        if isinstance(x, float):
            return (x is None, f"{x:.6g}")
        return (x is None, str(x))
    return sorted(rows, key=lambda r: tuple(key(x) for x in r))


def close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import os
    names = sorted(d for d in os.listdir(out_dir) if d.startswith("q"))
    n_ok = 0
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_cols = sorted(spark_rel.columns)
        s_rows = norm(con.sql(
            f"SELECT {', '.join(s_cols)} FROM spark_rel").fetchall())
        if name not in oracle:
            print(f"{name:28s} rows={len(s_rows):6d}  (no oracle — rows-only)"
                  + ("  EMPTY!" if not s_rows else ""))
            continue
        s_types = dict(zip(spark_rel.columns, map(str, spark_rel.types)))
        try:
            o_rel = con.sql(oracle[name])
            o_cols_orig = o_rel.columns
            o_types = dict(zip(o_cols_orig, map(str, o_rel.types)))
            o_cols = sorted(o_cols_orig)
            o_rows = norm(con.sql(
                f"SELECT {', '.join(o_cols)} FROM o_rel").fetchall())
        except Exception as e:
            print(f"{name:28s} ORACLE SQL ERROR: {e}")
            continue
        # Output-TYPE audit (driver hash is type-sensitive; value
        # compares are blind to HUGEINT-vs-BIGINT — the q145/q186
        # r14-r18 failure class). Exact per-column type equality.
        type_bad = [(c, s_types.get(c), o_types.get(c))
                    for c in sorted(set(s_types) & set(o_types))
                    if s_types.get(c) != o_types.get(c)]
        if type_bad:
            print(f"{name:28s} TYPE MISMATCH {type_bad[:6]}")
        schema_ok = s_cols == o_cols and not type_bad
        rows_ok = len(s_rows) == len(o_rows)
        vals_ok = rows_ok and all(
            all(close(a, b) for a, b in zip(sr, orow))
            for sr, orow in zip(s_rows, o_rows))
        ok = schema_ok and rows_ok and vals_ok
        n_ok += ok
        status = "OK " if ok else "FAIL"
        detail = ""
        if not schema_ok:
            detail = f" spark_cols={s_cols} oracle_cols={o_cols}"
        elif not rows_ok:
            detail = f" spark_rows={len(s_rows)} oracle_rows={len(o_rows)}"
        elif not vals_ok:
            for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
                bad = [(c, a, b) for c, a, b in zip(s_cols, sr, orow)
                       if not close(a, b)]
                if bad:
                    detail = f" first_diff_row={i} {bad[:2]}"
                    break
        print(f"{name:28s} {status} rows={len(s_rows):6d}{detail}")
    print(f"\n{n_ok}/{len([n for n in names if n in oracle])} oracled queries OK")


if __name__ == "__main__":
    main()
