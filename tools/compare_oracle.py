#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir> [query ...]

For each query with an oracle in oracle_sql.json: run the SQL in DuckDB
over the sf parquet tables, load the Spark parquet result, sort columns
by name, sort rows, and compare row counts, schema (column names), and
a value hash (exact for non-floats, bit-exact for floats — the driver
hashes values, so we hash repr of the exact bytes).
"""
import sys, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(v.hex())  # bit-exact
            else:
                vals.append(repr(v))
        out.append("\x1f".join(vals))
    out.sort()
    return hashlib.md5("\x1e".join(out).encode()).hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark result")
            n_bad += 1
            continue
        sp = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        sp_types = dict(zip(sp.columns, map(str, sp.types)))
        sp_cols, sp_rows = [d[0] for d in sp.description], sp.fetchall()
        orc = con.sql(sql)
        o_types = dict(zip(orc.columns, map(str, orc.types)))
        o_cols, o_rows = [d[0] for d in orc.description], orc.fetchall()
        ok_rows = len(sp_rows) == len(o_rows)
        ok_schema = sorted(sp_cols) == sorted(o_cols)
        # Output-TYPE audit: the driver's value hash is type-sensitive,
        # while repr()-hashing below is blind to e.g. HUGEINT-vs-BIGINT
        # (the q145/q186 r14-r18 failure class). Assert the DuckDB view
        # of both sides types every shared column identically.
        type_bad = [(c, sp_types.get(c), o_types.get(c))
                    for c in sorted(set(sp_types) & set(o_types))
                    if sp_types.get(c) != o_types.get(c)]
        ok_types = not type_bad
        ok_hash = ok_rows and ok_schema and canon(sp_rows, sp_cols) == canon(o_rows, o_cols)
        status = "OK" if (ok_rows and ok_schema and ok_hash and ok_types) else \
            f"FAIL rows={ok_rows}({len(sp_rows)}/{len(o_rows)}) schema={ok_schema} hash={ok_hash} types={ok_types}"
        if type_bad:
            hint = " (HUGEINT: cast the aggregate itself, sum(...)::BIGINT)" \
                if any("HUGEINT" in (t or "") for _, _, t in type_bad) else ""
            print(f"  TYPE MISMATCH{hint}: {type_bad[:6]}")
        if not (ok_rows and ok_schema and ok_hash and ok_types):
            n_bad += 1
            if ok_rows and ok_schema and not ok_hash and len(sp_rows) <= 8:
                print(f"  spark:  {sorted(sp_rows)[:4]}")
                print(f"  oracle: {sorted(o_rows)[:4]}")
        print(f"{name}: {status}")
    print(f"-- {n_bad} failing")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
