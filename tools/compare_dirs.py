#!/usr/bin/env python3
"""Direct dir-to-dir compare of two graft.Verify dumps — the
partition-count invariance audit's second leg (both-vs-oracle proves
the hash path; this proves EVERY cell, including any column an oracle
might not constrain).

Usage: python3 tools/compare_dirs.py <dirA> <dirB>

For each query dir present in A: read both parquet results, sort rows
by all columns (string key), require identical schemas and identical
cell values (exact, including float bits via repr). Exits nonzero on
any mismatch.
"""
import os
import sys

import duckdb


def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(d for d in os.listdir(a)
                   if os.path.isdir(os.path.join(a, d)))
    bad = 0
    # dirs present only in B are a mismatch too (ADVICE r20): a query
    # that appeared in one dump but not the other must not pass silently
    only_b = sorted(d for d in os.listdir(b)
                    if os.path.isdir(os.path.join(b, d)) and d not in set(names))
    for name in only_b:
        print(f"{name}: MISSING in {a}")
        bad += 1
    for name in names:
        if not os.path.isdir(os.path.join(b, name)):
            print(f"{name}: MISSING in {b}")
            bad += 1
            continue
        con = duckdb.connect()
        def rows(base):
            r = con.sql(
                f"SELECT * FROM read_parquet('{base}/{name}/*.parquet')")
            cols = r.columns
            # column TYPES compare alongside names (ADVICE r20): a
            # BIGINT vs DOUBLE drift with equal value reprs must read
            # as a schema mismatch, not pass as identical cells
            types = [str(t) for t in r.types]
            data = r.fetchall()
            ordered = sorted(range(len(cols)), key=lambda i: cols[i])
            out = sorted(
                tuple(repr(row[i]) for i in ordered) for row in data)
            return sorted(zip(cols, types)), out
        ca, ra = rows(a)
        cb, rb = rows(b)
        if ca != cb:
            print(f"{name}: SCHEMA mismatch {ca} vs {cb}")
            bad += 1
        elif ra != rb:
            diff = sum(1 for x, y in zip(ra, rb) if x != y) + abs(len(ra) - len(rb))
            print(f"{name}: VALUE mismatch ({diff} rows differ)")
            bad += 1
        else:
            print(f"{name}: identical ({len(ra)} rows)")
    print(f"-- {bad} mismatching")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
