#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify-dumped parquet result against its DuckDB oracle SQL over the
same testdata parquet tables. Columns are sorted by name (like the
driver's hash), and we check BOTH as-stored row order and the
order-insensitive sorted comparison, so ordering bugs are visible.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        out.append(tuple(
            tuple(v) if isinstance(v, list) else v for v in row))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            cols = sorted(got_rel.columns)
            collist = ", ".join(f'"{c}"' for c in cols)
            got = canon(con.sql(
                f"SELECT {collist} FROM got_rel").fetchall())
            want_rel = con.sql(sql)
            wcols = sorted(want_rel.columns)
            want = canon(con.sql(
                f"SELECT {', '.join(chr(34)+c+chr(34) for c in wcols)} FROM want_rel").fetchall())
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if cols != wcols:
            print(f"FAIL {name}: columns spark={cols} oracle={wcols}")
            n_fail += 1
            continue
        ordered_eq = got == want
        sorted_eq = sorted(got, key=repr) == sorted(want, key=repr)
        if ordered_eq:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        elif sorted_eq:
            print(f"WARN {name}: rows match only after sorting "
                  f"(ordering mismatch, {len(got)} rows)")
            n_fail += 1
        else:
            n_fail += 1
            diffs = [(g, w) for g, w in zip(got, want) if g != w]
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows, "
                  f"{len(diffs)} differing of first zip; first diffs:")
            for g, w in diffs[:3]:
                print(f"   spark : {g}")
                print(f"   oracle: {w}")
            if len(got) != len(want):
                only_g = set(map(repr, got)) - set(map(repr, want))
                only_w = set(map(repr, want)) - set(map(repr, got))
                for x in list(only_g)[:2]:
                    print(f"   only-spark : {x}")
                for x in list(only_w)[:2]:
                    print(f"   only-oracle: {x}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
