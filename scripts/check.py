#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling only; the
shipped library is pure Scala). Usage:

    python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump written by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
source tables, sorts columns by name, and diffs values both ordered and as
sorted multisets."""
import argparse
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6f}"
    return str(v)


def main(sf_dir, out_dir, unordered=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns spark={gc} oracle={wc}")
            n_fail += 1
            continue
        g = [tuple(norm(v) for v in row) for row in got[gc].itertuples(index=False)]
        w = [tuple(norm(v) for v in row) for row in want[wc].itertuples(index=False)]
        if g == w:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        elif sorted(g) == sorted(w):
            # every query/oracle pair carries a total ORDER BY, so an
            # order mismatch is a real regression unless explicitly waived
            if unordered:
                print(f"WARN {name}: rows match only after sorting ({len(g)} rows)")
                n_pass += 1
            else:
                print(f"FAIL {name}: ORDER mismatch ({len(g)} rows; "
                      "values equal as multisets — pass --unordered to waive)")
                n_fail += 1
        else:
            print(f"FAIL {name}: spark {len(g)} rows vs oracle {len(w)} rows")
            only_g = [r for r in g if r not in set(w)][:3]
            only_w = [r for r in w if r not in set(g)][:3]
            print(f"  cols {gc}")
            print(f"  only-spark: {only_g}")
            print(f"  only-oracle: {only_w}")
            n_fail += 1
    import os
    rows_only = sorted(d for d in os.listdir(out_dir)
                       if os.path.isdir(f"{out_dir}/{d}") and d not in oracles)
    for name in rows_only:
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchone()[0]
            tag = "ROWS" if n > 0 else "EMPTY"
            print(f"{tag} {name} ({n} rows, no oracle)")
            if n == 0:
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: unreadable dump: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sf_dir")
    p.add_argument("out_dir")
    p.add_argument("--unordered", action="store_true",
                   help="waive ORDER BY mismatches (multiset-equal rows)")
    a = p.parse_args()
    sys.exit(main(a.sf_dir, a.out_dir, a.unordered))
