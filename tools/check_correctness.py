#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL (from Verify's oracle_sql.json) in DuckDB over the
testdata parquet tables, loads the Spark result parquet written by
graft.Verify, normalizes both (sort columns by name, sort rows), and
compares cell values exactly. Usage:

    python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle_sql.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.sql(sql).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_fail += 1
                continue
            # exact compare (hash-equivalent); dtypes may differ (int32/int64)
            # so compare stringified values like a hash of values would.
            mism = []
            for c in g.columns:
                a, b = g[c].astype(str).values, w[c].astype(str).values
                bad = (a != b)
                if bad.any():
                    i = bad.argmax()
                    mism.append((c, i, a[i], b[i], int(bad.sum())))
            if mism:
                print(f"FAIL {name}: {len(mism)} mismatched cols; first: {mism[0]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed of {len(oracle_sql)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
