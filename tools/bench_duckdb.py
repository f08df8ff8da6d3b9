#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the sf-dir tables — a single-node
throughput reference to sanity-check the Spark bench numbers against.

    python3 tools/bench_duckdb.py <sfDir> <verifyOutDir> [sparkBenchJson]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, spark_json=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    spark_times = {}
    if spark_json:
        spark_times = json.load(open(spark_json)).get("queries", {})
    total = 0.0
    rows = []
    for name, sql in sorted(oracle_sql.items()):
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            dt = time.time() - t0
            total += dt
            rows.append((name, dt, spark_times.get(name)))
        except Exception as e:
            rows.append((name, None, spark_times.get(name)))
            print(f"{name}: DUCKDB ERROR {e}")
    for name, dt, st in rows:
        ratio = f"  spark/duck={st/dt:5.1f}x" if (dt and st) else ""
        print(f"{name:28s} duckdb={dt:7.3f}s" +
              (f" spark={st:7.3f}s{ratio}" if st else ""))
    print(f"\nDuckDB total: {total:.1f}s")
    if spark_times:
        print(f"Spark total:  {sum(spark_times.values()):.1f}s")


if __name__ == "__main__":
    main(*sys.argv[1:])
