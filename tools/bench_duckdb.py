#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the sf-dir tables — the single-node
throughput reference the Spark bench is compared against — and PERSIST the
comparison to target/bench_duckdb_<sf>.json (scale-suffixed) so the
spark-vs-duck ratio is a
committed artifact, not a one-window claim.

    python3 tools/bench_duckdb.py <sfDir> <verifyOutDir> [sparkBenchJson] [runs]

Protocol mirrors graft.Bench: one untimed warm-up pass per query, then
`runs` (default 3) timed passes; median reported, min/spread alongside.
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, spark_json=None, runs="3"):
    runs = int(runs)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    spark = {}
    if spark_json:
        spark = json.load(open(spark_json))
    spark_times = spark.get("queries", {})
    report = {"sf": sf_dir, "runs": runs, "queries": {}}
    for name, sql in sorted(oracle_sql.items()):
        try:
            con.sql(sql).fetchall()  # warm-up, untimed (mirrors Bench)
            ts = []
            for _ in range(runs):
                t0 = time.time()
                con.sql(sql).fetchall()
                ts.append(time.time() - t0)
            ts.sort()
            # conventional median (mean of middle two for even n), matching
            # graft.Bench's med()
            mid = len(ts) // 2
            median = ts[mid] if len(ts) % 2 == 1 else (ts[mid - 1] + ts[mid]) / 2
            entry = {"median": round(median, 4),
                     "min": round(ts[0], 4),
                     "spread": round(ts[-1] - ts[0], 4)}
        except Exception as e:
            print(f"{name}: DUCKDB ERROR {e}")
            entry = {"median": None, "min": None, "spread": None,
                     "error": str(e)[:200]}
        st = spark_times.get(name)
        # Bench reports -1.0 for a failed Spark query — treat as missing,
        # and `is not None` (not truthiness) so a legit 0.0 median counts
        if st is not None and st >= 0:
            entry["spark"] = st
            if entry["median"] is not None and entry["median"] > 0:
                entry["ratio"] = round(st / entry["median"], 2)
        report["queries"][name] = entry
    # headline totals over the INTERSECTION of successfully-timed queries on
    # BOTH engines — summing different query sets would silently skew the
    # comparison when either side errors
    both = {n: q for n, q in report["queries"].items()
            if q["median"] is not None and q.get("spark") is not None}
    report["compared_queries"] = len(both)
    report["duckdb_total"] = round(
        sum(q["median"] for q in both.values()), 2)
    if spark_times:
        report["spark_total"] = round(
            sum(q["spark"] for q in both.values()), 2)
        # all-queries sums kept for reference (may cover different sets)
        report["duckdb_total_all"] = round(
            sum(q["median"] for q in report["queries"].values()
                if q["median"] is not None), 2)
        report["spark_total_all"] = round(
            sum(v for v in spark_times.values() if v >= 0), 2)
    else:
        report["duckdb_total"] = round(
            sum(q["median"] for q in report["queries"].values()
                if q["median"] is not None), 2)
    for name, q in report["queries"].items():
        ratio = (f"  spark/duck={q['ratio']:5.1f}x"
                 if q.get("ratio") is not None else "")
        st = f" spark={q['spark']:7.3f}s" if q.get("spark") is not None else ""
        dt = f"{q['median']:7.3f}" if q["median"] is not None else "  ERROR"
        print(f"{name:28s} duckdb={dt}s{st}{ratio}")
    print(f"\nDuckDB total ({report['compared_queries']} compared): "
          f"{report['duckdb_total']:.1f}s")
    if spark_times:
        print(f"Spark total (same set):  {report['spark_total']:.1f}s")
    os.makedirs("target", exist_ok=True)
    # scale-suffixed like graft.Bench's bench_sf*.json (r12 verdict #4):
    # one artifact path per scale factor, so an sf0.1 run can never
    # overwrite a committed sf1 pair in the working tree
    label = os.path.basename(sf_dir.rstrip("/")).replace(".", "")
    out_path = f"target/bench_duckdb_{label}.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
