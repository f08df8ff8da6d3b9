#!/usr/bin/env python3
"""CORRECTNESS_rN-shaped JSON artifact from a graft.Verify dump — the
committed at-scale proof the r13 verdict asked for (#4): per-query
rows/schema/hash match vs the DuckDB oracles, same record shape as the
driver's CORRECTNESS_rN.json, plus a rows-only record (err: "no_oracle")
for every declared query without an oracle.

Usage:
    python3 tools/correctness_json.py <sfDir> <verifyOutDir> <out.json>

q78's exact oracle is O(n^2) in DuckDB (~12 min at sf1); budget an hour
for a full sf1 run.
"""
import glob
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir, out_json):
    con = duckdb.connect()
    # The heavy replay oracles (q36's 256-cell Lloyd chain, q78's exact
    # O(n^2) pair join at sf1) exceed an in-memory duckdb's RAM ceiling —
    # without a temp_directory an in-memory connection CANNOT spill and
    # the process thrashes to the 80%-of-RAM limit (observed: 103 GB RSS,
    # D-state, ~2 h wedged at sf1). Cap memory and give it a disk spill.
    import os
    spill = os.environ.get("DUCKDB_SPILL_DIR", "/tmp/duckdb_spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    con.execute(
        f"SET memory_limit='{os.environ.get('DUCKDB_MEMORY_LIMIT', '48GB')}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    # every query Verify dumped, oracle-bearing or not
    dumped = sorted(p.split("/")[-1] for p in glob.glob(f"{out_dir}/q*")
                    if not p.endswith(".json"))
    for name in dumped:
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            rec["spark_rows"] = int(len(got))
            if name not in oracle_sql:
                rec["err"] = "no_oracle"
                results[name] = rec
                continue
            want = con.sql(oracle_sql[name]).df()
            rec["oracle_rows"] = int(len(want))
            g, w = norm(got), norm(want)
            rec["schema_match"] = list(g.columns) == list(w.columns)
            rec["rows_match"] = len(g) == len(w)
            if rec["schema_match"] and rec["rows_match"]:
                rec["hash_match"] = all(
                    (g[c].astype(str).values == w[c].astype(str).values).all()
                    for c in g.columns)
            else:
                rec["hash_match"] = False
        except Exception as e:  # noqa: BLE001 - record, don't mask, any engine error
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = rec
        status = ("PASS" if rec["hash_match"]
                  else "rows-only" if rec["err"] == "no_oracle" else "FAIL")
        print(f"{status} {name}", flush=True)
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    n_pass = sum(1 for r in results.values() if r["hash_match"])
    n_oracle = sum(1 for r in results.values() if r["err"] != "no_oracle")
    n_bad = sum(1 for r in results.values()
                if r["err"] not in (None, "no_oracle") or
                (r["hash_match"] is False))
    print(f"\n{n_pass} hash-green of {n_oracle} oracle-bearing "
          f"({len(results)} total, {n_bad} failures) -> {out_json}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
