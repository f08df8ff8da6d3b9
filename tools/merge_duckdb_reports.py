#!/usr/bin/env python3
"""Merge two tools/bench_duckdb.py reports (disjoint query sets) into one.

Round-15 verdict ask #7: q78's exact O(n^2) oracle (~21 min at sf1) must not
share a timing window with the millisecond queries whose medians it poisons.
The sf1 DuckDB side therefore runs as TWO windows — the 121-query main set
and a q78-only window — and this merges them into the single committed
artifact, recomputing the intersection totals.

    python3 tools/merge_duckdb_reports.py <main.json> <extra.json> <out.json>
"""
import json
import sys


def main(main_path, extra_path, out_path):
    a = json.load(open(main_path))
    b = json.load(open(extra_path))
    overlap = set(a["queries"]) & set(b["queries"])
    if overlap:
        raise SystemExit(f"query sets overlap: {sorted(overlap)}")
    # compatibility gate (advisor r16): two reports from different scale
    # factors / configs must not merge silently into one artifact
    for key in ("sf", "sf_dir", "config"):
        if key in a and key in b and a[key] != b[key]:
            raise SystemExit(
                f"incompatible reports: {key!r} differs "
                f"({a[key]!r} vs {b[key]!r})")
    merged = dict(a)
    merged["queries"] = {**a["queries"], **b["queries"]}
    # windows carry the SAME shape for both entries (count + list) —
    # advisor r16 flagged the count-vs-list asymmetry
    merged["windows"] = {
        "main": {"source": main_path, "runs": a.get("runs"),
                 "n_queries": len(a["queries"]),
                 "queries": sorted(a["queries"])},
        "extra": {"source": extra_path, "runs": b.get("runs"),
                  "n_queries": len(b["queries"]),
                  "queries": sorted(b["queries"])},
    }
    # non-query metadata unique to the extra report is preserved under its
    # window instead of being dropped
    merged["windows"]["extra"]["meta"] = {
        k: v for k, v in b.items() if k not in ("queries", "windows")}
    both = {n: q for n, q in merged["queries"].items()
            if q.get("median") is not None and q.get("spark") is not None}
    merged["compared_queries"] = len(both)
    merged["duckdb_total"] = round(sum(q["median"] for q in both.values()), 2)
    merged["spark_total"] = round(sum(q["spark"] for q in both.values()), 2)
    merged["duckdb_total_all"] = round(
        sum(q["median"] for q in merged["queries"].values()
            if q.get("median") is not None), 2)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"merged {len(a['queries'])} + {len(b['queries'])} queries -> "
          f"{out_path}; compared={merged['compared_queries']} "
          f"duck={merged['duckdb_total']} spark={merged['spark_total']}")


if __name__ == "__main__":
    main(*sys.argv[1:])
