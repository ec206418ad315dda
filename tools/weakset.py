#!/usr/bin/env python3
"""Mechanical weak-set adjudication from bench artifacts alone.

Applies BENCHING.md's floor-adjusted weak rule to a (bench_full,
bench_duckdb) artifact pair:

    floor_excess(q) = t_spark(q) - nJobs(q) * floor(q)
    WEAK(q)  iff  floor_excess(q) > 2 * t_duckdb(q)
             and  floor_excess(q) > 1.0 s

where `floor(q)` is the per-Spark-job cost of the rolling q00 canary
nearest the query's kept (min-of-N) measurement and `nJobs(q)` the
Spark jobs its plan launches — both fields of the full artifact, so the
adjudication needs no scaladoc archaeology and no cross-window
comparisons.

Usage: python3 tools/weakset.py <bench_full.json> <bench_duckdb.json>
"""
import sys, json

def main():
    bench = json.load(open(sys.argv[1]))
    duck = json.load(open(sys.argv[2]))
    qs, jobs, floors = bench["queries"], bench["jobs"], bench["floors"]
    dq = duck["queries"]
    rows = []
    for name in sorted(qs):
        t = qs[name]
        excess = t - jobs.get(name, 0) * floors.get(name, 0.0)
        twin = dq.get(name)
        weak = (twin is not None and excess > 2 * twin and excess > 1.0)
        rows.append({"query": name, "sec": round(t, 3),
                     "n_jobs": jobs.get(name), "floor": floors.get(name),
                     "floor_excess": round(excess, 3),
                     "duckdb_sec": round(twin, 3) if twin is not None else None,
                     "weak": weak})
    weakset = [r["query"] for r in rows if r["weak"]]
    print(json.dumps({
        "weak_count": len(weakset), "weak": weakset,
        "rule": "floor_excess > 2*duckdb AND floor_excess > 1.0s",
        "rows": [r for r in rows if r["weak"]]}, indent=2))

if __name__ == "__main__":
    main()
