#!/usr/bin/env python3
"""Time the DuckDB oracle suite: min-of-3 per query, threads=32 — the
same method BASELINE.md records (graft.Bench mirrors it Spark-side).

Usage: python3 tools/time_duckdb.py <verify_out_dir> <sf_dir>
(reads <verify_out_dir>/oracle_sql.json; results go to stdout as JSON)
"""
import sys, json, os, time
import duckdb

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times = {}
    for name in sorted(oracle):
        sql = oracle[name]
        con.execute(sql).fetchall()  # warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        times[name] = best
    print(json.dumps({"total": sum(times.values()), "queries": times}))

if __name__ == "__main__":
    main()
