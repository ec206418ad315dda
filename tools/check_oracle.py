#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [--json PATH]
       [--only-present] [--time]

--only-present: skip oracle entries with no spark output dir instead of
failing them — for comparing a SUBSET Verify dump (Verify's optional
query-name tail restricts the dump but still writes the full
oracle_sql.json), e.g. the sf1 hash rung.
--time: per-query oracle wall seconds in the report (duck_sec).

With --json, also writes a driver-shaped correctness artifact
({name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}) so a committed CORRECTNESS_LOCAL_sf01.json can
carry the sf0.1 hash evidence the driver file (sf0.01) does not.

Reads each <verify_out_dir>/<name>/ parquet (Spark result) and runs
<verify_out_dir>/oracle_sql.json[<name>] in DuckDB over the parquet tables
in <sf_dir>; compares after sorting columns by name and rows by all columns.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    json_path = None
    if "--json" in sys.argv:
        json_path = sys.argv[sys.argv.index("--json") + 1]
    report = {}
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver testdata ships single files <t>.parquet; Spark-staged
        # corpora (the sf1 rung) ship DIRECTORIES <t>.parquet/part-*
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    n_pass = n_fail = 0
    def record(name, rows=False, schema=False, values=False,
               sr=None, orr=None, err=None):
        report[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": values, "spark_rows": sr,
                        "oracle_rows": orr, "err": err}
    only_present = "--only-present" in sys.argv
    timing = "--time" in sys.argv
    for name in sorted(oracle):
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            if only_present:
                continue
            print(f"FAIL {name}: no spark output"); n_fail += 1
            record(name, err="no spark output"); continue
        try:
            import time as _t
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(spark_files)]))
            t0 = _t.time()
            want = norm(con.execute(oracle[name]).fetchdf())
            duck_sec = _t.time() - t0
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1
            record(name, err=str(e)[:300]); continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1
            record(name, sr=len(got), orr=len(want),
                   err=f"columns {list(got.columns)} vs {list(want.columns)}"); continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1
            record(name, schema=True, sr=len(got), orr=len(want),
                   err=f"rows {len(got)} vs {len(want)}"); continue
        bad = []
        for c in got.columns:
            a, b = got[c].values, want[c].values
            # The driver hashes raw values, so int64 1 vs float64 1.0 is a
            # mismatch there (e.g. an uncast DuckDB integer sum → HUGEINT →
            # float64). Fail loudly instead of coercing.
            g_int = np.issubdtype(got[c].dtype, np.integer)
            w_int = np.issubdtype(want[c].dtype, np.integer)
            g_flt = np.issubdtype(got[c].dtype, np.floating)
            w_flt = np.issubdtype(want[c].dtype, np.floating)
            if (g_int and w_flt) or (g_flt and w_int):
                bad.append(f"{c}: dtype {got[c].dtype} vs {want[c].dtype} (driver hash would differ)")
                continue
            if g_flt or w_flt:
                af = got[c].astype(float).values; bf = want[c].astype(float).values
                eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
                if not eq.all():
                    i = int(np.argmin(eq)); bad.append(f"{c}[{i}]: {af[i]!r} vs {bf[i]!r} (maxdiff {np.nanmax(np.abs(af-bf))})")
            else:
                eq = pd.Series(a).astype(object).fillna("\0") == pd.Series(b).astype(object).fillna("\0")
                if not eq.all():
                    i = int(np.argmin(eq.values)); bad.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4])); n_fail += 1
            record(name, rows=True, schema=True, sr=len(got), orr=len(want),
                   err="; ".join(bad[:4])[:300])
        else:
            print(f"PASS {name} ({len(got)} rows)"
                  + (f" duck={duck_sec:.2f}s" if timing else "")); n_pass += 1
            record(name, rows=True, schema=True, values=True,
                   sr=len(got), orr=len(want))
            if timing:
                report[name]["duck_sec"] = round(duck_sec, 3)
    print(f"== {n_pass} pass, {n_fail} fail")
    if json_path:
        json.dump(report, open(json_path, "w"), indent=1)
    sys.exit(1 if n_fail else 0)

main()
