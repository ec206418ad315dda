#!/usr/bin/env python3
"""q145 (token HITS) oracle at the sf1 rung, executed sequentially.

The CORRECTNESS_LOCAL_sf1 rung runs each oracle via check_oracle.py as
ONE DuckDB statement. q145's twin is an 8-step CTE chain (4 authority +
3 hub rounds over the doc->token edge table); as a single statement
DuckDB keeps every round's materialization alive at once and at sf1 it
spilled >79 GB of temp and exhausted the disk (twice, two configs) —
the one excluded row in the round-15 rung.

This script runs the SAME per-round SQL (expressions copied verbatim
from CorpusOracles.q145_token_hits) as a SEQUENCE of materialized
tables in an on-disk DuckDB database, dropping each intermediate as
soon as its successor exists — the working set is one join at a time,
bounded by |e| ~ distinct (doc, token) pairs, not 8 concurrent rounds.
Semantically identical query, different execution schedule; the
compare logic is check_oracle.py's, verbatim.

Usage: python3 tools/oracle_q145_sf1.py <verify_out_dir> <sf_dir> \
         [--json CORRECTNESS_LOCAL_sf1.json]
With --json, patches the q145_token_hits row in-place (and _meta
counts) on PASS; on FAIL the file is left untouched and the exit code
is 1.
"""
import glob
import json
import os
import shutil
import sys
import tempfile
import time

import duckdb
import numpy as np
import pandas as pd

S = 1000000000000


def norm(df: pd.DataFrame) -> pd.DataFrame:  # check_oracle.py, verbatim
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(got: pd.DataFrame, want: pd.DataFrame):
    """check_oracle.py's column/row/value rules; returns list of faults."""
    if list(got.columns) != list(want.columns):
        return [f"columns {list(got.columns)} vs {list(want.columns)}"]
    if len(got) != len(want):
        return [f"rows {len(got)} vs {len(want)}"]
    bad = []
    for c in got.columns:
        a, b = got[c].values, want[c].values
        g_int = np.issubdtype(got[c].dtype, np.integer)
        w_int = np.issubdtype(want[c].dtype, np.integer)
        g_flt = np.issubdtype(got[c].dtype, np.floating)
        w_flt = np.issubdtype(want[c].dtype, np.floating)
        if (g_int and w_flt) or (g_flt and w_int):
            bad.append(f"{c}: dtype {got[c].dtype} vs {want[c].dtype}")
            continue
        if g_flt or w_flt:
            af = got[c].astype(float).values
            bf = want[c].astype(float).values
            eq = (af == bf) | (np.isnan(af) & np.isnan(bf))
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}[{i}]: {af[i]!r} vs {bf[i]!r}")
        else:
            eq = (pd.Series(a).astype(object).fillna("\0")
                  == pd.Series(b).astype(object).fillna("\0"))
            if not eq.all():
                i = int(np.argmin(eq.values))
                bad.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r}")
    return bad


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    json_path = None
    if "--json" in sys.argv:
        json_path = sys.argv[sys.argv.index("--json") + 1]

    spark_files = sorted(glob.glob(os.path.join(out_dir, "q145_token_hits",
                                                "*.parquet")))
    assert spark_files, f"no spark dump under {out_dir}/q145_token_hits"
    got = norm(pd.concat([pd.read_parquet(f) for f in spark_files]))

    docs = os.path.join(sf_dir, "documents.parquet")
    docs_src = f"{docs}/*.parquet" if os.path.isdir(docs) else docs

    work = tempfile.mkdtemp(prefix="q145-sf1-", dir="target")
    con = duckdb.connect(os.path.join(work, "hits.duckdb"))
    con.execute(f"PRAGMA temp_directory='{work}/spill'")
    con.execute("PRAGMA memory_limit='24GB'")
    con.execute("PRAGMA preserve_insertion_order=false")
    t0 = time.time()
    try:
        # tok -> e -> h0, each expression verbatim from CorpusOracles
        con.execute(f"""CREATE TABLE e AS
            SELECT DISTINCT src, dst FROM (
              SELECT doc_id AS src, unnest(string_split(text, ' ')) AS dst
              FROM read_parquet('{docs_src}'))""")
        con.execute(f"""CREATE TABLE h0 AS
            SELECT DISTINCT src, CAST({S} AS BIGINT) AS score FROM e""")
        print(f"e rows: {con.execute('SELECT count(*) FROM e').fetchone()[0]}"
              f"  ({time.time()-t0:.1f}s)", flush=True)
        for i in range(1, 5):
            con.execute(f"""CREATE TABLE a{i}r AS
                SELECT dst, CAST(sum(score) AS BIGINT) AS s
                FROM e JOIN h{i-1} USING (src) GROUP BY 1""")
            con.execute(f"""CREATE TABLE a{i} AS
                SELECT dst, CAST(s // (m // {S}) AS BIGINT) AS score
                FROM a{i}r, (SELECT max(s) AS m FROM a{i}r)""")
            con.execute(f"DROP TABLE a{i}r"); con.execute(f"DROP TABLE h{i-1}")
            if i < 4:
                con.execute(f"""CREATE TABLE h{i}r AS
                    SELECT src, CAST(sum(score) AS BIGINT) AS s
                    FROM e JOIN a{i} USING (dst) GROUP BY 1""")
                con.execute(f"""CREATE TABLE h{i} AS
                    SELECT src, CAST(s // (m // {S}) AS BIGINT) AS score
                    FROM h{i}r, (SELECT max(s) AS m FROM h{i}r)""")
                con.execute(f"DROP TABLE h{i}r"); con.execute(f"DROP TABLE a{i}")
            print(f"round {i} done ({time.time()-t0:.1f}s)", flush=True)
        want = norm(con.execute(
            """SELECT dst AS token, score AS auth_scaled FROM a4
               ORDER BY auth_scaled DESC, token""").fetchdf())
    finally:
        con.close()
        shutil.rmtree(work, ignore_errors=True)
    duck_sec = time.time() - t0

    bad = compare(got, want)
    if bad:
        print(f"FAIL q145_token_hits: " + "; ".join(bad[:4]))
        sys.exit(1)
    print(f"PASS q145_token_hits ({len(got)} rows) duck={duck_sec:.2f}s")
    if json_path:
        rep = json.load(open(json_path))
        rep["q145_token_hits"] = {
            "rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": len(got), "oracle_rows": len(want),
            "err": None, "duck_sec": round(duck_sec, 3),
            "note": ("oracle executed by tools/oracle_q145_sf1.py: the same "
                     "per-round SQL (expressions verbatim from CorpusOracles) "
                     "materialized SEQUENTIALLY in an on-disk DuckDB with "
                     "intermediates dropped per round — the one-statement CTE "
                     "form spilled >79 GB at sf1; this bounds the working set "
                     "to one join and hash-matches the engine dump")}
        meta = rep["_meta"]
        meta["attempted"] = meta.get("attempted", 34) + 0
        meta["pass"] = sum(1 for k, v in rep.items()
                           if k != "_meta" and v.get("hash_match"))
        meta["excluded"] = sum(1 for k, v in rep.items()
                               if k != "_meta" and v.get("excluded"))
        json.dump(rep, open(json_path, "w"), indent=1)
        print(f"patched {json_path}: pass={meta['pass']} "
              f"excluded={meta['excluded']}")


main()
