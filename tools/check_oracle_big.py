#!/usr/bin/env python3
"""check_oracle.py variant for LARGE ScaleUp corpora (sf1.0+).

Differences from the driver-parity checker:
 - a FRESH DuckDB connection per query (an OOM on one heavy oracle must
   not poison the rest of the sweep);
 - an explicit memory limit + on-disk spill dir so DuckDB grace-spills
   instead of dying;
 - optional query-subset argument (comma-separated) for re-runs;
 - optional JSON artifact (driver CORRECTNESS schema) written
   incrementally after every query and MERGED with any existing file,
   so a subset re-run updates its entries without clobbering the rest
   and a crashed sweep keeps its partial results.

Usage: python3 tools/check_oracle_big.py <sfDir> <verifyOutDir> [names] [jsonOut]
"""
import json
import os
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns)).index
    return s.loc[order].reset_index(drop=True)


def fresh_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='/root/repo/target/duck_spill'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def main(sf_dir: str, out_dir: str, names=None, json_out=None) -> int:
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if names:
        oracle = {n: oracle[n] for n in names.split(",")}
    report = {}
    if json_out and os.path.exists(json_out):
        with open(json_out) as f:
            report = json.load(f)  # merge-on-write: subset re-runs update

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err):
        if not json_out:
            return
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}
        tmp = json_out + ".tmp"
        with open(tmp, "w") as f:  # incremental: survive a crashed sweep
            json.dump(dict(sorted(report.items())), f, indent=2)
        os.replace(tmp, json_out)

    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output", flush=True)
            record(name, False, False, False, 0, None, "no spark output")
            failures += 1
            continue
        con = fresh_con(sf_dir)
        try:
            duck = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}", flush=True)
            record(name, False, False, False, None, None, f"duckdb error {e}")
            failures += 1
            continue
        finally:
            con.close()
        spark = pd.concat([pd.read_parquet(p) for p in sorted(spark_files)])
        a, b = canon(spark), canon(duck)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}",
                  flush=True)
            record(name, len(a) == len(b), False, False, len(a), len(b), None)
            failures += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}", flush=True)
            record(name, False, True, False, len(a), len(b), None)
            failures += 1
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(a)} differing rows; first:",
                  flush=True)
            idx = neq.idxmax()
            print("  spark:", a.loc[idx].to_dict(), flush=True)
            print("  duck :", b.loc[idx].to_dict(), flush=True)
            record(name, True, True, False, len(a), len(b), None)
            failures += 1
        else:
            print(f"OK   {name}: {len(a)} rows", flush=True)
            record(name, True, True, True, len(a), len(b), None)
    print(f"{len(oracle) - failures}/{len(oracle)} queries match", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None,
                  sys.argv[4] if len(sys.argv) > 4 else None))
