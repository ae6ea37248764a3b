#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB differential check.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each
<outDir>/<name>.parquet (the Spark result), executes the matching oracle SQL
from <outDir>/oracle_sql.json in DuckDB over the same source tables, and
compares row count, column names, and values (exact, after sorting columns by
name and rows by all columns). Every query is expected to have an oracle;
a query directory without one still gets a rows-only (>0) check, and any
name in <outDir>/queries.txt with no output directory counts as a failure
(the query crashed in Verify).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    import glob
    import os
    names = sorted(os.path.basename(p)[:-8] if p.endswith(".parquet") else os.path.basename(p)
                   for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    failures = 0
    # A query that threw in Verify writes no output dir — count it as a
    # failure instead of silently skipping it (every oracle key must have a
    # matching Spark dump; rows-only queries are caught by the name list the
    # caller can pass via GRAFT_EXPECTED_QUERIES, newline-separated).
    missing = sorted(set(oracle) - set(names))
    expected_file = os.environ.get("GRAFT_EXPECTED_QUERIES",
                                   f"{out_dir}/queries.txt")
    if expected_file and os.path.exists(expected_file):
        expected = {l.strip() for l in open(expected_file) if l.strip()}
        missing = sorted(set(missing) | (expected - set(names)))
    for name in missing:
        print(f"FAIL {name}: no Spark output dir (query crashed in Verify?)")
        failures += 1
    for name in names:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        if name not in oracle:
            ok = len(spark_df) > 0
            print(f"{'OK  ' if ok else 'FAIL'} {name}: rows-only, {len(spark_df)} rows")
            failures += 0 if ok else 1
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        s_cols, o_cols = sorted(spark_df.columns), sorted(odf.columns)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} oracle={o_cols}")
            failures += 1
            continue
        if len(spark_df) != len(odf):
            print(f"FAIL {name}: rows differ spark={len(spark_df)} oracle={len(odf)}")
            failures += 1
            continue
        s = spark_df[s_cols].sort_values(s_cols).reset_index(drop=True)
        o = odf[o_cols].sort_values(o_cols).reset_index(drop=True)
        s = s.astype(str)
        o = o.astype(str)
        if s.equals(o):
            print(f"OK   {name}: {len(spark_df)} rows")
        else:
            neq = (s != o).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(s)} rows differ; first diffs:")
            print(s[neq].head(3).to_string())
            print(o[neq].head(3).to_string())
            failures += 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(names)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
