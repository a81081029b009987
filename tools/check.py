#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only; the
engine itself is pure Scala/Spark).

Runs after `tools/run.sh graft.Verify <sfDir> <outDir>`:
for each query output parquet in <outDir>, executes the oracle SQL from
oracle_sql.json in DuckDB over the same table parquet files, sorts rows,
sorts columns by name, and value-compares.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    import os
    produced = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(os.path.join(out_dir, d)))
    for name in produced:
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = sorted(got_rel.columns)
        got = [tuple(norm(v) for v in row) for row in
               con.sql(f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall()]
        got.sort(key=repr)
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            continue
        exp_rel = con.sql(oracle[name])
        exp_cols = sorted(exp_rel.columns)
        exp = [tuple(norm(v) for v in row) for row in
               con.sql(f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall()]
        exp.sort(key=repr)
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            fail += 1
        elif got != exp:
            diffs = [(g, e) for g, e in zip(got, exp) if g != e]
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}; "
                  f"first diffs: {diffs[:3]}")
            fail += 1
        else:
            print(f"  ok {name} ({len(got)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail, "
          f"{len(produced) - ok - fail} oracle-less")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
