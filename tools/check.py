#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run after
`sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`.
Compares each query parquet against its DuckDB oracle (rows, schema
names, exact values after sorting columns by name and rows by value).
Driver-side tooling only — not part of the shipped Scala library.
"""
import json
import sys

import duckdb
import pandas as pd

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracles.items()):
    if ONLY and name not in ONLY:
        continue
    try:
        spark_df = pd.read_parquet(f"{OUT}/{name}")
    except Exception as e:
        print(f"{name}: SPARK OUTPUT MISSING ({e})")
        fail += 1
        continue
    try:
        ora_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fail += 1
        continue

    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    o = ora_df.reindex(sorted(ora_df.columns), axis=1)
    msgs = []
    if list(s.columns) != list(o.columns):
        msgs.append(f"schema {list(s.columns)} != {list(o.columns)}")
    if len(s) != len(o):
        msgs.append(f"rows {len(s)} != {len(o)}")
    if not msgs:
        s2 = s.astype(str).apply(lambda r: "\x01".join(r), axis=1).sort_values().reset_index(drop=True)
        o2 = o.astype(str).apply(lambda r: "\x01".join(r), axis=1).sort_values().reset_index(drop=True)
        neq = (s2 != o2)
        if neq.any():
            i = neq.idxmax()
            msgs.append(f"values differ, first diff:\n  spark: {s2[i]!r}\n  oracle: {o2[i]!r}")
    if msgs:
        fail += 1
        print(f"{name}: FAIL — " + "; ".join(msgs))
    else:
        print(f"{name}: ok ({len(s)} rows)")

print(f"\n{'ALL OK' if fail == 0 else f'{fail} FAILURES'}")
sys.exit(1 if fail else 0)
