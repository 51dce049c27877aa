#!/usr/bin/env python3
"""Spot-check named queries against their DuckDB oracles without a full
Verify pass. Mirrors check_oracle.py's canon/compare.

Usage: python3 scripts/spot_check.py <query> [<query>...] [--sf 0.01]
       add --skip-verify to reuse the last dump in /tmp/spotcheck
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

argv = sys.argv[1:]
SF = "0.01"
if "--sf" in argv:
    i = argv.index("--sf")
    if i + 1 >= len(argv):
        sys.exit("usage: spot_check.py <query>... [--sf 0.01] [--skip-verify]")
    SF = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]  # drop the flag AND its value only
names = [a for a in argv if not a.startswith("-")]
SFDIR = f"/root/testdata/sf{SF}"
OUT = Path("/tmp/spotcheck")

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "--client",
         f"runMain graft.tools.VerifyOne {SFDIR} {OUT} " + " ".join(names)],
        capture_output=True, text=True, cwd="/root/repo")
    if "success" not in r.stdout:
        print(r.stdout[-4000:], r.stderr[-2000:])
        sys.exit("verify-one run failed")

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracles = json.loads((OUT / "oracle_sql.json").read_text())


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype(float)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    scalar = [c for c in df.columns if df[c].dtype.kind != "O"
              or df[c].map(lambda v: not isinstance(
                  v, (list, tuple)) and not hasattr(v, "__len__")
                  or isinstance(v, str)).all()]
    by = list(scalar)
    extra = []
    for c in df.columns:
        if c not in scalar:
            key = f"_sortkey_{c}"
            df[key] = df[c].map(
                lambda v: str(list(v)) if v is not None and not isinstance(
                    v, str) and hasattr(v, "__iter__") else str(v))
            extra.append(key)
    out = df.sort_values(by=by + extra).reset_index(drop=True)
    return out.drop(columns=extra)


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(b))
    return str(a) == str(b)


fail = 0
for name in names:
    if name not in oracles:
        print(f"SKIP {name}: no oracle registered")
        continue
    spark_df = canon(con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df())
    try:
        duck_df = canon(con.execute(oracles[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fail += 1
        continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
        fail += 1
        continue
    kinds_a = [spark_df[c].dtype.kind for c in spark_df.columns]
    kinds_b = [duck_df[c].dtype.kind for c in duck_df.columns]
    if kinds_a != kinds_b:
        mism = [(c, a, b) for c, a, b in
                zip(spark_df.columns, kinds_a, kinds_b) if a != b]
        print(f"FAIL {name}: dtype kinds differ: {mism}")
        fail += 1
        continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
        fail += 1
        continue
    bad = None
    for c in spark_df.columns:
        for i, (x, y) in enumerate(zip(spark_df[c].tolist(),
                                       duck_df[c].tolist())):
            if not values_equal(x, y):
                bad = (c, i, x, y)
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: col {bad[0]} row {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
        fail += 1
    else:
        print(f"PASS {name} ({len(spark_df)} rows)")
sys.exit(1 if fail else 0)
