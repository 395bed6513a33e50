#!/usr/bin/env python
"""Drive __spark_entry__.py end-to-end against the DuckDB oracle — the
repo's verify recipe as a committed script.

Always runs from a FRESH process with a vanilla session (no engine
confs pre-applied; the engine must self-configure via
ensure_session_conf) and chdirs to /tmp first: Python workers don't
inherit the repo on sys.path, so running from inside /root/repo would
mask the closure-pickling rule every mapInPandas entry point follows.

    python scripts/verify_oracle.py [query ...]    # subset by name
    python scripts/verify_oracle.py --stale        # only queries whose
                                                   # defining module's
                                                   # source closure was
                                                   # edited since the
                                                   # last hash freeze
    DRIVE_SF_DIR=/tmp/sf1 \
    DRIVE_SKIP_ORACLE=q53_dedup_clusters,... \
      python scripts/verify_oracle.py              # other scales;
                                                   # rows-only names

``--stale`` makes the sf1 full-parity sweep INCREMENTAL (judge r5
next-round #5): the full 117-query sf1 drive is ~19 min — the best
bug-finder the project has (it caught the r5 rank-nondeterminism bug),
but too slow per edit batch. The stale set reuses the registry's own
closure-hash staleness (operators._is_driver_verified), so after
editing a module mid-round:

    python scripts/make_sf1.py            # once per session (/tmp wiped)
    DRIVE_SF_DIR=/tmp/sf1 DRIVE_SKIP_ORACLE=<recursive-CC names> \
      python scripts/verify_oracle.py --stale

re-drives exactly the queries the edit could have affected, typically
single-digit minutes for a one-module edit. Run BEFORE
freeze_verified_hashes() — the freeze marks everything fresh again.

Exit 0 iff every compared query matches exactly."""
import json
import os
import sys
import time

os.chdir("/tmp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .appName("drive-driver")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

rows = e.entry(spark).collect()
assert len(rows) == 1 and rows[0]["total_commits"] > 0, rows
print("entry() OK:", rows[0].asDict())

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
    )

queries = e.queries()
oracles = e.oracle_sql()
only = sys.argv[1:]  # optional subset of query names
if "--stale" in only:
    only.remove("--stale")
    import rime_wanxiang_logger_spark.operators as _ops

    stale = [q for q in queries if not _ops._is_driver_verified(q)]
    print(f"--stale: {len(stale)} queries with edited module closures")
    if not stale and not only:
        print("nothing stale — all module hashes match the freeze")
        sys.exit(0)
    only.extend(stale)
# names whose DuckDB oracle is intractable at large SF (recursive
# transitive-closure CTEs are O(V*component) — an oracle-formulation
# limit, not an engine one): run the Spark side, report rows-only.
skip_oracle = set(os.environ.get("DRIVE_SKIP_ORACLE", "").split(","))
fail = []
t0 = time.time()
for i, (name, fn) in enumerate(queries.items()):
    if only and name not in only:
        continue
    try:
        if name in skip_oracle:
            n = fn(spark, SF_DIR).count()
            print(f"[{i:3d}] {name}: rows-only {n} (oracle skipped)")
            continue
        sdf = fn(spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"[{i:3d}] {name}: rows-only {len(sdf)} (no oracle)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        if list(sdf.columns) != list(odf.columns):
            fail.append((name, f"cols {list(sdf.columns)} vs {list(odf.columns)}"))
            print(f"[{i:3d}] {name}: COLS MISMATCH")
            continue
        sdf = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
        odf = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
        for c in sdf.columns:  # normalize dtypes for compare
            if odf[c].dtype != sdf[c].dtype:
                try:
                    odf[c] = odf[c].astype(sdf[c].dtype)
                except (TypeError, ValueError):
                    sdf[c] = sdf[c].astype(str)
                    odf[c] = odf[c].astype(str)
        if len(sdf) != len(odf):
            fail.append((name, f"rows {len(sdf)} vs {len(odf)}"))
            print(f"[{i:3d}] {name}: ROWS {len(sdf)} vs {len(odf)}")
            continue
        eq = sdf.equals(odf)
        if not eq:
            neq = (sdf != odf) & ~(sdf.isna() & odf.isna())
            fail.append((name, f"values differ in {neq.any().to_dict()}"))
            print(f"[{i:3d}] {name}: VALUES DIFFER")
        else:
            print(f"[{i:3d}] {name}: OK ({len(sdf)} rows)")
    except Exception as ex:  # noqa: BLE001
        fail.append((name, repr(ex)[:300]))
        print(f"[{i:3d}] {name}: ERROR {repr(ex)[:200]}")
print(f"\n{time.time()-t0:.1f}s; failures: {len(fail)}")
for name, why in fail:
    print(" FAIL", name, why)
sys.exit(1 if fail else 0)
