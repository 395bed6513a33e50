#!/usr/bin/env python
"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink (full compute incl.
every output column, no driver-collect overhead) after a session
warm-up, so timings reflect plan execution — the thing to optimize —
not JVM startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rime_wanxiang_logger_spark.operators import all_queries  # noqa: E402
from rime_wanxiang_logger_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("rime-wanxiang-bench")

    # Warm up the JVM / parquet footer caches with an untimed scan of
    # every table, so per-query timings measure plan execution rather
    # than whichever query alphabetically touches a file first.
    import glob

    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).count()

    # Warm the Python worker pool too (forked lazily on the first
    # Arrow/pandas stage; ~0.3 s/worker × local[32] would otherwise be
    # billed to whichever query hits mapInPandas first).
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # Best-of-2 per query: local[32] on a shared host has ~30%
    # run-to-run scheduler/GC noise; the min is the reproducible cost
    # of the plan itself.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name, fn in all_queries().items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings.get(name, dt), dt)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "sum_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
