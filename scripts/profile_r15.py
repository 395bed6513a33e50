#!/usr/bin/env python
"""r15 optimization profiler (guide §1): per query, decompose wall into

- build_s: the ``fn(spark, sf_dir)`` call — plan construction including
  any driver-side governor collects / CC fixpoints / stream drains;
- analyze_s: optimizer+physical planning (explainString(formatted));
- exec_s: min-of-2 noop-sink materializations of the returned plan.

Writes plans/r15/<query>_before.txt (or _after.txt with --after) and a
JSON summary to /tmp/profile_r15_{before,after}.json. Bench-identical
session + warm-up so the numbers line up with bench_full.json.
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rime_wanxiang_logger_spark.operators import all_queries  # noqa: E402
from rime_wanxiang_logger_spark.operators._stage_cache import (  # noqa: E402
    sharing,
)
from rime_wanxiang_logger_spark.session import get_spark  # noqa: E402

TAG = "after" if "--after" in sys.argv else "before"
ONLY = [a for a in sys.argv[1:] if not a.startswith("--")]
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)
os.makedirs(PLAN_DIR, exist_ok=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-r15")
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).count()
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out: dict[str, dict] = {}
    with sharing():
        for name, fn in all_queries().items():
            if ONLY and name not in ONLY and name.split("_", 1)[0] not in ONLY:
                continue
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            build = time.perf_counter() - t0
            t0 = time.perf_counter()
            plan = df._jdf.queryExecution().explainString(mode)
            analyze = time.perf_counter() - t0
            execs = []
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                execs.append(time.perf_counter() - t0)
            out[name] = {
                "build_s": round(build, 3),
                "analyze_s": round(analyze, 3),
                "exec_s": round(min(execs), 3),
                "n_exchange": plan.count("Exchange"),
                "n_python": sum(
                    plan.count(k)
                    for k in ("BatchEvalPython", "ArrowEvalPython",
                              "MapInPandas", "FlatMapGroupsInPandas")
                ),
            }
            with open(
                os.path.join(PLAN_DIR, f"{name}_{TAG}.txt"), "w"
            ) as f:
                f.write(plan)
            print(
                f"{name}: build={build:.2f} analyze={analyze:.2f} "
                f"exec={min(execs):.2f} exch={out[name]['n_exchange']}",
                flush=True,
            )
    with open(f"/tmp/profile_r15_{TAG}.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
