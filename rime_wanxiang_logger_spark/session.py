"""SparkSession factory.

Local-mode defaults are tuned for the test harness (local[N], one JVM);
every setting is also the right *shape* for a real cluster:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  join-strategy switching — the knobs that keep a 1000-executor plan
  healthy without hand-tuning per query.
- ``spark.sql.shuffle.partitions`` ≈ cores locally; on a cluster AQE
  coalesces from a high initial value, so the static number matters less.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (naive/UTC) and are deployment-independent.
- ``spark.sql.legacy.parquet.nanosAsLong``: the driver's ``events``
  table stores TIMESTAMP(NANOS) which Spark's vectorized parquet reader
  rejects; we read nanos as long and convert in the source layer
  (sources/readers.py) — a reader shim, not a data rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "rime_wanxiang_logger_spark",
    cores: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    n = cores or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # saveAsTable target for bucketed-layout tests (sources/layout.py);
        # keep it out of the repo tree.
        .config("spark.sql.warehouse.dir", "/tmp/rime_spark_warehouse")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Local-mode drains collect linear outputs to the driver (the
        # memory-sink harness); at sf80 q107's 4M-row result is
        # 1.17 GB serialized, over the 1 GB default. Static conf —
        # must be set at context build, not via ensure_session_conf.
        .config("spark.driver.maxResultSize", "4g")
        # see ensure_session_conf: demote 8–64 KB WSCG methods (which
        # HotSpot never JITs) to per-operator codegen
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine conf to an externally created
    session (the driver harness builds its own SparkSession)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Stateful streaming disables AQE, so the static setting matters:
    # default 200 over-parallelizes local mode badly.
    spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    # Align whole-stage-codegen demotion with HotSpot's JIT ceiling.
    # Spark's default (65535) only guards Janino's hard limit; HotSpot
    # refuses to JIT any method over 8000 bytecode bytes
    # (-XX:DontCompileHugeMethods, on by default), so a WSCG subtree
    # whose processNext() lands in 8–64 KB compiles fine and then runs
    # INTERPRETED forever. The engine's unrolled EMBED_DIM=64 vector
    # expressions (q66 rule — _dot/_norm, quantization, centroid
    # means) produce exactly such methods: q44's sf20 candidate
    # scoring burned 11,229 CPU-s interpreted (~100 µs/row) and
    # dropped ~20× once compiled. At 8000 Spark demotes those subtrees
    # to per-operator codegen, where single-expression projections
    # stay under the limit and JIT normally — measured 2.6× on q44 at
    # sf5 (80.5 s → 31.1 s). Cluster note: the same ceiling applies to
    # every executor JVM, so this is a conf fix, not a local-mode hack.
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
    return spark
