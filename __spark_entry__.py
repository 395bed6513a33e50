"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the reference's ``analyze`` accuracy
summary, SURVEY §3.1) over sf0.001.
``queries()`` — the full operator inventory (SURVEY §2 + LLM-pipeline
extensions), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB twin SQL per query (column names aligned).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rime_wanxiang_logger_spark.operators import all_oracles, all_queries
from rime_wanxiang_logger_spark.operators._stage_cache import sharing
from rime_wanxiang_logger_spark.operators.aggregates import q07_accuracy_summary
from rime_wanxiang_logger_spark.session import ensure_session_conf


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_session_conf(spark)
    return q07_accuracy_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    funcs = all_queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_conf(spark)
            # stage sharing: compositions (q72/q111/q116) reuse pinned
            # stage outputs their component queries produced earlier in
            # this session (operators/_stage_cache.py)
            with sharing():
                return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        return run

    return {name: _wrap(fn) for name, fn in funcs.items()}


def oracle_sql() -> dict[str, str]:
    return all_oracles()
