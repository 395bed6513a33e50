"""Scan / filter / projection queries (SURVEY §2.1, §2.3, §2.4).

q01_scan_count           S1+A1: full scan, count per event_type
q02_scan_filter_pushdown S2+S4: predicate+projection pushed into parquet scan
q05_filter_eq            F1: equality filter → commit detail rows
q06_filter_ge            F2+F5: range filter with null guard

Every query is a pure ``(spark, sf_dir) -> DataFrame`` (lazy; the driver
collects). Scale: all four are embarrassingly parallel scans — no
shuffle except q01's partial+final hash aggregate, whose map-side
combine reduces each partition to ≤5 rows before exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.readers import load_table
from .events_model import COMMIT_TYPE, RANK_SQL, commits, with_rank


def q01_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count events per type — the total_commits counter generalized to a
    grouped count (cli.py:290 / analyzer.go:97)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))


def q02_scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + narrow projection; Catalyst pushes both into the parquet
    reader (the automated analyzer.go:77-79 / lua:150-160 pattern).

    Detail rows out: raw column values, no arithmetic → bit-exact vs any
    oracle. Plan check (plans/inspect.py): PushedFilters must list the
    event_type and value predicates; ReadSchema must be 3 columns.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where((F.col("event_type") == "click") & (F.col("value") > 100.0))
        .select("event_id", "user_id", "value")
    )


def q05_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter to the commit slice + derived rank (cli.py:277)."""
    ev = load_table(spark, sf_dir, "events")
    return commits(ev).select("event_id", "user_id", "rank")


def q06_filter_ge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid selections: null guard then ``rank >= 0``
    (cli.py:285; analyzer.go:110-118 null-skip + >=0)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        commits(ev)
        .where(F.col("value").isNotNull() & (F.col("rank") >= 0))
        .select("event_id", "rank")
    )


QUERIES = {
    "q01_scan_count": q01_scan_count,
    "q02_scan_filter_pushdown": q02_scan_filter_pushdown,
    "q05_filter_eq": q05_filter_eq,
    "q06_filter_ge": q06_filter_ge,
}

ORACLE = {
    "q01_scan_count": """
        SELECT event_type, COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """,
    "q02_scan_filter_pushdown": """
        SELECT event_id, user_id, value
        FROM events WHERE event_type = 'click' AND value > 100.0
    """,
    "q05_filter_eq": f"""
        SELECT event_id, user_id, {RANK_SQL} AS rank
        FROM events WHERE event_type = '{COMMIT_TYPE}'
    """,
    "q06_filter_ge": f"""
        SELECT event_id, {RANK_SQL} AS rank
        FROM events
        WHERE event_type = '{COMMIT_TYPE}' AND value IS NOT NULL
          AND {RANK_SQL} >= 0
    """,
}
