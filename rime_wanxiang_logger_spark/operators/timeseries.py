"""Time-series shaping operators over the event stream.

q61_resample_gapfill  dense hourly resampling per user: generate the
                      full hour grid between each user's first and last
                      event and left-join observed counts onto it —
                      gap buckets materialize with zeros (the shape
                      every downstream window/forecast model needs)
q62_scd2_intervals    slowly-changing-dimension type-2 build: each
                      (user, event_type) change event becomes a validity
                      interval [ts, next_ts) via lead(); the current row
                      has an open end — the standard warehouse pattern
                      for reconstructing state-as-of any time

Design for 100 TB:
- q61 generates the grid with `sequence()` + `explode` — grid size is
  data-driven per user (bounded by each user's own span), never a
  driver-side date loop; the observed-count join is per-user co-
  partitioned (both sides hash on user_id), so the only exchanges are
  the two groupBys and the join's co-partitioning.
- q62 is one window per (user) ordered by (ts, event_id): `lead` is
  O(1) state per row, one exchange, no self-join — at scale this runs
  per date partition with a carry row per key for cross-partition
  continuity.

Both are declared scale extensions (SURVEY §2.11b style) — the
reference carries timestamps but never aggregates over them
(SURVEY §2.9 T6) — oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..sources.readers import load_table

N_USERS_SAMPLE = 50  # bound the demo grid; the pattern is user-count-free


def q61_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly (user, hour, n_events) grid — zero rows for silent
    hours between a user's first and last event."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id") < N_USERS_SAMPLE
    )
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    observed = ev.groupBy("user_id", hour).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    spans = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h_min"),
        F.date_trunc("hour", F.max("ts")).alias("h_max"),
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("h_min", "h_max", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    return grid.join(observed, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


def q62_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 validity intervals: each event's value is current from its
    ts until the user's next event of the same type (NULL = still
    current). is_current flags the open row per key.

    valid_to is emitted as epoch MICROSECOND bigint, not timestamp: a
    nullable timestamp column degrades to ns-unit datetimes on the
    Arrow→pandas hop (NaT forces the ns path) while DuckDB stays µs —
    an exact-value comparator then sees 1000× integers. Integer epochs
    are unit-unambiguous across engines."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.col("value").alias("state_value"),
        F.col("ts").alias("valid_from"),
        F.unix_micros(nxt.cast("timestamp")).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


QUERIES = {
    "q61_resample_gapfill": q61_resample_gapfill,
    "q62_scd2_intervals": q62_scd2_intervals,
}

ORACLE = {
    "q61_resample_gapfill": f"""
        WITH ev AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
          WHERE user_id < {N_USERS_SAMPLE}
        ),
        observed AS (
          SELECT user_id, date_trunc('hour', ts) AS hour,
                 COUNT(*) AS n_events
          FROM ev GROUP BY 1, 2
        ),
        spans AS (
          SELECT user_id,
                 date_trunc('hour', MIN(ts)) AS h_min,
                 date_trunc('hour', MAX(ts)) AS h_max
          FROM ev GROUP BY user_id
        ),
        grid AS (
          SELECT user_id, unnest(generate_series(h_min, h_max,
                                                 INTERVAL 1 HOUR)) AS hour
          FROM spans
        )
        SELECT g.user_id, g.hour,
               COALESCE(o.n_events, 0) AS n_events
        FROM grid g LEFT JOIN observed o
          ON o.user_id = g.user_id AND o.hour = g.hour
    """,
    "q62_scd2_intervals": """
        SELECT user_id, event_type,
               value AS state_value,
               CAST(ts AS TIMESTAMP) AS valid_from,
               epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER (
                 PARTITION BY user_id, event_type
                 ORDER BY ts, event_id
               )) AS valid_to_us,
               lead(CAST(ts AS TIMESTAMP)) OVER (
                 PARTITION BY user_id, event_type
                 ORDER BY ts, event_id
               ) IS NULL AS is_current
        FROM events
    """,
}
