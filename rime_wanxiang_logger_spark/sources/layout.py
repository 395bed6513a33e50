"""Physical data layout for the 100 TB lake (SURVEY §4.3).

The test parquet is flat files; at scale the same tables are laid out
so the engine's queries prune and co-locate instead of scanning and
shuffling:

- ``write_events_partitioned``: events partitioned by ``event_date``
  (hive-style directories). Every date/time predicate then prunes whole
  partitions BEFORE any IO — the scan's ``PartitionFilters`` — which is
  the lake-scale analog of the producer-side event filtering the
  reference hand-codes (input_habit_logger.lua:131-148).
- ``write_bucketed``: hash-bucketed + sorted-within-bucket table via
  ``bucketBy().sortBy().saveAsTable()``. Two tables bucketed on the
  same key with the same bucket count join WITHOUT an exchange on
  either side — the shuffle for fact⋈fact joins (the one join class
  that cannot broadcast) is paid once at write time, not per query.
- ``cluster_within_partitions``: sortWithinPartitions on the filter
  columns — poor-man's Z-order: parquet row-group min/max stats become
  selective so row groups skip (the reference's within-file analog is
  none; it scans everything).

All three are write-side utilities: the read-side queries in
``operators/`` need no change to benefit (Catalyst picks up partition
pruning, bucket join elimination and row-group skipping automatically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_events_jsonl(events: DataFrame, path: str, mode: str = "append") -> None:
    """K1 sink twin: one JSON object per event, append-mode — the
    reference producer's ``io.open(path, "a")`` + one line per event
    (input_habit_logger.lua:166-176). Timestamps serialize in the
    producer's ISO-8601-with-ms UTC format (lua:166-167); null fields
    are suppressed exactly as the producer's config-driven field
    pruning never writes them (lua:150-163)."""
    (
        events.write.mode(mode)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSX")
        .option("ignoreNullFields", True)
        .json(path)
    )


def write_events_partitioned(events: DataFrame, path: str) -> None:
    """Write the event stream date-partitioned (event_date derived from
    ts); the layout every time-ranged query prunes on."""
    (
        events.withColumn("event_date", F.to_date("ts"))
        .repartition("event_date")  # one writer wave per partition
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed on ``key`` (sorted within buckets)
    so same-key same-bucket-count joins skip the exchange entirely."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(sort_by or key)
    )
    w.saveAsTable(table_name)


def cluster_within_partitions(df: DataFrame, *cols: str) -> DataFrame:
    """Sort rows inside each partition on the hot filter columns so
    parquet row-group stats prune (write with .parquet after)."""
    return df.sortWithinPartitions(*cols)
