"""Mapping of the reference's event-log semantics onto the driver's
``events`` table (FIXTURES.md §B).

The driver's synthetic ``events(event_id, ts, user_id, event_type,
value, props)`` stands in for the rime JSONL log:

- ``event_type = 'purchase'`` plays ``text_committed`` (the fact rows);
- ``user_id`` plays the session key;
- ``value`` (double, ~U[0,330]) is deterministically mapped to the
  ``selected_candidate_rank`` analog::

      rank = CAST(FLOOR(value) AS BIGINT) % 8 - 1        ∈ {-1, 0, …, 6}

  reproducing the reference's rank domain: ``-1`` = direct-commit
  sentinel (input_habit_logger.lua:222), ``0`` = first choice
  (cli.py:291), ``rank < 3`` = top-3 (cli.py:292, strictly ``< 3``).
- ``props`` (JSON string) plays the preset-pruned payload.

Both the Spark expression and the SQL twin below derive the rank
identically, so the DuckDB oracle sees bit-equal values (FLOOR of a
double and integer %, both exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

COMMIT_TYPE = "purchase"

RANK_SQL = "(CAST(FLOOR(value) AS BIGINT) % 8 - 1)"


def rank_col() -> Column:
    return (F.floor("value").cast("bigint") % 8 - 1).alias("rank")


def with_rank(df: DataFrame) -> DataFrame:
    return df.withColumn("rank", rank_col())


def commits(events: DataFrame) -> DataFrame:
    """The ``text_committed`` analog slice with derived rank (F1 + P3).

    The equality predicate is declared post-scan and pushed into the
    parquet reader by Catalyst — the automatic version of the filter the
    Go scanner hand-places inside its read loop (analyzer.go:77-79).
    """
    return with_rank(events.where(F.col("event_type") == COMMIT_TYPE))
