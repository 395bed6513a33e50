"""Deterministic floating-point aggregation helpers.

Distributed double sums are order-dependent: with AQE re-planning and
shuffle nondeterminism the same query can return values differing in the
last few ulps run-to-run — and they will not bit-match a single-threaded
oracle (DuckDB). SURVEY §7.3.3 flags this as a correctness-gate risk.

Engine discipline: aggregate doubles through a fixed-point DECIMAL
lattice. Per-row rounding double→decimal is deterministic (same input
double → same decimal in Spark and DuckDB; half-way collisions need the
double to be an exact decimal midpoint, which measured data never is),
and decimal addition is exact and associative — so the sum is identical
regardless of partitioning, parallelism or AQE decisions. The final cast
back to double is exact for the magnitudes involved.

This costs a few % over raw double sums and buys run-to-run AND
engine-to-engine bit-stability — the right trade for a correctness-gated
100 TB pipeline (same trick TPC-H kit uses: money is decimal).

Each helper has a twin emitting the equivalent ANSI SQL for the DuckDB
oracle, so Spark and oracle stay in lockstep by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 38) -> Column:
    """Order-insensitive SUM over a double column via DECIMAL(p,s)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6, precision: int = 38) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale, precision) / F.count(c)


def dsum_expr(sql_expr: str, scale: int = 2, precision: int = 38) -> str:
    """DuckDB-SQL twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg_expr(sql_expr: str, scale: int = 6, precision: int = 38) -> str:
    """DuckDB-SQL twin of :func:`davg`."""
    return f"({dsum_expr(sql_expr, scale, precision)} / COUNT({sql_expr}))"
