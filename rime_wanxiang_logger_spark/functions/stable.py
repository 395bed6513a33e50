"""Deterministic floating-point aggregation helpers.

Distributed double sums are order-dependent: with AQE re-planning and
shuffle nondeterminism the same query can return values differing in the
last few ulps run-to-run — and they will not bit-match a single-threaded
oracle (DuckDB). SURVEY §7.3.3 flags this as a correctness-gate risk.

Engine discipline: aggregate doubles through a fixed-point lattice.
Each value is rounded once to ``scale`` decimal places via
``floor(x·10^scale + 0.5)`` — the SAME IEEE double multiply/add/floor
sequence in Spark and DuckDB, so the scaled integers are bit-identical
across engines by construction — then summed as a *scaled 64-bit
integer*: integer addition is exact and associative, so the sum is
identical regardless of partitioning, parallelism or AQE decisions.
The final divide back to double is one deterministic operation on the
exact integer total.

Why floor(+0.5) and not round(): Spark's ``round(double, 0)`` detours
through BigDecimal HALF_UP — measured 5× slower in the aggregate hot
loop (TPC-H Q1 rollup at sf0.1: 1.8 s vs 0.4 s) — and BigDecimal
rounding of the *decimal* expansion can disagree with any pure-double
formula by 1 ulp on adversarial values, which a hash-compared oracle
cannot tolerate. floor(+0.5) is half-toward-+inf for negatives (vs
round's half-away-from-zero); both engines apply the same formula, so
the oracle agrees bit-for-bit either way.

Why scaled BIGINT and not DECIMAL(38,s): both are exact, but Spark's
decimal sum with precision > 18 leaves the long-backed fast path and
pays ~5× in the aggregate hot loop (measured on TPC-H Q1 shape at
sf0.1: 3.8 s vs 0.8 s double / 1.6 s scaled-long). Long sums stay
inside whole-stage codegen.

Value envelope: requires ``|x| · 10^scale · n_rows_per_group < 2^63``
(9.2e18). At scale=6 over money-sized values (~1e5) that is ~1e8 rows
per GROUP; pipelines beyond that envelope (e.g. global sums over 1e11
rows) should drop to ``scale=2`` or two-level aggregation (sum within
date partition, then sum of sums — both exact). DuckDB's BIGINT sum
widens to HUGEINT so the oracle side never overflows first.

Each helper has a twin emitting the equivalent ANSI SQL for the DuckDB
oracle, so Spark and oracle stay in lockstep by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-insensitive SUM over a double column via scaled BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    scaled = F.floor(c * F.lit(float(10**scale)) + F.lit(0.5)).cast("bigint")
    return (F.sum(scaled).cast("double") / F.lit(float(10**scale))).cast(
        "double"
    )


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-insensitive AVG: exact scaled-int sum / count, divided in
    double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dsum_expr(sql_expr: str, scale: int = 2) -> str:
    """DuckDB-SQL twin of :func:`dsum`."""
    m = float(10**scale)
    return (
        f"(CAST(SUM(CAST(floor(({sql_expr}) * {m} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {m})"
    )


def davg_expr(sql_expr: str, scale: int = 6) -> str:
    """DuckDB-SQL twin of :func:`davg`."""
    return f"({dsum_expr(sql_expr, scale)} / COUNT({sql_expr}))"
