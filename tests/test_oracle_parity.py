"""Differential tests: every registered query vs its DuckDB oracle at
SF_DIR (default sf0.01) — the driver's t2 gate, run locally and
stricter (exact value equality, not just hash match).
"""

from __future__ import annotations

import pytest

from rime_wanxiang_logger_spark.operators import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    from oracle_utils import run_pair

    pdf = run_pair(spark, duck, sf_dir, QUERIES[name], ORACLES[name], name)
    assert len(pdf) >= 0


def test_every_query_runs_and_has_rows(spark, sf_dir):
    """Queries without an oracle still must run and return a schema."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["total_commits"] > 0
    assert set(e.oracle_sql()) <= set(e.queries())
