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


def test_registry_paired_and_unshadowed():
    """Every registered query carries an oracle (the driver's strong
    gate), and no module shadows another's query name (dict.update in
    the registry would do it silently)."""
    from rime_wanxiang_logger_spark import operators as ops

    assert set(ORACLES) == set(QUERIES)
    seen: dict[str, str] = {}
    for m in ops._MODULES:
        for name in m.QUERIES:
            assert name not in seen, f"{name} in both {seen[name]} and {m.__name__}"
            seen[name] = m.__name__
    assert len(seen) == len(QUERIES) == 86
