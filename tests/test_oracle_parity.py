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


def test_q25_oracle_parity_at_sf01_split_active(spark):
    """q25 is the one query whose SEMANTICS are scale-dependent: the
    adaptive bucket split (need_bits > 0) only fires once base buckets
    exceed NEARDUP_CAP, which first happens at sf0.1. The sf0.01 suite
    above never exercises that branch against the oracle, so pin it
    here — Spark's split-banded pipeline vs DuckDB's CTE replica at
    sf0.1, exact values."""
    import duckdb

    from oracle_utils import run_pair

    sf01 = "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS"
        f" SELECT * FROM '{sf01}/embeddings.parquet'"
    )
    try:
        run_pair(
            spark,
            con,
            sf01,
            QUERIES["q25_embedding_neardup"],
            ORACLES["q25_embedding_neardup"],
            "q25@sf0.1",
        )
    finally:
        con.close()


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
    assert len(seen) == len(QUERIES) == 122
