"""Differential-test comparator: Spark result vs DuckDB oracle.

Mirrors the driver's t2 check (row-count + column set + order-insensitive
values), but stricter: values must be EXACTLY equal after sorting —
if this passes, any value-hash the driver computes matches too.
"""

from __future__ import annotations

import math

import pandas as pd


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, (
                    f"{name}.{col}[{i}]: {x!r} != {y!r} (diff={x - y:.3e})"
                )
            else:
                if pd.isna(x) and pd.isna(y):
                    continue
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"


def run_pair(spark, duck, sf_dir, query_fn, sql, name):
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.sql(sql).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)
    return spark_pdf
