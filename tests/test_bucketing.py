"""Bucketed-layout co-located joins: the disk-layout strategy that
deletes the shuffle from repeated fact-fact joins at 100 TB.

The engine's query plane assumes AQE picks join strategies at runtime;
this suite pins the complementary LAYOUT claim the docs make (SURVEY
§7.3): if the two fact tables are written bucketed (and sorted) on the
join key with equal bucket counts, Spark's scan reports the hash
partitioning and the sort-merge join needs NO Exchange on either side
— the join cost becomes a local merge per bucket. At cluster scale
this is the difference between re-shuffling 100 TB per join and
reading co-located buckets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rime_wanxiang_logger_spark.plans import explain_str
from rime_wanxiang_logger_spark.sources.readers import load_table

N_BUCKETS = 8


@pytest.fixture()
def no_broadcast(spark):
    """Force non-broadcast joins so the bucketing claim is what's
    actually tested (sf0.01 facts would otherwise broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_fact_join_has_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    for name, df, key in (
        ("b_orders", orders, "o_orderkey"),
        ("b_lineitem", lineitem, "l_orderkey"),
    ):
        (
            df.write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bo.join(
            bl, bo.o_orderkey == bl.l_orderkey
        ).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
        )
        plan = explain_str(joined)
        pre_agg = plan.split("HashAggregate")[-1]  # below the agg:
        # the join and both scans — no Exchange may appear there
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in pre_agg, plan
        # bucketed + sortBy: per-bucket files are pre-sorted, but Spark
        # only elides the Sort when each bucket is a single file; the
        # load-bearing claim is the absent Exchange (the 100 TB cost).

        # values must equal the plain (shuffled) join
        plain = (
            orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_aggregation_reuses_layout(spark, sf_dir, tmp_path, no_broadcast):
    """A groupBy on the bucket key must also run exchange-free — the
    same layout amortizes joins AND aggregations."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    (
        lineitem.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_li2"))
        .saveAsTable("b_li2")
    )
    try:
        agg = (
            spark.table("b_li2")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = explain_str(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() == lineitem.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li2")


def test_partitioned_layout_prunes_scan(spark, sf_dir, tmp_path):
    """Hive-partitioned layout (SURVEY §4.3): documents written
    partitionBy(lang) must answer a single-lang query by LISTING ONLY
    that partition — the plan's PartitionFilters carry the predicate
    and the row count matches the unpartitioned filter. At 100 TB this
    is the difference between scanning one language's shard and the
    whole corpus."""
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    part = spark.read.parquet(out).where(F.col("lang") == "de")
    plan = explain_str(part)
    # the predicate lands in PartitionFilters (directory pruning) ...
    part_filters = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "= de)" in part_filters, plan
    # ... and lang is a directory key, absent from the data-file schema
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "lang" not in read_schema, plan
    got = part.count()
    want = docs.where(F.col("lang") == "de").count()
    assert got == want > 0


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's skew-join handling is the engine's declared answer to hot
    keys (SURVEY §2.11b q49 doc) — prove it fires: a join with one
    dominant key, thresholds lowered to toy scale, must show skew
    handling in the final adaptive plan and still produce exact
    counts."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 400_000).selectExpr(
            "CASE WHEN id % 10 < 8 THEN 0 ELSE id END AS k", "id AS v"
        )
        right = spark.range(0, 50).selectExpr("id AS k", "id * 2 AS w")
        joined = left.join(right, "k")
        # run the DF's OWN query execution (count() would finalize a
        # different plan tree and leave this one isFinalPlan=false)
        n = len(joined.collect())
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final
        # exact expectation replayed from the construction
        want = sum(
            1
            for i in range(400_000)
            if (0 if i % 10 < 8 else i) < 50
        )
        assert n == want, (n, want)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
