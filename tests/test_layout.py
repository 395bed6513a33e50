"""Physical-layout tests: the write-side structures that make the
read-side plans prune and co-locate at lake scale (SURVEY §4.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rime_wanxiang_logger_spark.plans import explain_str
from rime_wanxiang_logger_spark.sources.layout import (
    write_bucketed,
    write_events_partitioned,
)
from rime_wanxiang_logger_spark.sources.readers import load_table

SMALL_SF = "/root/testdata/sf0.001"


def test_partitioned_events_prune_by_date(spark, tmp_path):
    ev = load_table(spark, SMALL_SF, "events")
    path = str(tmp_path / "events_by_date")
    write_events_partitioned(ev, path)

    part = spark.read.parquet(path)
    one_day = part.where(F.col("event_date") == "2024-01-05")

    plan = explain_str(one_day)
    assert "PartitionFilters" in plan and "event_date" in plan, plan
    # pruning must not change results: same rows as the unpartitioned
    # filter on the derived date
    expected = ev.where(F.to_date("ts") == "2024-01-05").count()
    assert expected > 0
    assert one_day.count() == expected


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SMALL_SF, "orders")
    cust = load_table(spark, SMALL_SF, "customer")
    write_bucketed(orders, "t_orders_b", "o_custkey", 4)
    write_bucketed(cust, "t_cust_b", "c_custkey", 4)
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_cust_b").hint("merge")  # forbid broadcast
        joined = a.join(b, a.o_custkey == b.c_custkey).select(
            "o_orderkey", "c_name"
        )
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        assert joined.count() == orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_jsonl_sink_append_roundtrip(spark, tmp_path):
    """K1 sink: JSONL out, JSONL back in — append mode accumulates
    (the reference's io.open("a") semantics), and every event_id
    survives the round trip."""
    ev = load_table(spark, SMALL_SF, "events")
    path = str(tmp_path / "events_jsonl")
    from rime_wanxiang_logger_spark.sources.layout import write_events_jsonl

    write_events_jsonl(ev, path)
    back = spark.read.json(path)
    assert back.count() == ev.count()
    assert (
        back.select("event_id").exceptAll(ev.select("event_id")).count() == 0
    )
    write_events_jsonl(ev, path)  # append again → doubles
    assert spark.read.json(path).count() == 2 * ev.count()
