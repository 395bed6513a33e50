"""Join / set-operation capability set (SURVEY §2.10-§2.11 extensions).

The reference implements no relational join (verified, SURVEY §2.10);
these are the Spark-native generalizations declared there:

q16_join_broadcast  fact ⋈ small dim with an explicit broadcast hint —
                    at 100 TB the dim side ships to every executor once
                    and the fact table never shuffles.
q17_join_multiway   customer ⋈ nation ⋈ region — a broadcast chain;
                    Catalyst reorders/collapses it into one stage.
q18_semi_anti       EXISTS / NOT EXISTS via left_semi / left_anti —
                    semi-joins carry only the key column and
                    short-circuit per match (no row multiplication).
q19_distinct_union  distinct-aggregate + UNION/INTERSECT counts.

Scale notes: all dim tables here stay ≪ broadcast threshold at any SF
(schemas.BROADCAST_DIMS); q18's semi/anti on (orders, lineitem) is the
one genuine shuffle pair — at 100 TB both sides are bucketed on
orderkey in the lake layout so it degenerates to a co-located join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.stable import dsum, dsum_expr
from ..sources.readers import load_table


def q16_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by part brand: lineitem ⋈ broadcast(part)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(disc_price, scale=6).alias("revenue"),
        )
    )


def q17_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers per region: customer ⋈ nation ⋈ region (broadcast chain)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", scale=2).alias("sum_acctbal"),
        )
    )


def q18_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with / without lineitems via left_semi / left_anti, one
    labeled count each (EXISTS / NOT EXISTS)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    semi = (
        orders.join(li, "o_orderkey", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(F.lit("semi").alias("side"), "n_orders")
    )
    anti = (
        orders.join(li, "o_orderkey", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(F.lit("anti").alias("side"), "n_orders")
    )
    return semi.unionAll(anti)


def q19_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user set algebra over the event stream: purchasers,
    clickers, their union and intersection — one row out."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select("user_id")
    c = ev.where(F.col("event_type") == "click").select("user_id")
    n_p = p.agg(F.countDistinct("user_id").alias("n_purchasers"))
    n_c = c.agg(F.countDistinct("user_id").alias("n_clickers"))
    n_u = (
        p.union(c).agg(F.countDistinct("user_id").alias("n_either"))
    )
    n_i = (
        p.distinct()
        .intersect(c.distinct())
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return n_p.crossJoin(n_c).crossJoin(n_u).crossJoin(n_i)


QUERIES = {
    "q16_join_broadcast": q16_join_broadcast,
    "q17_join_multiway": q17_join_multiway,
    "q18_semi_anti": q18_semi_anti,
    "q19_distinct_union": q19_distinct_union,
}

ORACLE = {
    "q16_join_broadcast": f"""
        SELECT p_brand, COUNT(*) AS n_items,
               {dsum_expr("l_extendedprice * (1 - l_discount)", scale=6)} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
    "q17_join_multiway": f"""
        SELECT r_name, COUNT(*) AS n_customers,
               {dsum_expr("c_acctbal", scale=2)} AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q18_semi_anti": """
        SELECT 'semi' AS side, COUNT(*) AS n_orders FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        UNION ALL
        SELECT 'anti' AS side, COUNT(*) AS n_orders FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    """,
    "q19_distinct_union": """
        SELECT
          (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'purchase')
            AS n_purchasers,
          (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'click')
            AS n_clickers,
          (SELECT COUNT(DISTINCT user_id) FROM events
             WHERE event_type IN ('purchase', 'click')) AS n_either,
          (SELECT COUNT(*) FROM
             (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
              INTERSECT
              SELECT DISTINCT user_id FROM events WHERE event_type = 'click'))
            AS n_both
    """,
}
