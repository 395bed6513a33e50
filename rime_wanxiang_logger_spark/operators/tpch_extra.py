"""Join/window shape pack (extensions; no reference citation —
§2.11b's relational surface widened with the four shapes it lacked).

q112_tpch_q7    volume shipping: revenue between two trading nations
                by supplier-nation × customer-nation × ship year —
                the double-dimension-alias join (the SAME dimension
                joined twice under different roles) with a disjunctive
                cross-filter, which none of Q2/Q3/Q5/Q16/Q17/Q18/Q21
                exercises.
q113_tpch_q20   the nested-IN-with-correlated-aggregate shape: ship
                only to suppliers who moved more than a threshold
                quantity of the target part class. (TPC-H proper walks
                partsupp; the driver schema has no partsupp table, so
                the inner correlated aggregate runs on lineitem — the
                decorrelation shape, agg→HAVING→semi-join, is
                identical.)
q114_full_outer_reconcile  the FULL OUTER join (no other query uses
                one): hourly click volume vs purchase volume with
                both-null sides surfaced as reconciliation statuses —
                the side-by-side ledger-diff idiom.
q115_range_frame_trailing  the interval RANGE window frame (every
                other window here is a ROWS frame or a peer frame):
                per event, the trailing-1-hour event count and exact
                value sum for the same user.

Scale design: q112/q113 broadcast every dimension; the only
corpus-scale shuffles are fact-side aggregates, and year extraction
happens AFTER the pushed date-range filter so the scan prunes on the
raw column (plan test). q114 joins two PRE-AGGREGATED hourly tables
(bounded by the time domain) — never a full-outer of raw facts. q115
is one exchange on user_id; the trailing sum is kept EXACT by summing
integer cents (a windowed float sum is evaluation-order-dependent —
DuckDB's segment tree vs Spark's running accumulator would diverge in
the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.stable import dsum, dsum_expr
from ..sources.readers import load_table

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_DATE_LO = "1995-01-01"
Q7_DATE_HI = "1998-01-01"

Q20_PART_PREFIX = "red"
Q20_QTY_THRESHOLD = 100.0
Q20_NATION = "NATION_3"


def q112_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional trade volume between two nations per ship year."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    two = nation.where(F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B))
    supp_n = supplier.join(
        F.broadcast(
            two.select(
                F.col("n_nationkey").alias("s_nk"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    cust_n = customer.join(
        F.broadcast(
            two.select(
                F.col("n_nationkey").alias("c_nk"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "cust_nation")
    shipped = li.where(
        (F.col("l_shipdate") >= F.lit(Q7_DATE_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q7_DATE_HI).cast("timestamp"))
    )
    joined = (
        shipped.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supp_n),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            cust_n, F.col("o_custkey") == F.col("c_custkey")
        )
        .where(
            (
                (F.col("supp_nation") == Q7_NATION_A)
                & (F.col("cust_nation") == Q7_NATION_B)
            )
            | (
                (F.col("supp_nation") == Q7_NATION_B)
                & (F.col("cust_nation") == Q7_NATION_A)
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "vol"
            ),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("vol", scale=4).alias("revenue"))
    )


def q113_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers (in one nation) who shipped more than the threshold
    total quantity of any single matching part — the Q20 nested
    correlated-aggregate membership test, decorrelated to
    aggregate → HAVING → left-semi join (the q54/q65 rule: Catalyst
    must never leave a per-row subquery in the physical plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    target_parts = part.where(
        F.col("p_name").startswith(Q20_PART_PREFIX)
    ).select("p_partkey")
    movers = (
        li.join(
            F.broadcast(target_parts),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > Q20_QTY_THRESHOLD)
        .select("l_suppkey")
        .distinct()
    )
    nat = nation.where(F.col("n_name") == Q20_NATION).select("n_nationkey")
    return (
        supplier.join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            movers,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )


def q114_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly click vs purchase volumes, FULL OUTER joined on the hour
    — hours where either side is silent surface as one-sided rows with
    an explicit status, the ledger-reconciliation idiom. The join runs
    on two pre-aggregated hourly tables (bounded by the time domain,
    never raw facts)."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts").cast("timestamp"))

    def hourly(kind: str, out: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == kind)
            .groupBy(hour.alias("h"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    clicks = hourly("click", "n_clicks")
    buys = hourly("purchase", "n_purchases")
    status = (
        F.when(F.col("n_clicks").isNull(), F.lit("purchases_only"))
        .when(F.col("n_purchases").isNull(), F.lit("clicks_only"))
        .otherwise(F.lit("both"))
    )
    return clicks.join(buys, "h", "full_outer").select(
        F.unix_micros(F.col("h").cast("timestamp")).alias("hour_us"),
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        status.alias("status"),
    )


TRAIL_US = 3_600_000_000  # 1 hour in microseconds


def q115_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: the same user's event count and EXACT value sum over
    the trailing hour — the interval RANGE frame (peers included by
    VALUE distance, not row position). The sum stays exact as integer
    cents; one exchange on user_id."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    from pyspark.sql import Window as W

    base = ev.select(
        "event_id",
        "user_id",
        us.alias("ts_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-TRAIL_US, 0)
    )
    return base.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum("cents").over(w).alias("cents_1h"),
    )


QUERIES = {
    "q112_tpch_q7": q112_tpch_q7,
    "q113_tpch_q20": q113_tpch_q20,
    "q114_full_outer_reconcile": q114_full_outer_reconcile,
    "q115_range_frame_trailing": q115_range_frame_trailing,
}

ORACLE = {
    "q112_tpch_q7": f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {dsum_expr("l_extendedprice * (1 - l_discount)", scale=4)}
                 AS revenue
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
            OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
          AND l_shipdate >= TIMESTAMP '{Q7_DATE_LO} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{Q7_DATE_HI} 00:00:00'
        GROUP BY 1, 2, 3
    """,
    "q113_tpch_q20": f"""
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = '{Q20_NATION}'
          AND s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '{Q20_PART_PREFIX}%'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(l_quantity) > {Q20_QTY_THRESHOLD}
          )
    """,
    "q114_full_outer_reconcile": """
        WITH clicks AS (
          SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                 COUNT(*) AS n_clicks
          FROM events WHERE event_type = 'click' GROUP BY 1
        ), buys AS (
          SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                 COUNT(*) AS n_purchases
          FROM events WHERE event_type = 'purchase' GROUP BY 1
        )
        SELECT epoch_us(COALESCE(c.h, b.h)) AS hour_us,
               COALESCE(c.n_clicks, 0) AS n_clicks,
               COALESCE(b.n_purchases, 0) AS n_purchases,
               CASE WHEN c.h IS NULL THEN 'purchases_only'
                    WHEN b.h IS NULL THEN 'clicks_only'
                    ELSE 'both' END AS status
        FROM clicks c FULL OUTER JOIN buys b ON b.h = c.h
    """,
    "q115_range_frame_trailing": f"""
        WITH base AS (
          SELECT event_id, user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
        )
        SELECT event_id, user_id, ts_us,
               COUNT(*) OVER w AS n_1h,
               CAST(SUM(cents) OVER w AS BIGINT) AS cents_1h
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN {TRAIL_US} PRECEDING AND CURRENT ROW)
    """,
}
