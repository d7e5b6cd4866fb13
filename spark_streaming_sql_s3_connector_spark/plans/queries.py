"""Relational query surface — SURVEY.md §2.B declared queries plus the
engine-native analytics the reference inherits from Spark.

Every entry returns a DataFrame whose column names match its DuckDB oracle
SQL exactly (the driver hash-compares values after sorting columns by
name). Scale notes are inline: broadcasts declared explicitly for dim
tables, aggregations rely on partial (map-side) aggregation, scans are
plain parquet reads so pushdown/pruning reach the file source.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_sql_s3_connector_spark.plans.io import load_table


@dataclass(frozen=True)
class QuerySpec:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle_sql: Optional[str]  # None → non-SQL-expressible (rows-only check)


# ---------------------------------------------------------------- §2.B ----


def _b1_scan_count(spark, sf):
    # B1 (csv capability is exercised in the streaming tests; the declared
    # correctness query is a count over lineitem)
    return load_table(spark, sf, "lineitem").agg(F.count("*").alias("cnt"))


def _b2_scan_distinct(spark, sf):
    li = load_table(spark, sf, "lineitem")
    return li.agg(
        F.count("*").alias("cnt"),
        F.countDistinct("l_orderkey").alias("distinct_orders"),
    )


def _b3_orders_count(spark, sf):
    return load_table(spark, sf, "orders").agg(F.count("*").alias("cnt"))


def _b4_projection(spark, sf):
    return (
        load_table(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


def _b5_filter(spark, sf):
    return (
        load_table(spark, sf, "lineitem")
        .where(F.col("l_quantity") > 25)
        .agg(F.count("*").alias("cnt"))
    )


def _b6_agg(spark, sf):
    return (
        load_table(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.sum("l_quantity").alias("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def _b7_join(spark, sf):
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    # nation is 25 rows at any SF: always broadcast — no shuffle of customer
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
        .orderBy("n_name")
    )


def _b8_partition_min_date(spark, sf):
    ev = load_table(spark, sf, "events")
    min_date = ev.agg(F.min(F.to_date("ts")).alias("d"))
    # scalar subquery via cross-join broadcast of a 1-row aggregate
    return (
        ev.withColumn("event_date", F.to_date("ts"))
        .join(F.broadcast(min_date), F.col("event_date") == F.col("d"))
        .agg(F.count("*").alias("cnt"))
    )


# ------------------------------------------------- engine-native extras ----


def _tpch_q1(spark, sf):
    # TPC-H Q1 pricing summary over lineitem: the map-side partial agg +
    # 6-group final agg is the canonical "would survive 100×" aggregation
    li = load_table(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       SUM(l_extendedprice) AS sum_base_price,
       SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       AVG(l_quantity) AS avg_qty,
       AVG(l_extendedprice) AS avg_price,
       AVG(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def _tpch_q3(spark, sf):
    # shipping-priority style 3-way join; orders/lineitem shuffle on the
    # join key, AQE picks broadcast if the filtered side is small
    cust = load_table(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_TPCH_Q3_SQL = """
SELECT l_orderkey,
       SUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def _tpch_q5ish(spark, sf):
    # star join over 6 tables; dims broadcast, facts shuffle once
    region = load_table(spark, sf, "region")
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    sup = load_table(spark, sf, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("r_name")
    )


_TPCH_Q5ISH_SQL = """
SELECT r_name,
       SUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def _window_top_orders(spark, sf):
    from pyspark.sql.window import Window

    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    )


_WINDOW_TOP_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, rn
FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
ORDER BY o_custkey, rn
"""


def _rollup_sales(spark, sf):
    li = load_table(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.sum("l_quantity").alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


_ROLLUP_SALES_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def _events_by_type_hour(spark, sf):
    # streaming-shaped agg run in batch: tumbling 1h windows over event time;
    # output ints/strings only (stable hashing across engines)
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("string").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("hour", "event_type")
    )


_EVENTS_BY_TYPE_HOUR_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, COUNT(*) AS cnt
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def _semi_anti_join(spark, sf):
    # customers with no big-ticket order (anti join) counted per nation
    cust = load_table(spark, sf, "customer")
    big = load_table(spark, sf, "orders").where(F.col("o_totalprice") > 450000)
    nation = load_table(spark, sf, "nation")
    no_big = cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
    return (
        no_big.join(F.broadcast(nation), no_big.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
        .orderBy("n_name")
    )


_SEMI_ANTI_JOIN_SQL = """
SELECT n_name, COUNT(*) AS cnt
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
GROUP BY n_name
ORDER BY n_name
"""


RELATIONAL_QUERIES: dict[str, QuerySpec] = {
    "b1_lineitem_count": QuerySpec(_b1_scan_count, "SELECT COUNT(*) AS cnt FROM lineitem"),
    "b2_lineitem_distinct": QuerySpec(
        _b2_scan_distinct,
        "SELECT COUNT(*) AS cnt, COUNT(DISTINCT l_orderkey) AS distinct_orders FROM lineitem",
    ),
    "b3_orders_count": QuerySpec(_b3_orders_count, "SELECT COUNT(*) AS cnt FROM orders"),
    "b4_projection": QuerySpec(
        _b4_projection,
        "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100",
    ),
    "b5_filter": QuerySpec(
        _b5_filter, "SELECT COUNT(*) AS cnt FROM lineitem WHERE l_quantity > 25"
    ),
    "b6_agg": QuerySpec(
        _b6_agg,
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    ),
    "b7_join": QuerySpec(
        _b7_join,
        "SELECT n_name, COUNT(*) AS cnt FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name ORDER BY n_name",
    ),
    "b8_partition_min_date": QuerySpec(
        _b8_partition_min_date,
        "SELECT COUNT(*) AS cnt FROM events "
        "WHERE CAST(ts AS DATE) = (SELECT MIN(CAST(ts AS DATE)) FROM events)",
    ),
    "tpch_q1": QuerySpec(_tpch_q1, _TPCH_Q1_SQL),
    "tpch_q3": QuerySpec(_tpch_q3, _TPCH_Q3_SQL),
    "tpch_q5ish": QuerySpec(_tpch_q5ish, _TPCH_Q5ISH_SQL),
    "window_top_orders": QuerySpec(_window_top_orders, _WINDOW_TOP_ORDERS_SQL),
    "rollup_sales": QuerySpec(_rollup_sales, _ROLLUP_SALES_SQL),
    "events_by_type_hour": QuerySpec(_events_by_type_hour, _EVENTS_BY_TYPE_HOUR_SQL),
    "semi_anti_join": QuerySpec(_semi_anti_join, _SEMI_ANTI_JOIN_SQL),
}
