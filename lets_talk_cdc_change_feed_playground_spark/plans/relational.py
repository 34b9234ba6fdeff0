"""General relational query surface over the TPC-H-ish testdata.

The reference has no SQL engine of its own (its joins live inside the diff /
verification operators — see SURVEY.md §2.7), but the judged correctness
corpus exercises a full relational surface over the driver tables. These
queries are written DataFrame-first so Catalyst handles pushdown, pruning and
join planning.

Scale policy (100 TB design point):
- Only ``region`` and ``nation`` are unconditionally broadcast: they are
  fixed-size at every scale factor. ``customer``/``supplier``/``part`` grow
  linearly with SF, so their joins are left to AQE + the 64 MB
  autoBroadcastJoinThreshold (broadcast when genuinely small, shuffle join
  otherwise) — a forced hint would OOM executors at scale.
- Global top-k never uses an unpartitioned row_number window (single-task
  sort): ``orderBy(...).limit(k)`` with a total tiebreak order executes as a
  distributed TakeOrderedAndProject.

Determinism rules for the DuckDB-oracle hash gate:
- every aggregate/computed column is aliased identically in Spark and SQL,
- double sums/avgs accumulate in DECIMAL(38,6) so IEEE summation order cannot
  flip the rounded result (partition order is nondeterministic; decimal
  addition is associative), then round and cast back to double on BOTH sides,
- top-k always carries a total tiebreak order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lets_talk_cdc_change_feed_playground_spark.sources.testdata import load_table as _t

_DEC = "decimal(38,6)"


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent sum of a double column: accumulate in decimal
    (associative — immune to partition/merge order), round, back to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_DEC)), scale).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent avg: exact decimal sum, then one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_DEC)).cast("double") / F.count(F.lit(1)), scale)


# SQL-side equivalents (DuckDB dialect) used inside the oracle strings:
#   sum  -> CAST(round(sum(CAST(x AS DECIMAL(38,6))), s) AS DOUBLE)
#   avg  -> round(CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*), s)


# --------------------------------------------------------------------------
# Q1: pricing summary (TPC-H Q1 shape): wide aggregate, two group keys.
# Scale notes: map-side partial aggregation; only 6 columns read (pruning).
# --------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q3: shipping priority — 3-way join, filter both sides, top-10 revenue.
# customer join is left to AQE (SF-scaling table); orders⋈lineitem shuffles
# on orderkey; top-k is a distributed TakeOrderedAndProject.
# --------------------------------------------------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-01-01"))
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


Q3_SQL = """
WITH agg AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND l_shipdate > TIMESTAMP '1997-01-01'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority, revenue
FROM agg
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Q5: local supplier volume — 6-way star join; fixed dims broadcast, facts
# shuffle; customer/supplier joins AQE-planned (they scale with SF).
# --------------------------------------------------------------------------
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


Q5_SQL = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# Q6: forecast revenue — pure filtered aggregate, all predicates pushed to scan.
# --------------------------------------------------------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


Q6_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Q10: returned-item reporting — join + group, top 20 by lost revenue.
# --------------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name", "revenue")
    )


Q10_SQL = """
WITH agg AS (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name, revenue
FROM agg
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# Order priority count (TPC-H Q4 shape) — semi-join orders→lineitem.
# --------------------------------------------------------------------------
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01")) & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    # left-semi join = EXISTS: orders with at least one lineitem
    li_keys = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        orders.join(li_keys, orders.o_orderkey == li_keys.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Top customers by spend — window rank per market segment (top-k per group).
# The window is PARTITIONED (per-segment) so it scales; customer join is
# AQE-planned.
# --------------------------------------------------------------------------
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    spend = (
        orders.groupBy("o_custkey")
        .agg(dsum("o_totalprice").alias("total_spend"), F.count(F.lit(1)).alias("n_orders"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
    )
    w = W.partitionBy("c_mktsegment").orderBy(F.col("total_spend").desc(), F.col("c_custkey").asc())
    return (
        spend.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "total_spend", "n_orders", "rk")
    )


TOP_CUSTOMERS_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_spend,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment, c_custkey, c_name, total_spend, n_orders, rk
FROM (
  SELECT c_mktsegment, c_custkey, c_name, total_spend, n_orders,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY total_spend DESC, c_custkey ASC) AS rk
  FROM spend JOIN customer ON o_custkey = c_custkey
)
WHERE rk <= 3
"""


# --------------------------------------------------------------------------
# Customers without orders — anti-join.
# --------------------------------------------------------------------------
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Part type stats — rollup aggregate over two dims.
# --------------------------------------------------------------------------
def part_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.rollup("p_type", "p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            davg("p_retailprice").alias("avg_price"),
            dsum("p_retailprice").alias("sum_price"),
        )
        .select(
            F.coalesce(F.col("p_type"), F.lit("ALL")).alias("p_type"),
            F.coalesce(F.col("p_brand"), F.lit("ALL")).alias("p_brand"),
            "n_parts",
            "avg_price",
            "sum_price",
        )
    )


PART_ROLLUP_SQL = """
SELECT coalesce(p_type, 'ALL') AS p_type, coalesce(p_brand, 'ALL') AS p_brand,
       count(*) AS n_parts,
       round(CAST(sum(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS avg_price,
       CAST(round(sum(CAST(p_retailprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_price
FROM part
GROUP BY ROLLUP (p_type, p_brand)
"""


# --------------------------------------------------------------------------
# Rolling 30-day spend per customer — a VALUE-RANGE window frame (every other
# window in the surface is row- or partition-framed). Partitioned by customer,
# ordered by epoch day, RANGE [-30, 0]: late/sparse order histories get the
# true trailing-month sum, not a fixed row count. Scale: partitions are
# per-customer (small, many) — no unpartitioned window anywhere.
# --------------------------------------------------------------------------
def orders_rolling_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").alias(
            "day"
        ),
        "o_totalprice",
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "day",
        F.round(F.sum(F.col("o_totalprice").cast(_DEC)).over(w), 2)
        .cast("double")
        .alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("orders_30d"),
    ).orderBy("o_custkey", "day", "o_orderkey")


ORDERS_ROLLING_SQL = """
SELECT o_custkey, o_orderkey,
       epoch_ms(o_orderdate) // 86400000 AS day,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w, 2) AS DOUBLE) AS spend_30d,
       count(*) OVER w AS orders_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY (epoch_ms(o_orderdate) // 86400000)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, day, o_orderkey
"""


# --------------------------------------------------------------------------
# Orders cube — all four grouping combinations of (status, priority) in one
# pass (completes the rollup/pivot/cube trio). Scale: cube expands to 4
# grouping sets map-side; partial aggregation still applies per set.
# --------------------------------------------------------------------------
def orders_cube_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


ORDERS_CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# Running revenue per customer — cumulative window over order history.
# Window sums accumulate in decimal: frame order is deterministic, but the
# final double must match the oracle bit-for-bit.
# --------------------------------------------------------------------------
def running_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        F.round(F.sum(F.col("o_totalprice").cast(_DEC)).over(w), 2).cast("double").alias("running_total"),
        F.row_number()
        .over(W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc()))
        .alias("order_seq"),
    )


RUNNING_REVENUE_SQL = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS order_seq
FROM orders
"""


# --------------------------------------------------------------------------
# Supplier/nation/region aggregate — nation/region broadcast (fixed-size);
# the supplier join is AQE-planned (supplier scales ~10 MB/SF).
# --------------------------------------------------------------------------
def supplier_region_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("gross"),
            davg("l_discount").alias("avg_disc"),
        )
    )


SUPPLIER_REGION_SQL = """
SELECT r_name, n_name, count(*) AS n_items,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS gross,
       round(CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS avg_disc
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# Events: hourly typed-event aggregate (the batch analogue of the streaming
# windowed aggregation — window(ts, 1 hour) per event_type).
# --------------------------------------------------------------------------
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Events sessionization — gap-based sessions per user (lag + cumulative sum),
# the batch analogue of session_window(ts, gap) in streaming.
# --------------------------------------------------------------------------
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_ms = 2 * 3600 * 1000
    with_gap = ev.withColumn(
        "new_session",
        (
            F.coalesce(
                F.unix_millis(F.col("ts").cast("timestamp")) - F.lag(F.unix_millis(F.col("ts").cast("timestamp"))).over(w),
                F.lit(gap_ms + 1),
            )
            > gap_ms
        ).cast("int"),
    )
    sessions = with_gap.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("session_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


EVENTS_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                   > 7200000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
s AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS session_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM s GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# Hypertable-style rollup with gap-fill + LOCF (the time_bucket_gapfill /
# locf shape): the dense hour spine is derived distributed — a per-type
# min/max aggregate exploded through sequence(), never a driver-side
# calendar loop — and the carry-forward window is bounded by each type's
# hour SPAN (wall-clock range / 1h), not by row count, so it stays a small
# per-type partition at any data scale.
# --------------------------------------------------------------------------
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.expr("unix_millis(cast(ts as timestamp)) div 3600000").alias("hour"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        dsum("value").alias("sum_value"),
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select("event_type", F.explode(F.expr("sequence(h0, h1)")).alias("hour"))
    )
    j = spine.join(hourly, ["event_type", "hour"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "event_type",
        F.col("hour").cast("long").alias("hour"),
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_filled"),
        F.col("sum_value").isNull().alias("gap_filled"),
    )


EVENTS_GAPFILL_SQL = """
WITH hourly AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS hour,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1, 2
),
spine AS (
  SELECT event_type, unnest(range(min(hour), max(hour) + 1)) AS hour
  FROM hourly GROUP BY event_type
)
SELECT s.event_type,
       CAST(s.hour AS BIGINT) AS hour,
       COALESCE(h.n_events, 0) AS n_events,
       CAST(last_value(h.sum_value IGNORE NULLS) OVER (
            PARTITION BY s.event_type ORDER BY s.hour
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_value_filled,
       h.sum_value IS NULL AS gap_filled
FROM spine s LEFT JOIN hourly h ON s.event_type = h.event_type AND s.hour = h.hour
"""


# --------------------------------------------------------------------------
# Interval-overlap (range) join, the scale-safe banded way: gap-based user
# sessions [start, end] joined to OTHER users' events inside the interval.
# Both sides are bucketed by hour so the join is an equi-join on the bucket
# with the precise range predicate applied inside each bucket — candidate
# pairs are Σ_bucket |session-hours| · |events-in-hour|, never
# |sessions| · |events| (the all-pairs interval join that dies at scale).
# Each event has exactly one bucket, so a (session, event) pair can match
# at most once — no post-join dedup needed.
# --------------------------------------------------------------------------
def events_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("unix_millis(cast(ts as timestamp))").alias("t"),
        "ts",
    )
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    w = W.partitionBy("user_id").orderBy(F.col("t").asc(), F.col("event_id").asc())
    gap_ms = 2 * 3600 * 1000
    # consumed twice (hour-bucket explode + the final left join) — persist
    # the one sessionization window pass
    sess = shared_df(
        spark,
        ("session_intervals", sf_dir),
        lambda: (
            ev.withColumn(
                "new_session",
                (
                    F.coalesce(F.col("t") - F.lag("t").over(w), F.lit(gap_ms + 1))
                    > gap_ms
                ).cast("int"),
            )
            .withColumn(
                "session_id",
                F.sum("new_session").over(
                    w.rowsBetween(W.unboundedPreceding, W.currentRow)
                ),
            )
            .groupBy("user_id", "session_id")
            .agg(
                F.min("t").alias("s0"),
                F.max("t").alias("s1"),
                F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                    "session_start"
                ),
                F.count(F.lit(1)).cast("long").alias("n_own_events"),
            )
        ),
    )
    sh = sess.select(
        "user_id",
        "session_id",
        "s0",
        "s1",
        F.explode(F.expr("sequence(s0 div 3600000, s1 div 3600000)")).alias("bkt"),
    )
    e = ev.select(
        F.col("user_id").alias("e_user"),
        F.col("t").alias("e_t"),
        F.expr("t div 3600000").alias("bkt"),
    )
    # two-phase distinct: aggregate the bucket-join fan-out ONCE by
    # (session, other-user) — count+countDistinct in one agg would Expand
    # the candidate pairs 2× through the shuffle (one leg per aggregate
    # path); the per-user partial collapses the fan-out before the second,
    # session-grain aggregate reuses the same clustering (guide §2.3
    # aggregate before you shuffle)
    ov = (
        sh.join(e, "bkt")
        .filter(
            (F.col("e_t") >= F.col("s0"))
            & (F.col("e_t") <= F.col("s1"))
            & (F.col("e_user") != F.col("user_id"))
        )
        .groupBy("user_id", "session_id", "e_user")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("user_id", "session_id")
        .agg(
            F.sum("_n").cast("long").alias("n_overlap_events"),
            F.count(F.lit(1)).cast("long").alias("n_concurrent_users"),
        )
    )
    return sess.join(ov, ["user_id", "session_id"], "left").select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "session_start",
        "n_own_events",
        F.coalesce("n_overlap_events", F.lit(0).cast("long")).alias(
            "n_overlap_events"
        ),
        F.coalesce("n_concurrent_users", F.lit(0).cast("long")).alias(
            "n_concurrent_users"
        ),
    )


EVENTS_SESSION_CONCURRENCY_SQL = """
WITH ev AS (
  SELECT user_id, event_id, epoch_ms(ts) AS t, ts FROM events
),
g AS (
  SELECT *, CASE WHEN t - lag(t) OVER w > 7200000
                   OR lag(t) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t ASC, event_id ASC)
),
s AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY t ASC, event_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
),
sess AS (
  SELECT user_id, session_id, min(t) AS s0, max(t) AS s1,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         CAST(count(*) AS BIGINT) AS n_own_events
  FROM s GROUP BY 1, 2
),
ov AS (
  SELECT se.user_id, se.session_id,
         CAST(count(*) AS BIGINT) AS n_overlap_events,
         CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_concurrent_users
  FROM sess se JOIN ev e
    ON e.t >= se.s0 AND e.t <= se.s1 AND e.user_id <> se.user_id
  GROUP BY 1, 2
)
SELECT se.user_id, CAST(se.session_id AS BIGINT) AS session_id, se.session_start,
       se.n_own_events,
       CAST(COALESCE(o.n_overlap_events, 0) AS BIGINT) AS n_overlap_events,
       CAST(COALESCE(o.n_concurrent_users, 0) AS BIGINT) AS n_concurrent_users
FROM sess se LEFT JOIN ov o
  ON se.user_id = o.user_id AND se.session_id = o.session_id
"""


# --------------------------------------------------------------------------
# Set ops: order statuses seen in 1996 vs 1997 (intersect / except shape).
# --------------------------------------------------------------------------
def order_status_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_orderstatus", "o_orderpriority").distinct()
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_orderstatus", "o_orderpriority").distinct()
    both = y96.intersect(y97).withColumn("set_op", F.lit("both"))
    only96 = y96.exceptAll(y97).distinct().withColumn("set_op", F.lit("only_1996"))
    only97 = y97.exceptAll(y96).distinct().withColumn("set_op", F.lit("only_1997"))
    return both.unionByName(only96).unionByName(only97)


ORDER_STATUS_SET_OPS_SQL = """
WITH y96 AS (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders WHERE year(o_orderdate) = 1996),
     y97 AS (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders WHERE year(o_orderdate) = 1997)
SELECT o_orderstatus, o_orderpriority, 'both' AS set_op FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
UNION ALL
SELECT o_orderstatus, o_orderpriority, 'only_1996' AS set_op FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
UNION ALL
SELECT o_orderstatus, o_orderpriority, 'only_1997' AS set_op FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96)
"""


# --------------------------------------------------------------------------
# Pivot: order counts by status × priority (pivot/unpivot surface).
# --------------------------------------------------------------------------
def orders_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_f"),
            F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_o"),
            F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_p"),
        )
    )


ORDERS_PIVOT_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Scalar-function surface: string/date/math/json functions over events.props.
# --------------------------------------------------------------------------
def events_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.length("event_type").alias("type_len"),
        F.concat_ws("-", F.col("event_type"), F.col("user_id").cast("string")).alias("type_user"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.round(F.sqrt(F.abs(F.col("value"))), 4).alias("sqrt_value"),
        F.round(F.log1p(F.abs(F.col("value"))), 4).alias("log1p_value"),
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
    )


EVENTS_SCALAR_SQL = """
SELECT event_id,
       upper(event_type) AS type_upper,
       length(event_type) AS type_len,
       concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS type_user,
       year(ts) AS y, month(ts) AS m, day(ts) AS d,
       round(sqrt(abs(value)), 4) AS sqrt_value,
       round(ln(1 + abs(value)), 4) AS log1p_value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       substring(event_type, 1, 3) AS type_prefix
FROM events
"""


# --------------------------------------------------------------------------
# Rollup: hierarchical aggregate with subtotal + grand-total rows.
# Scale: map-side-combinable decimal sums; rollup adds one shuffle.
# --------------------------------------------------------------------------
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(revenue).alias("revenue"),
        )
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# Semi join: parts that actually sold in bulk (EXISTS shape). The probe side
# is reduced before the join; the semi join never duplicates part rows.
# --------------------------------------------------------------------------
def parts_sold_in_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    bulk = li.filter(F.col("l_quantity") >= 48).select("l_partkey")
    return (
        part.join(bulk, part.p_partkey == bulk.l_partkey, "left_semi")
        .select("p_partkey", "p_name", "p_type", "p_retailprice")
    )


PARTS_BULK_SQL = """
SELECT p_partkey, p_name, p_type, p_retailprice
FROM part
WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity >= 48
)
"""


# --------------------------------------------------------------------------
# Q13 shape: dimension LEFT OUTER fact, two-level aggregation — the outer
# join preserves order-less customers (c_count = 0 bucket).
# Scale notes: both aggregations shuffle on their group key; no broadcast of
# the SF-scaling customer table.
# --------------------------------------------------------------------------
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# Q16 shape (partsupp approximated by lineitem's observed part-supplier
# pairs): distinct-supplier count per brand/type.
# Scale notes: countDistinct is a two-phase hash aggregate; the part join is
# AQE-planned (part scales with SF).
# --------------------------------------------------------------------------
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


Q16_SQL = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
"""


# --------------------------------------------------------------------------
# Q18 shape: semi-join orders onto an aggregated-key set (large-volume
# orders), then top-k by value.
# Scale notes: the HAVING predicate compares the EXACT decimal sum (no
# rounded-double boundary); top-k is a distributed sorted limit.
# --------------------------------------------------------------------------
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).alias("__qdec"),
        )
        .filter(F.col("__qdec") > 150)
        .select(
            "l_orderkey",
            F.round("__qdec", 2).cast("double").alias("sum_qty"),
        )
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 150
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q22 shape: anti-join (customers with no recent orders) + scalar aggregate
# subquery (above-average positive balance), grouped by nation.
# Scale notes: the average comparison is exact decimal/integer arithmetic
# (acctbal*n > sum), so no float boundary can flip membership; the scalar
# aggregate broadcasts as a 1-row frame.
# --------------------------------------------------------------------------
_Q22_CUTOFF = "1998-05-01"


def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(_Q22_CUTOFF)
    )
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(_DEC)).alias("__possum"),
        F.count(F.lit(1)).alias("__posn"),
    )
    return (
        cust.join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast(_DEC) * F.col("__posn") > F.col("__possum"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = f"""
SELECT c_nationkey,
       count(*) AS n_cust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_acctbal
FROM customer
CROSS JOIN (
  SELECT sum(CAST(c_acctbal AS DECIMAL(38,6))) AS possum, count(*) AS posn
  FROM customer WHERE c_acctbal > 0
) p
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}')
  AND CAST(c_acctbal AS DECIMAL(38,6)) * posn > possum
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --------------------------------------------------------------------------
# Hot-key aggregation through the two-phase salted combine (functions/skew).
# event_type has ~10 distinct values across the whole table — the degenerate
# key distribution where a plain groupBy pins one reducer per key at 100 TB.
# Salting sprays each key over 16 sub-keys and merges partials; the result
# is identical to the plain aggregation (the oracle is a plain GROUP BY).
# --------------------------------------------------------------------------
def events_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lets_talk_cdc_change_feed_playground_spark.functions.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    # Salting BY the distinct column makes count_distinct exactly mergeable:
    # each user_id lands in exactly one salt bucket, so phase-2 SUM of the
    # per-bucket distinct counts is the true distinct count (the same trick
    # makes any count_distinct algebraic when the salt is a function of the
    # counted column).
    out = salted_agg(
        ev,
        keys=["event_type"],
        salt_col="user_id",
        partials={
            "n_events": lambda: F.count(F.lit(1)),
            "__vdec": lambda: F.sum(F.col("value").cast(_DEC)),
            "n_users": lambda: F.count_distinct(F.col("user_id")),
        },
        merges={
            "n_events": lambda c: F.sum(F.col(c)).cast("long"),
            "__vdec": lambda c: F.sum(F.col(c)),
            "n_users": lambda c: F.sum(F.col(c)).cast("long"),
        },
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("__vdec", 2).cast("double").alias("value_sum"),
        "n_users",
    ).orderBy("event_type")


EVENTS_SALTED_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS value_sum,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Manual skew-join salting: the join twin of events_salted_hot_keys. The
# salted plan must produce exactly the plain join's answer — that IS the
# judged claim; the oracle is the unsalted SQL.
# --------------------------------------------------------------------------
def lineitem_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lets_talk_cdc_change_feed_playground_spark.functions.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_orderkey", "l_quantity")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li, p, big_key="l_partkey", small_key="p_partkey", salt_col="l_orderkey"
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_quantity").cast(_DEC)), 2)
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("p_brand")
    )


LINEITEM_SALTED_SQL = """
SELECT p.p_brand,
       count(*) AS n_items,
       CAST(round(sum(CAST(l.l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


# --------------------------------------------------------------------------
# Ranking-function coverage: percent_rank / cume_dist / ntile per market
# segment over customer account balances. Per-segment partitioned windows —
# distributed by segment; the double divisions are the closed-form
# (rank-1)/(n-1) and peers/n, identical in both engines.
# --------------------------------------------------------------------------
def customers_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(10).over(w).alias("decile"),
    )
    return (
        ranked.filter(F.col("decile").isin(1, 10))
        .orderBy("c_mktsegment", "decile", "c_custkey")
        .select("c_mktsegment", "c_custkey", "c_acctbal", "pr", "cd", "decile")
    )


CUSTOMERS_PRANK_SQL = """
SELECT c_mktsegment, c_custkey, c_acctbal, pr, cd, CAST(decile AS INT) AS decile
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd,
         ntile(10) OVER w AS decile
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
)
WHERE decile IN (1, 10)
ORDER BY c_mktsegment, decile, c_custkey
"""


# --------------------------------------------------------------------------
# Q4 shape: EXISTS → left-semi join with a non-equi residual condition.
# Scale: orders filter pushed to scan; semi join shuffles both sides on
# orderkey only (no payload duplication — semi join carries no right columns).
# --------------------------------------------------------------------------
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 10 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 10 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations — 6-table star with two
# independent nation attributions. Scale: nation broadcast; the nation
# filters reduce supplier/customer BEFORE the fact joins, so AQE can
# broadcast the surviving slivers; lineitem shuffles once per fact key.
# --------------------------------------------------------------------------
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    j = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(CAST(volume AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    AND n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
    AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
    AND n1.n_name <> n2.n_name
) GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# Q8 shape: market share — conditional share of a grouped aggregate. The
# ratio is an UNROUNDED double division of two exact decimal sums: both
# engines divide bit-identical doubles, so no half-boundary hazard.
# --------------------------------------------------------------------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31"))
    )
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    cust = (
        _t(spark, sf_dir, "customer")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0).cast(_DEC)).cast("double")
                / F.sum(vol.cast(_DEC)).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(CASE WHEN n1.n_name = 'NATION_3'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
                     AS DECIMAL(38,6))) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
  AND EXISTS (SELECT 1 FROM customer
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              JOIN region ON n2.n_regionkey = r_regionkey
              WHERE c_custkey = o_custkey AND r_name = 'EUROPE')
GROUP BY o_year ORDER BY o_year
"""


# --------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year. Cost model adapted to
# the schema (no partsupp): unit cost = 50% of p_retailprice.
# Scale: part filter prunes the join early; profit is decimal-accumulated.
# --------------------------------------------------------------------------
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget")).select(
        "p_partkey", "p_retailprice"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    supp = _t(spark, sf_dir, "supplier").join(
        n, F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.5) * F.col("l_quantity")
    )
    j = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        j.groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT nation, o_year,
       CAST(round(sum(CAST(amount AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) - p_retailprice * 0.5 * l_quantity AS amount
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
) GROUP BY nation, o_year ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# Q12 shape: shipping-delay bands × order priority (conditional counts over
# a fact-fact join). Scale: single orderkey shuffle; counts are map-side
# combinable.
# --------------------------------------------------------------------------
def q12_ship_delay_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    band = F.when(
        F.datediff("l_shipdate", F.to_date(F.lit("1996-01-01"))) % 365 >= 180,
        "second_half",
    ).otherwise("first_half")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(band.alias("ship_band"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("ship_band")
    )


Q12_SQL = """
SELECT CASE WHEN date_diff('day', DATE '1996-01-01', CAST(l_shipdate AS DATE)) % 365 >= 180
            THEN 'second_half' ELSE 'first_half' END AS ship_band,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY ship_band ORDER BY ship_band
"""


# --------------------------------------------------------------------------
# Q14 shape: promo revenue share in a month. Unrounded double ratio of
# exact decimal sums (see Q8 note).
# --------------------------------------------------------------------------
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0).cast(_DEC)).cast("double")
            / F.sum(vol.cast(_DEC)).cast("double")
        ).alias("promo_share")
    )


Q14_SQL = """
SELECT 100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


# --------------------------------------------------------------------------
# Q15 shape: top supplier — aggregate, take the max, join back on equality.
# The max is a 1-row broadcast; revenue equality is deterministic because
# both sides compare the same decimal-rounded double.
# --------------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q17 shape: small-quantity orders vs the per-part average — correlated
# aggregate expressed as an aggregate-then-join (no per-row subquery).
# The 0.2·avg threshold uses the 4-dp decimal-rounded average so the
# comparison is identical on both engines.
# --------------------------------------------------------------------------
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    brand_li = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = brand_li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        davg("l_quantity").alias("__avg_qty")
    )
    small = brand_li.join(avg_qty, F.col("l_partkey") == F.col("__pk")).filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("__avg_qty")
    )
    return small.agg(
        (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly")
    )


Q17_SQL = """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#13'
), avg_qty AS (
  SELECT l_partkey AS pk,
         round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS aq
  FROM brand_li GROUP BY l_partkey
)
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2) AS DOUBLE) / 7.0 AS avg_yearly
FROM brand_li JOIN avg_qty ON l_partkey = pk
WHERE l_quantity < 0.2 * aq
"""


# --------------------------------------------------------------------------
# Q19 shape: disjunction of conjunctive band predicates across a join.
# Scale: the part side is pre-filtered to the union of the bands before the
# join, so the OR residual only runs on surviving rows.
# --------------------------------------------------------------------------
def q19_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


Q19_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE)
         AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# Q21 shape (adapted — no receipt/commit dates): suppliers who were the
# SOLE latest shipper on multi-supplier orders. exists/not-exists pair
# expressed as aggregate-then-join: per-order supplier count + max
# shipdate, keep orders where exactly one supplier ships at the max.
# --------------------------------------------------------------------------
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-scan form: one map-side-combinable (order, supplier) aggregate
    # replaces the two full lineitem passes of the aggregate-then-join shape
    # (the join-back on (orderkey, shipdate = max_ship) re-scanned lineitem).
    # A supplier has a lineitem row at the order's latest ship date iff its
    # own per-order max ship date equals the order max, so every latest-row
    # statistic folds out of the pair grain: n_supp = pair count per order,
    # n_latest = pairs attaining the max, suppkey = min such supplier.  The
    # order-level window and the follow-up aggregate both key on l_orderkey,
    # so the pair shuffle is the only exchange until the tiny suppkey rollup.
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("__ms")
    )
    w_ord = W.partitionBy("l_orderkey")
    sole = (
        per_pair.select(
            "*",
            F.count(F.lit(1)).over(w_ord).alias("__n_supp"),
            F.max("__ms").over(w_ord).alias("__max_ship"),
        )
        .filter(F.col("__n_supp") >= 2)
        .groupBy("l_orderkey")
        .agg(
            F.sum((F.col("__ms") == F.col("__max_ship")).cast("int")).alias(
                "__n_latest"
            ),
            F.min(
                F.when(F.col("__ms") == F.col("__max_ship"), F.col("l_suppkey"))
            ).alias("__suppkey"),
        )
        .filter(F.col("__n_latest") == 1)
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        sole.groupBy("__suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(s, F.col("__suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey AS ok, count(DISTINCT l_suppkey) AS n_supp, max(l_shipdate) AS max_ship
  FROM lineitem GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) >= 2
), sole AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_latest, min(l_suppkey) AS suppkey
  FROM lineitem JOIN per_order ON l_orderkey = ok AND l_shipdate = max_ship
  GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) = 1
)
SELECT s_name, numwait FROM (
  SELECT suppkey, count(*) AS numwait FROM sole GROUP BY suppkey
) JOIN supplier ON suppkey = s_suppkey
ORDER BY numwait DESC, s_name LIMIT 20
"""


# --------------------------------------------------------------------------
# Q2 shape (adapted — lineitem as the supply relation): cheapest supplier
# per part within a region, correlated-min expressed as aggregate-then-join.
# Unit price = extendedprice/quantity — identical double division on both
# engines, so the min and the equality join-back are deterministic.
# --------------------------------------------------------------------------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    supply = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    floor_ = supply.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.min("unit_price").alias("min_price")
    )
    best = (
        supply.join(
            floor_,
            (F.col("l_partkey") == F.col("__pk"))
            & (F.col("unit_price") == F.col("min_price")),
        )
        .groupBy("l_partkey", "min_price")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    return (
        best.join(supp, F.col("best_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("best_suppkey").alias("s_suppkey"),
            "s_name",
            "s_acctbal",
            # unrounded: both engines hold bit-identical doubles, while
            # round(x, 4) can straddle a half boundary across engines
            F.col("min_price").alias("min_unit_price"),
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(20)
    )


Q2_SQL = """
WITH supp AS (
  SELECT s_suppkey, s_name, s_acctbal
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), supply AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15 AND p_type = 'STANDARD')
    AND l_suppkey IN (SELECT s_suppkey FROM supp)
), floor_ AS (
  SELECT l_partkey AS pk, min(unit_price) AS min_price FROM supply GROUP BY l_partkey
), best AS (
  SELECT l_partkey, min_price, min(l_suppkey) AS best_suppkey
  FROM supply JOIN floor_ ON l_partkey = pk AND unit_price = min_price
  GROUP BY l_partkey, min_price
)
SELECT l_partkey AS p_partkey, best_suppkey AS s_suppkey, s_name, s_acctbal,
       min_price AS min_unit_price
FROM best JOIN supp ON best_suppkey = s_suppkey
ORDER BY s_acctbal DESC, p_partkey LIMIT 20
"""


# --------------------------------------------------------------------------
# Funnel: view → click → purchase per user, each stage's timestamp strictly
# after the previous stage. Correlated mins become three co-partitioned
# groupBy/join rounds on user_id — Spark reuses the exchange, and timestamp
# comparisons are exact on both engines.
# --------------------------------------------------------------------------
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-pass funnel: the three stage frames chained per-stage joins and
    # each fed TWO consumers (the next stage's join and its own count), so
    # the events scan ran six times per call (profiled: six 32-task jobs at
    # 2.6-5.6 s CPU each).  The stage thresholds are per-user scalars — first
    # view, first click after it, first purchase after that — so one shuffle
    # by user_id and three stacked conditional-min windows (same partition
    # spec: one sort, no further exchange) compute the whole funnel; the
    # per-user rollup reuses the window partitioning and the final count is
    # a 1-row two-phase aggregate (guide §2.4).
    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
    )
    wu = W.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(wu),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(wu),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t_view").alias("tv"),
        F.max("t_click").alias("tc"),
        F.max("t_purchase").alias("tp"),
    )
    return per_user.agg(
        F.count("tv").alias("n_view"),
        F.count("tc").alias("n_click_after_view"),
        F.count("tp").alias("n_purchase_after_click"),
    )


EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE event_type = 'click' AND ts > t_view GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE event_type = 'purchase' AND ts > t_click GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_click_after_view,
       (SELECT count(*) FROM p) AS n_purchase_after_click
"""


# --------------------------------------------------------------------------
# Hopping (sliding) windows in batch: 2 h windows advancing every 30 min —
# each event replicates into win/hop = 4 windows via an explode, then a
# plain map-side-combinable aggregate. This is Structured Streaming's
# F.window(ts, "2 hours", "30 minutes") semantics expressed relationally.
# --------------------------------------------------------------------------
def events_hopping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    hop, win = 1_800_000, 7_200_000
    ev = _t(spark, sf_dir, "events").select(
        F.expr("unix_micros(cast(ts as timestamp)) div 1000").alias("t"), "event_type", "value", "user_id"
    )
    hops = ev.select(
        "*", F.explode(F.expr(f"sequence(0, {win // hop - 1})")).alias("__i")
    ).withColumn("window_start", F.expr(f"(t div {hop} - __i) * {hop}"))
    return (
        hops.groupBy("window_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("window_start")
    )


EVENTS_HOPPING_SQL = """
SELECT (epoch_ms(ts) // 1800000 - i) * 1800000 AS window_start,
       count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events CROSS JOIN UNNEST(range(4)) AS h(i)
GROUP BY window_start ORDER BY window_start
"""


# --------------------------------------------------------------------------
# Anomaly windows — two classic patterns composed: gaps-and-islands merges
# consecutive above-threshold hours into intervals, then a BUCKETED interval
# join (explode each island into its hour buckets, equi-join events on
# (type, hour)) counts the events inside each window. The bucket explode is
# the scale-correct range-join strategy: candidate pairs are bounded by
# interval length, never |events| × |intervals|.
# --------------------------------------------------------------------------
def events_anomaly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h"),
    )
    hourly = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("n"))
    avg = hourly.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("n").cast(_DEC)).cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_n")
    )
    anom = hourly.join(F.broadcast(avg), "event_type").filter(
        F.col("n") * 2 > F.col("avg_n") * 3
    )
    wt = W.partitionBy("event_type").orderBy("h")
    islands = (
        anom.withColumn("grp", F.col("h") - F.row_number().over(wt))
        .groupBy("event_type", "grp")
        .agg(
            F.min("h").alias("start_h"),
            F.max("h").alias("end_h"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .drop("grp")
    )
    buckets = islands.select(
        "event_type",
        "start_h",
        "end_h",
        "n_hours",
        F.explode(F.sequence("start_h", "end_h")).alias("h"),
    )
    return (
        buckets.join(ev, ["event_type", "h"])
        .groupBy("event_type", "start_h", "end_h", "n_hours")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type", "start_h")
    )


EVENTS_ANOMALY_SQL = """
WITH ev AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS h FROM events
),
hourly AS (SELECT event_type, h, count(*) AS n FROM ev GROUP BY 1, 2),
avg_n AS (
  SELECT event_type,
         round(CAST(sum(CAST(n AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) AS avg_n
  FROM hourly GROUP BY 1
),
anom AS (
  SELECT hourly.* FROM hourly JOIN avg_n USING (event_type) WHERE n * 2 > avg_n * 3
),
islands AS (
  SELECT event_type, min(h) AS start_h, max(h) AS end_h, count(*) AS n_hours
  FROM (SELECT *, h - row_number() OVER (PARTITION BY event_type ORDER BY h) AS grp FROM anom)
  GROUP BY event_type, grp
),
buckets AS (
  SELECT event_type, start_h, end_h, n_hours, unnest(generate_series(start_h, end_h)) AS h
  FROM islands
)
SELECT event_type, start_h, end_h, n_hours, count(*) AS n_events
FROM buckets JOIN ev USING (event_type, h)
GROUP BY 1, 2, 3, 4
ORDER BY event_type, start_h
"""


# --------------------------------------------------------------------------
# Point-in-time as-of join — the feature-store primitive: each event gets the
# user's most recent order AS OF the event time (never a later one — label
# leakage is the bug this join exists to prevent). Implemented the
# scale-correct way: union both streams into one per-user timeline and take
# a running last_value(ignore nulls) — ONE window pass, no per-key range
# join, no pair explosion. DuckDB expresses the same thing with row_number
# over the inequality join (and has native ASOF JOIN).
# --------------------------------------------------------------------------
def events_asof_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("uid"),
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000").alias("t"),
        F.lit(0).alias("kind"),
        F.col("o_orderkey").alias("tie"),
        "o_orderkey",
        "o_totalprice",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
    )
    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.expr("unix_micros(cast(ts as timestamp)) div 1000").alias("t"),
        F.lit(1).alias("kind"),
        F.col("event_id").alias("tie"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        "event_id",
        "event_type",
    )
    w = (
        W.partitionBy("uid")
        .orderBy("t", "kind", "tie")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    def last_of(c):
        return F.last(F.when(F.col("kind") == 0, F.col(c)), ignorenulls=True).over(w)

    tl = o.unionByName(e).select(
        "*",
        last_of("o_orderkey").alias("asof_orderkey"),
        last_of("o_totalprice").alias("asof_totalprice"),
        last_of("t").alias("asof_t"),
    )
    return (
        tl.filter(F.col("kind") == 1)
        .select(
            "event_id",
            F.col("uid").alias("user_id"),
            "event_type",
            "asof_orderkey",
            "asof_totalprice",
            F.expr("(t - asof_t) div 86400000").alias("days_since_order"),
        )
        .orderBy("event_id")
    )


EVENTS_ASOF_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS t FROM events
),
o AS (
  SELECT o_custkey, o_orderkey, o_totalprice, epoch_ms(o_orderdate) AS t FROM orders
),
m AS (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice, o.t AS ot,
         row_number() OVER (PARTITION BY e.event_id ORDER BY o.t DESC, o.o_orderkey DESC) AS rn
  FROM e JOIN o ON e.user_id = o.o_custkey AND o.t <= e.t
)
SELECT e.event_id, e.user_id, e.event_type,
       m.o_orderkey AS asof_orderkey,
       m.o_totalprice AS asof_totalprice,
       (e.t - m.ot) // 86400000 AS days_since_order
FROM e LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
ORDER BY e.event_id
"""


# --------------------------------------------------------------------------
# Retention cohorts — users grouped by first-seen day, survival counted at
# each day offset. Two aggregations over one scan: distinct (user, day)
# activity, then a broadcast-joined cohort floor. Scale: both groupBys key on
# user/day — no window, no driver loop.
# --------------------------------------------------------------------------
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day"),
    )
    activity = ev.distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohort.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_users"))
    ret = (
        activity.join(cohort, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    return (
        ret.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "active_users",
            "cohort_users",
            F.round(F.col("active_users") * 100.0 / F.col("cohort_users"), 2).alias(
                "retention_pct"
            ),
        )
        .orderBy("cohort_day", "day_offset")
    )


EVENTS_RETENTION_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
),
cohort AS (SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id),
sizes AS (SELECT cohort_day, count(*) AS cohort_users FROM cohort GROUP BY cohort_day),
ret AS (
  SELECT cohort_day, a.day - cohort_day AS day_offset, count(*) AS active_users
  FROM activity a JOIN cohort USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_day, day_offset, active_users, cohort_users,
       round(active_users * 100.0 / cohort_users, 2) AS retention_pct
FROM ret JOIN sizes USING (cohort_day)
ORDER BY cohort_day, day_offset
"""


# --------------------------------------------------------------------------
# Part co-order affinity — the canonical pair-explosion shuffle, mitigated:
# (a) per-order part lists dedup to distinct parts, (b) only parts appearing
# in >= 5 orders enter the self-join (a frequency prefilter bounds the pair
# space the way minhash banding bounds candidate pairs), (c) the global top-k
# is a distributed TakeOrderedAndProject.
# --------------------------------------------------------------------------
def parts_coorder_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    def build_lih() -> DataFrame:
        li = (
            _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
        )
        freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
        hot = freq.filter(F.col("n_orders") >= 5).select("l_partkey")
        # hot grows with SF — AQE decides the join strategy (r1 lesson)
        return li.join(hot, "l_partkey")

    # both sides of the self-join scan this frame; persisting it halves the
    # distinct+filter work (lih is the hot subset — smaller than lineitem)
    lih = shared_df(spark, ("coorder_lih", sf_dir), build_lih)
    a = lih.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = lih.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_coorders"))
    )
    return pairs.orderBy(
        F.col("n_coorders").desc(), "pa", "pb"
    ).limit(25)


PARTS_COORDER_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
hot AS (SELECT l_partkey FROM li GROUP BY l_partkey HAVING count(*) >= 5),
lih AS (SELECT li.* FROM li JOIN hot USING (l_partkey)),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_coorders
  FROM lih a JOIN lih b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT pa, pb, n_coorders FROM pairs ORDER BY n_coorders DESC, pa, pb LIMIT 25
"""


# --------------------------------------------------------------------------
# S3 snapshot read: a table state becomes the INSERT event stream that
# precedes the tail (tx_id = snapshot-<pk>), with a dense snapshot LSN via
# the two-phase sequence (never a single-task global row_number).
# --------------------------------------------------------------------------
def cdc_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lets_talk_cdc_change_feed_playground_spark.functions.sequence import (
        with_global_seq,
    )

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    ops = with_global_seq(
        c, F.expr("c_custkey div 1000"), ["c_custkey"], out_col="lsn"
    )
    return ops.select(
        "lsn",
        F.lit("c").alias("op"),
        F.col("c_custkey").cast("string").alias("pk"),
        F.concat(F.lit("snapshot-"), F.col("c_custkey").cast("string")).alias("tx_id"),
        "c_name",
        "c_mktsegment",
        "c_acctbal",
    ).orderBy("lsn")


CDC_SNAPSHOT_SQL = """
SELECT row_number() OVER (ORDER BY c_custkey) AS lsn,
       'c' AS op,
       CAST(c_custkey AS VARCHAR) AS pk,
       'snapshot-' || CAST(c_custkey AS VARCHAR) AS tx_id,
       c_name, c_mktsegment, c_acctbal
FROM customer ORDER BY lsn
"""


# --------------------------------------------------------------------------
# Q11 shape (adapted — no partsupp table): per-part "supply value" held by
# suppliers of one nation, keeping parts whose value exceeds a fraction of
# the nation-wide total. The grand total is a one-row aggregate broadcast
# back over the per-part sums (scalar-subquery shape, no second scan).
# Scale: lineitem is scanned once; the supplier filter semi-joins before the
# big aggregation, and the threshold compare is a broadcast nested loop of a
# single row — no shuffle added at 100 TB.
# --------------------------------------------------------------------------
def q11_important_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    vals = (
        li.join(nat_supp, li.l_suppkey == nat_supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    total = vals.agg(
        F.round(F.sum(F.col("value").cast(_DEC)), 2).cast("double").alias("__total")
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.lit(0.001) * F.col("__total"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


Q11_SQL = """
WITH vals AS (
  SELECT l_partkey,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_regionkey = 3
  GROUP BY l_partkey
)
SELECT l_partkey, value
FROM vals
WHERE value > 0.001 * (SELECT CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) FROM vals)
ORDER BY value DESC, l_partkey
"""


# --------------------------------------------------------------------------
# Q20 shape (adapted — no partsupp): suppliers who shipped above-average
# volume of 'cold %' parts in 1996 ("promotion-eligible"). The per-supplier
# volume and the average volume come from ONE aggregation reused twice
# (self-agg scalar broadcast), not two scans.
# Scale: the cold-part prefilter is selective but still grows with SF, so
# it is NOT hard-broadcast — AQE broadcasts it below the threshold and
# falls back to a shuffle join at 100× (the r1 lesson on SF-scaling dims).
# lineitem scanned once with shipdate + partkey pushdown, final supplier
# join is on the already tiny qualifying set.
# --------------------------------------------------------------------------
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("cold")).select(
        "p_partkey"
    )
    per_supp = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("cold_qty"))
    )
    avg_qty = per_supp.agg(
        F.round(
            F.sum(F.col("cold_qty").cast(_DEC)).cast("double") / F.count(F.lit(1)), 4
        ).alias("__avg")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        per_supp.crossJoin(F.broadcast(avg_qty))
        .filter(F.col("cold_qty") > F.col("__avg"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_name", "s_acctbal", "cold_qty")
        .orderBy(F.col("cold_qty").desc(), "s_name")
    )


Q20_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(38,6))), 2) AS DOUBLE) AS cold_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'cold%'
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY l_suppkey
)
SELECT s_name, s_acctbal, cold_qty
FROM per_supp
JOIN supplier ON l_suppkey = s_suppkey
WHERE cold_qty > (SELECT round(CAST(sum(CAST(cold_qty AS DECIMAL(38,6))) AS DOUBLE) / count(*), 4) FROM per_supp)
ORDER BY cold_qty DESC, s_name
"""


# --------------------------------------------------------------------------
# GROUPING SETS — a set list that is neither rollup nor cube ((type, dow),
# (dow), (type)): one Expand + one aggregation, the multi-grain report shape.
# The day-of-week is pure epoch arithmetic (epoch day + 4 mod 7, Mon=0) so
# both engines derive it identically; NULL group markers disambiguate grain
# because neither column is nullable in the data.
# --------------------------------------------------------------------------
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr(
            "((unix_micros(cast(ts as timestamp)) div 1000) div 86400000 + 4) % 7"
        ).alias("dow"),
        "value",
    )
    grain = (
        F.when(F.col("dow").isNull(), F.lit("by_type"))
        .when(F.col("event_type").isNull(), F.lit("by_dow"))
        .otherwise(F.lit("by_type_dow"))
    )
    return (
        base.groupingSets(
            [["event_type", "dow"], ["dow"], ["event_type"]], "event_type", "dow"
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(grain.alias("grain"), "event_type", "dow", "n", "sum_value")
        .orderBy("grain", "event_type", "dow")
    )


EVENTS_GROUPING_SETS_SQL = """
SELECT CASE WHEN dow IS NULL THEN 'by_type'
            WHEN event_type IS NULL THEN 'by_dow'
            ELSE 'by_type_dow' END AS grain,
       event_type, dow, n, sum_value
FROM (
  SELECT event_type,
         (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
         count(*) AS n,
         CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_value
  FROM events
  GROUP BY GROUPING SETS ((event_type, (epoch_ms(ts) // 86400000 + 4) % 7),
                          ((epoch_ms(ts) // 86400000 + 4) % 7),
                          (event_type))
)
ORDER BY grain, event_type, dow
"""


QUERIES = {
    "events_grouping_sets": events_grouping_sets,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "revenue_rollup": revenue_rollup,
    "parts_sold_in_bulk": parts_sold_in_bulk,
    "q10_returned_items": q10_returned_items,
    "order_priority_count": order_priority_count,
    "top_customers_per_segment": top_customers_per_segment,
    "customers_without_orders": customers_without_orders,
    "part_type_rollup": part_type_rollup,
    "orders_cube_stats": orders_cube_stats,
    "orders_rolling_spend": orders_rolling_spend,
    "running_revenue_per_customer": running_revenue_per_customer,
    "supplier_region_stats": supplier_region_stats,
    "events_hourly_stats": events_hourly_stats,
    "events_sessionize": events_sessionize,
    "events_gapfill_locf": events_gapfill_locf,
    "events_session_concurrency": events_session_concurrency,
    "order_status_set_ops": order_status_set_ops,
    "orders_status_pivot": orders_status_pivot,
    "events_scalar_functions": events_scalar_functions,
    "q13_customer_distribution": q13_customer_distribution,
    "q16_supplier_variety": q16_supplier_variety,
    "q18_large_volume_orders": q18_large_volume_orders,
    "q22_idle_balances": q22_idle_balances,
    "events_salted_hot_keys": events_salted_hot_keys,
    "lineitem_salted_join": lineitem_salted_join,
    "customers_percentile_ranks": customers_percentile_ranks,
    "q4_priority_late_ship": q4_priority_late_ship,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q12_ship_delay_bands": q12_ship_delay_bands,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q19_banded_revenue": q19_banded_revenue,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_supply": q11_important_supply,
    "q20_promo_suppliers": q20_promo_suppliers,
    "events_funnel": events_funnel,
    "events_retention_cohorts": events_retention_cohorts,
    "events_asof_features": events_asof_features,
    "events_anomaly_windows": events_anomaly_windows,
    "parts_coorder_affinity": parts_coorder_affinity,
    "events_hopping_stats": events_hopping_stats,
    "cdc_snapshot_read": cdc_snapshot_read,
}

ORACLE = {
    "events_grouping_sets": EVENTS_GROUPING_SETS_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "revenue_rollup": ROLLUP_SQL,
    "parts_sold_in_bulk": PARTS_BULK_SQL,
    "q10_returned_items": Q10_SQL,
    "order_priority_count": ORDER_PRIORITY_SQL,
    "top_customers_per_segment": TOP_CUSTOMERS_SQL,
    "customers_without_orders": CUSTOMERS_WITHOUT_ORDERS_SQL,
    "part_type_rollup": PART_ROLLUP_SQL,
    "orders_cube_stats": ORDERS_CUBE_SQL,
    "orders_rolling_spend": ORDERS_ROLLING_SQL,
    "running_revenue_per_customer": RUNNING_REVENUE_SQL,
    "supplier_region_stats": SUPPLIER_REGION_SQL,
    "events_hourly_stats": EVENTS_HOURLY_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_gapfill_locf": EVENTS_GAPFILL_SQL,
    "events_session_concurrency": EVENTS_SESSION_CONCURRENCY_SQL,
    "order_status_set_ops": ORDER_STATUS_SET_OPS_SQL,
    "orders_status_pivot": ORDERS_PIVOT_SQL,
    "events_scalar_functions": EVENTS_SCALAR_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q16_supplier_variety": Q16_SQL,
    "q18_large_volume_orders": Q18_SQL,
    "q22_idle_balances": Q22_SQL,
    "events_salted_hot_keys": EVENTS_SALTED_SQL,
    "lineitem_salted_join": LINEITEM_SALTED_SQL,
    "customers_percentile_ranks": CUSTOMERS_PRANK_SQL,
    "q4_priority_late_ship": Q4_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q12_ship_delay_bands": Q12_SQL,
    "q14_promo_effect": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity": Q17_SQL,
    "q19_banded_revenue": Q19_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_supply": Q11_SQL,
    "q20_promo_suppliers": Q20_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "events_retention_cohorts": EVENTS_RETENTION_SQL,
    "events_asof_features": EVENTS_ASOF_SQL,
    "events_anomaly_windows": EVENTS_ANOMALY_SQL,
    "parts_coorder_affinity": PARTS_COORDER_SQL,
    "events_hopping_stats": EVENTS_HOPPING_SQL,
    "cdc_snapshot_read": CDC_SNAPSHOT_SQL,
}


# ---------------------------------------------------------------------------
# Customer-analytics classics: RFM segmentation + ABC (Pareto) classification
# ---------------------------------------------------------------------------


def customers_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, recency (days since last order),
    frequency (order count) and monetary (decimal-exact total spend) are
    quartile-scored with ``ntile(4)`` over deterministic total orders
    (metric, then custkey); the 3-digit RFM code rolls up to segment
    counts — the classic CRM cut, here as one pass + three bounded
    windows over the per-customer aggregate (never over raw orders)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 1000").alias("od_ms"),
    )
    mx = o.agg(F.max("od_ms").alias("now_ms"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("od_ms").alias("last_ms"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(38,2)")).alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.expr("(now_ms - last_ms) div 86400000").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    # base of three chained rank passes — shared-persist so each pass starts
    # from the customer-grain aggregate, not the orders scan, and repeated
    # invocations reuse one cache entry instead of leaking persists
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    per_cust_plan = per_cust
    per_cust = shared_df(spark, ("rfm_per_cust", sf_dir), lambda: per_cust_plan)
    # quartile = equal-width rank bucket ((rank-1)*4 div n)+1 — rank via the
    # two-phase bucketed sequence, so no customer-sized single-task window
    # (ntile would force one); identical closed form on both engines.
    # The three metric ranks share ONE sequence pass: each customer explodes
    # to (metric, bucket, tiebreak) rows and with_global_seq runs partitioned
    # by metric — one bucket aggregation + one partitioned window instead of
    # three chained passes re-shuffling the customer frame per metric.
    # Per-metric total orders are encoded exactly as the chained form had
    # them: r = (recency asc, custkey), f = (frequency desc, custkey),
    # m = ($1000-coarsened monetary desc buckets; monetary desc, custkey).
    from lets_talk_cdc_change_feed_playground_spark.functions.sequence import (
        with_global_seq,
    )

    n_c = per_cust.agg(F.count(F.lit(1)).alias("n_cust"))
    zero = F.lit(0).cast("decimal(38,2)")
    ex = per_cust.select(
        "o_custkey",
        "monetary",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("metric"),
                    F.col("recency_days").cast("long").alias("bucket"),
                    zero.alias("ord1"),
                ),
                F.struct(
                    F.lit("f").alias("metric"),
                    (-F.col("frequency")).cast("long").alias("bucket"),
                    zero.alias("ord1"),
                ),
                F.struct(
                    F.lit("m").alias("metric"),
                    F.expr(
                        "-cast(monetary * 100 as decimal(38,0)) div 100000"
                    ).cast("long").alias("bucket"),
                    (-F.col("monetary")).cast("decimal(38,2)").alias("ord1"),
                ),
            )
        ).alias("mx"),
    ).select("o_custkey", "monetary", "mx.metric", "mx.bucket", "mx.ord1")
    ranked = with_global_seq(
        ex,
        "bucket",
        ["ord1", "o_custkey"],
        out_col="rk",
        partition_cols=("metric",),
    )
    scored = (
        ranked.crossJoin(F.broadcast(n_c))
        .select(
            "o_custkey",
            "metric",
            "monetary",
            F.expr("cast((rk - 1) * 4 div n_cust + 1 as int)").alias("q"),
        )
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("metric") == "r", F.col("q"))).alias("r"),
            F.max(F.when(F.col("metric") == "f", F.col("q"))).alias("f"),
            F.max(F.when(F.col("metric") == "m", F.col("q"))).alias("m"),
            F.max("monetary").alias("monetary"),
        )
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("monetary").cast("decimal(38,2)").cast("string").alias("segment_value"),
        )
        .select(
            F.expr("cast(r * 100 + f * 10 + m as int)").alias("rfm_code"),
            F.col("r").cast("int").alias("r"),
            F.col("f").cast("int").alias("f"),
            F.col("m").cast("int").alias("m"),
            "n_customers",
            "segment_value",
        )
        .orderBy("rfm_code")
    )


RFM_SQL = """
WITH o AS (
  SELECT o_custkey, o_totalprice, epoch_ms(o_orderdate) AS od_ms FROM orders
),
mx AS (SELECT max(od_ms) AS now_ms FROM o),
per_cust AS (
  SELECT o_custkey,
         (now_ms - max(od_ms)) // 86400000 AS recency_days,
         count(*) AS frequency,
         CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS monetary
  FROM o, mx GROUP BY o_custkey, now_ms
),
nc AS (SELECT count(*) AS n_cust FROM per_cust),
scored AS (
  SELECT o_custkey, monetary,
         CAST((row_number() OVER (ORDER BY recency_days ASC, o_custkey) - 1) * 4 // n_cust + 1 AS INT) AS r,
         CAST((row_number() OVER (ORDER BY frequency DESC, o_custkey) - 1) * 4 // n_cust + 1 AS INT) AS f,
         CAST((row_number() OVER (ORDER BY monetary DESC, o_custkey) - 1) * 4 // n_cust + 1 AS INT) AS m
  FROM per_cust, nc
)
SELECT CAST(r * 100 + f * 10 + m AS INT) AS rfm_code,
       CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(CAST(sum(monetary) AS DECIMAL(38,2)) AS VARCHAR) AS segment_value
FROM scored GROUP BY r, f, m
ORDER BY rfm_code
"""


def parts_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: cumulative revenue
    share in basis points over the revenue-ranked part list buckets parts
    into A (top 70%), B (to 90%), C (tail).  The running share uses the
    two-phase prefix pattern over the per-part aggregate (bounded rows) —
    the raw lineitem scan contributes one map-side-combinable aggregation."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("cast(l_extendedprice * (1 - l_discount) as decimal(38,6))").alias("rev"),
    )
    # Session-staged: the prefix machinery below consumes the per-part
    # aggregate three times (local window pass, per-bucket totals broadcast
    # build, final join) and the grand total a fourth — unstaged, each
    # consumer re-ran the full lineitem scan + aggregation as its own job
    # (same fix as the RFM per-customer frame).  The staged frame is part-
    # grain: bounded by |part|, not |lineitem|.
    from lets_talk_cdc_change_feed_playground_spark.operators.shared import shared_df

    per_part = shared_df(
        spark,
        ("abc_per_part", sf_dir),
        lambda: li.groupBy("l_partkey").agg(
            F.sum("rev").alias("revenue"), F.count(F.lit(1)).alias("n_lines")
        ),
    )
    tot = per_part.agg(F.sum("revenue").alias("tot_rev"))
    # running revenue via the two-phase prefix pattern (bucket = coarse
    # negated-revenue band, a monotone coarsening of the desc ordering) —
    # no part-sized single-task window
    from lets_talk_cdc_change_feed_playground_spark.functions.sequence import (
        with_prefix_aggs,
    )

    pref = with_prefix_aggs(
        per_part,
        F.expr("-cast(revenue * 1000000 as decimal(38,0)) div 1000000000"),
        [F.desc("revenue"), "l_partkey"],
        sums={"cum_rev": "revenue"},
    )
    ranked = pref.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "revenue",
        "n_lines",
        F.expr(
            "cast(10000 * cast(cum_rev * 1000000 as decimal(38,0))"
            " div cast(tot_rev * 1000000 as decimal(38,0)) as bigint)"
        ).alias("cum_share_bp"),
    )
    classed = ranked.select(
        "l_partkey",
        F.when(F.col("cum_share_bp") <= 7000, "A")
        .when(F.col("cum_share_bp") <= 9000, "B")
        .otherwise("C")
        .alias("abc_class"),
        "revenue",
        "n_lines",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("revenue").cast("decimal(38,6)").cast("string").alias("class_revenue"),
            F.sum("n_lines").cast("long").alias("n_lines"),
        )
        .orderBy("abc_class")
    )


ABC_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS revenue,
         count(*) AS n_lines
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT sum(revenue) AS tot_rev FROM per_part),
ranked AS (
  SELECT l_partkey, revenue, n_lines,
         CAST((10000 * CAST(sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000 AS HUGEINT))
              // CAST(tot_rev * 1000000 AS HUGEINT) AS BIGINT) AS cum_share_bp
  FROM per_part, tot
),
classed AS (
  SELECT l_partkey, revenue, n_lines,
         CASE WHEN cum_share_bp <= 7000 THEN 'A'
              WHEN cum_share_bp <= 9000 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(CAST(sum(revenue) AS DECIMAL(38,6)) AS VARCHAR) AS class_revenue,
       CAST(sum(n_lines) AS BIGINT) AS n_lines
FROM classed GROUP BY abc_class ORDER BY abc_class
"""

QUERIES["customers_rfm_segments"] = customers_rfm_segments
QUERIES["parts_abc_classes"] = parts_abc_classes
ORACLE["customers_rfm_segments"] = RFM_SQL
ORACLE["parts_abc_classes"] = ABC_SQL
