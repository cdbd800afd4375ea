"""Star-schema analytics over the TPC-H-ish tables — the [E]
``join_star_schema`` row of SURVEY §2.6 plus the canonical pricing-summary
aggregate. These exercise the join strategies and multi-aggregate shapes a
100 TB deployment lives on.

Decimal discipline: every monetary aggregate goes through DECIMAL casts
(see plans/common.py rule 1) so results are bit-identical to the oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.operators.asof import asof_join
from habits_etl_spark.plans.common import (
    TS_FMT_DUCK,
    davg,
    dsum,
    fmt_ts,
    query,
    sql_davg,
    sql_dsum,
    t,
)

# price * (1 - discount), exact (Spark side; lazy — Column exprs need a live
# SparkContext in classic mode, so don't build them at import time)
def _revenue():
    return F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1).cast("decimal(12,6)") - F.col("l_discount").cast("decimal(12,6)")
    )
# the same expression in DuckDB SQL
_SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (CAST(1 AS DECIMAL(12,6)) - CAST(l_discount AS DECIMAL(12,6)))"
)


@query(
    "agg_q1_pricing",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum({_SQL_REVENUE}) AS DOUBLE), 2) AS sum_disc_price,
           round(CAST(sum(CAST(CAST({_SQL_REVENUE} AS DECIMAL(24,8))
                 * (CAST(1 AS DECIMAL(12,6)) + CAST(l_tax AS DECIMAL(12,6))) AS DECIMAL(30,10))) AS DOUBLE), 2) AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_q1_pricing(spark, sf_dir):
    """Pricing-summary aggregate (TPC-H Q1 shape): 2 group keys, 8
    simultaneous aggregates. Spark: partial hash agg -> 1 shuffle on the
    2-key group (cardinality ~6) -> final agg; all codegen."""
    li = t(spark, sf_dir, "lineitem")
    charge = (
        _revenue().cast("decimal(24,8)")
        * (F.lit(1).cast("decimal(12,6)") + F.col("l_tax").cast("decimal(12,6)"))
    ).cast("decimal(30,10)")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(_revenue()).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "join_star_schema",
    f"""
    SELECT n_name,
           round(CAST(sum({_SQL_REVENUE}) AS DOUBLE), 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def join_star_schema(spark, sf_dir):
    """Local-supplier-revenue star join (TPC-H Q5 shape): 5-way equi-join
    with a region filter.

    Scale: only the bounded dimensions (nation: 25 rows, region: 5 rows
    post-filter) carry an explicit broadcast hint. customer/supplier SCALE
    WITH THE DATA — a forced broadcast of a multi-GB table OOMs executors
    at 100 TB, so those joins are left to AQE, which picks broadcast from
    post-filter runtime sizes at small sf and shuffled-hash/SMJ at scale.
    lineitem->orders is the only guaranteed big-to-big join: a shuffle on
    orderkey, which AQE skew-splits if needed. The o_orderdate filter is
    pushed below the joins."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_revenue()).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "join_left_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    ORDER BY c_custkey
    """,
)
def join_left_semi(spark, sf_dir):
    """EXISTS as a left-semi join (SURVEY §2.6 join_star_schema family).
    Scale: semi joins only ship the join keys of the probe side."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_left_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def join_left_anti(spark, sf_dir):
    """NOT EXISTS as a left-anti join — also the building block of the
    engine's append-once landing (sinks/landing.py)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "agg_grouping_sets",
    """
    SELECT r_name, n_name, count(*) AS n_customers,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Multi-grain rollup (SURVEY §2.5 agg_grouping_sets [E]): region ->
    nation -> grand total in one pass (Spark Expand + single shuffle)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"), 2).alias("sum_acctbal"),
        )
    )


@query("agg_approx_distinct")  # no oracle: approximate result by design
def agg_approx_distinct(spark, sf_dir):
    """HyperLogLog++ approximate distinct (SURVEY §2.5 [E]) — the 100 TB
    substitute for exact DISTINCT dashboards. rows-only driver check (the
    estimate is engine-specific by design; rsd=0.05)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.05).alias("approx_parts"),
        F.count(F.lit(1)).alias("n"),
    ).orderBy("l_returnflag")


@query(
    "join_asof",
    f"""
    WITH clicks AS (
      SELECT user_id, ts, value, event_id,
             row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'click'
    ),
    c AS (SELECT user_id, ts, value, event_id FROM clicks WHERE rn = 1),
    p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '{TS_FMT_DUCK}') AS ts_s,
           strftime(c.ts, '{TS_FMT_DUCK}') AS asof_ts_s,
           c.value AS asof_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark, sf_dir):
    """As-of join (SURVEY §2.6 [E]): for each purchase, the user's latest
    click at-or-before it. Implemented via the union + carry-forward
    pattern (operators/asof.py) — one shuffle, no range explosion."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    joined = asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload_cols=["value"],
        tie_col="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        fmt_ts(F.col("ts")).alias("ts_s"),
        fmt_ts(F.col("asof_ts")).alias("asof_ts_s"),
        F.col("asof_value").alias("asof_value"),
    )
