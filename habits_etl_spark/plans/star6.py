"""Seventh-wave star shapes (TPC-H Q5 and Q7 families): local-supplier
revenue by nation and bilateral trade volume between two nations. These
close the last two TPC-H families the slim testdata schema can express —
Q5/Q7 need only lineitem+orders+customer+supplier+nation+region, all
present; Q2/Q11/Q20 (partsupp), Q12 (shipmode/commit/receipt dates) and
Q22 (phone prefixes) have no source columns (the Q22 *shape* — anti-join
against orders over above-average-balance customers — ships as
join_rich_inactive_customers in star2.py).

Reference parity: multi-dimension join + filtered rollup semantics of
habits-etl etl/transform.py (daily_rollup's filter/aggregate pipeline,
reference etl/transform.py:23-58) at TPC-H shape, same as star.py.

Determinism: revenue sums through DECIMAL (plans/common.py rule 1),
rounded at output; every ORDER BY carries a unique-key tie-break
(rule 4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import query, t

_SQL_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (CAST(1 AS DECIMAL(12,6)) - CAST(l_discount AS DECIMAL(12,6)))"
)


def _rev():
    return F.col("l_extendedprice").cast("decimal(18,6)") * (
        F.lit(1).cast("decimal(12,6)") - F.col("l_discount").cast("decimal(12,6)")
    )


@query(
    "join_q5_local_supplier_volume",
    f"""
    SELECT n_name,
           round(CAST(sum({_SQL_REV}) AS DOUBLE), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey AND r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def join_q5_local_supplier_volume(spark, sf_dir):
    """Local-supplier volume (TPC-H Q5 family): revenue from orders where
    the customer and the line's supplier share a nation, restricted to one
    region and one order year, rolled up per nation. The distinguishing
    shape is the NON-KEY equality ``c_nationkey = s_nationkey`` riding on
    the supplier join — a residual conjunct on an equi-join, not a
    separate join, so no extra shuffle and no nested loop.

    Determinism: decimal revenue sum (common.py rule 1); ORDER BY revenue
    DESC with n_name tie-break (rule 4).

    Scale: the orders date filter pushes to its scan and cuts the fact
    fan-in ~6x before the first shuffle; nation (25 rows) and region
    (5 rows) broadcast by hint; the customer/orders/lineitem/supplier
    joins shuffle on their keys and AQE picks build sides from
    post-filter sizes (no forced broadcasts of scaling tables). The
    same-nation residual evaluates inside the supplier join — at 100 TB
    it removes ~24/25ths of joined rows before the groupBy shuffle."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "agg_q7_nation_trade",
    f"""
    WITH shipping AS (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             {_SQL_REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
         OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
    )
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(volume) AS DOUBLE), 2) AS revenue
    FROM shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def agg_q7_nation_trade(spark, sf_dir):
    """Bilateral trade volume (TPC-H Q7 family): shipment revenue flowing
    between two specific nations in either direction, by supplier nation,
    customer nation, and ship year. Like Q8 the nation dimension plays two
    roles (supplier's and customer's), but here the pair predicate is a
    DISJUNCTION across both roles, so it can only be applied after both
    nation joins — the planner must keep it as a post-join filter while
    still pushing each side's scan filters.

    Determinism: decimal volume sums; full-key ORDER BY.

    Scale: the shipdate band pushes into the lineitem scan (2 of ~7
    years). Both nation joins broadcast 25-row builds, so the pair filter
    runs map-side right after them — before the groupBy shuffle, which
    then carries only the two surviving nation pairs. At 100 TB the
    orders/customer joins dominate; AQE sizes them from the post-filter
    lineitem side."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1995-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_nationkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_nationkey"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume").cast("double"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )
