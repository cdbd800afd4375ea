"""Third-wave star-schema shapes: correlated subqueries, cross-dimension
CASE aggregation, scalar-subquery thresholds — the remaining join/agg
patterns a serving engine meets (TPC-H Q2/Q7/Q22 families)."""

from __future__ import annotations

from pyspark.sql import Window
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
    "join_min_per_group_corr",
    """
    WITH cheapest AS (
      SELECT p_partkey, min(p_retailprice) OVER (PARTITION BY p_brand) AS min_brand_price,
             p_retailprice, p_brand, p_name
      FROM part
    )
    SELECT p_partkey, p_brand, p_name, p_retailprice
    FROM cheapest
    WHERE p_retailprice = min_brand_price
    ORDER BY p_brand, p_partkey
    """,
)
def join_min_per_group_corr(spark, sf_dir):
    """Correlated 'row matching the group minimum' (TPC-H Q2's
    min-supplycost pattern): rewritten as a window min — one shuffle on the
    group key instead of a correlated re-scan per row, which is the
    Spark-correct decorrelation (Catalyst does the same rewrite for
    correlated scalar subqueries)."""
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        p.withColumn("min_brand_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_brand_price"))
        .select("p_partkey", "p_brand", "p_name", "p_retailprice")
        .orderBy("p_brand", "p_partkey")
    )


@query(
    "agg_shipping_volume_years",
    f"""
    SELECT n_name,
           round(CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                               AND l_shipdate < TIMESTAMP '1997-01-01'
                              THEN {_SQL_REV} END) AS DOUBLE), 2) AS rev_1996,
           round(CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                               AND l_shipdate < TIMESTAMP '1998-01-01'
                              THEN {_SQL_REV} END) AS DOUBLE), 2) AS rev_1997
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name ORDER BY n_name
    """,
)
def agg_shipping_volume_years(spark, sf_dir):
    """Cross-year supplier-nation volume (TPC-H Q7 family): one scan, the
    per-year split done with conditional aggregation instead of two passes
    or a self-join; the year range filter still pushes to the scan.

    Scale: nation (25 rows) keeps its broadcast hint; supplier scales with
    the data, so its join strategy is left to AQE (broadcast at small sf,
    shuffled at 100 TB) rather than a forced hint that would OOM."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")

    def year_rev(start, end):
        in_year = (F.col("l_shipdate") >= F.to_timestamp(F.lit(start))) & (
            F.col("l_shipdate") < F.to_timestamp(F.lit(end))
        )
        return F.round(F.sum(F.when(in_year, _rev())).cast("double"), 2)

    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            year_rev("1996-01-01", "1997-01-01").alias("rev_1996"),
            year_rev("1997-01-01", "1998-01-01").alias("rev_1997"),
        )
        .orderBy("n_name")
    )


@query(
    "join_rich_inactive_customers",
    """
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
    ORDER BY c_custkey
    """,
)
def join_rich_inactive_customers(spark, sf_dir):
    """Scalar-subquery threshold + anti join (TPC-H Q22 family): customers
    above the (positive) average balance with no recent orders. The scalar
    average is a broadcast single-row join; the NOT EXISTS is a left-anti
    hash join — no correlated per-row probing.

    Float note: the unrounded avg(c_acctbal) threshold is computed by both
    engines over the same ~1.5k values; a strict > comparison against a
    value that sits within float-epsilon of a customer's balance could
    diverge, so the oracle and plan share the identical aggregation shape
    (sum/count both in double, same input order irrelevance since the
    probability of an exact boundary hit is ~0 in this data)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01"))
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
    )
