"""Fifth-wave star shapes (TPC-H Q9, Q10, Q14, Q15, Q19 families):
LIKE-filtered multi-join profit rollup, return-flag top-k, conditional
ratio over a join, scalar-subquery-on-aggregate, and disjunctive
predicate pushdown. With star.py / star2.py / star3.py / extra.py this
closes out every TPC-H query family expressible on the slim testdata
schema (absent: partsupp-, shipmode- and comment-dependent parts).

Determinism: money sums go through DECIMAL(18,6) and round at output;
the Q15 max-revenue equality compares ROUNDED revenues so both engines
pick identical winners (plans/common.py rules).
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
    "agg_q9_profit_by_nation_year",
    f"""
    SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(CAST(sum({_SQL_REV}
                 - CAST(0.6 AS DECIMAL(12,6)) * CAST(p_retailprice AS DECIMAL(18,6))
                   * CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_name LIKE '%widget%'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
)
def agg_q9_profit_by_nation_year(spark, sf_dir):
    """Product-line profit by supplier nation and order year (TPC-H Q9
    family; ps_supplycost is absent, so cost is modeled as 60% of retail
    price x quantity — same operator shape, LIKE-filtered part dimension
    fanned through a 5-way join into a two-key rollup).

    Scale: the LIKE filter prunes part BEFORE the join (pushed to its
    scan); nation keeps a broadcast hint (25 rows); part/supplier/orders
    join strategy is AQE's call. One shuffle per non-broadcast join key,
    then a (nation x year) hash agg with map-side partials."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    cost = (
        F.lit(0.6).cast("decimal(12,6)")
        * F.col("p_retailprice").cast("decimal(18,6)")
        * F.col("l_quantity").cast("decimal(18,6)")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "n_name", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(F.round(F.sum(_rev() - cost).cast("double"), 2).alias("profit"))
        .orderBy("n_name", F.col("o_year").desc())
    )


@query(
    "join_q10_returned_items",
    f"""
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, n_name,
           round(CAST(sum({_SQL_REV}) AS DOUBLE), 2) AS revenue
    FROM customer
    JOIN orders ON o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    JOIN lineitem ON l_orderkey = o_orderkey AND l_returnflag = 'R'
    JOIN nation ON n_nationkey = c_nationkey
    GROUP BY c_custkey, c_name, acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def join_q10_returned_items(spark, sf_dir):
    """Returned-item reporting (TPC-H Q10 family): which customers
    returned the most revenue in a quarter. Filters live INSIDE the join
    tree (returnflag on the lineitem scan, the quarter on orders), the
    rollup groups on customer attributes, and the global top-20 is a
    TakeOrderedAndProject — never a full sort.

    Scale: lineitem's returnflag filter pushes to parquet (dictionary
    page skip); nation broadcasts; customer/orders joins are AQE-chosen.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-10-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .agg(F.round(F.sum(_rev()).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "agg_q14_promo_share",
    f"""
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_SQL_REV} END) AS DOUBLE)
                 / CAST(sum({_SQL_REV}) AS DOUBLE), 4) AS promo_pct
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def agg_q14_promo_share(spark, sf_dir):
    """Promotion revenue share (TPC-H Q14 family): one month of shipments,
    the promo/total ratio computed in a single pass with conditional
    aggregation — no self-join, no second scan. Both sums are exact
    decimals; only the final ratio is floating point.

    Scale: the month filter pushes to the lineitem scan; part joins on
    partkey under AQE; the agg is a single global pair of partials."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-10-01")))
    )
    p = t(spark, sf_dir, "part")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev())).cast("double")
                / F.sum(_rev()).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "join_q15_top_supplier",
    f"""
    WITH srev AS (
      SELECT l_suppkey AS supplier_no,
             round(CAST(sum({_SQL_REV}) AS DOUBLE), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN srev ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM srev)
    ORDER BY s_suppkey
    """,
)
def join_q15_top_supplier(spark, sf_dir):
    """Top supplier (TPC-H Q15 family): the scalar-subquery-on-aggregate
    pattern — suppliers whose quarterly revenue equals the global max.
    The revenue CTE is computed once and reused for both the ranking and
    the max (Spark reuses the exchange; the max side is a 1-row broadcast
    cross join, not a correlated probe).

    Determinism: revenues are rounded to cents BEFORE the max/equality,
    so both engines agree on ties (plans/common.py rule 3)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    srev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()).cast("double"), 2).alias("total_rev")
    )
    mx = srev.agg(F.max("total_rev").alias("mx"))
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(srev, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@query(
    "pred_q19_disjunctive",
    f"""
    SELECT round(CAST(sum({_SQL_REV}) AS DOUBLE), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity >= 1  AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def pred_q19_disjunctive(spark, sf_dir):
    """Discounted revenue under an OR-of-conjuncts predicate (TPC-H Q19
    family) — the disjunctive-pushdown stress shape. Catalyst extracts
    the common sub-predicates per side: the p_brand/p_size disjunction
    prunes the part scan and the l_quantity range union
    (1<=q<=30) prunes lineitem BEFORE the join; the full disjunction
    evaluates as the join residual. One hash join, one scalar agg."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = arm("Brand#12", 5, 1, 11) | arm("Brand#23", 10, 10, 20) | arm("Brand#3", 15, 20, 30)
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.round(F.sum(_rev()).cast("double"), 2).alias("revenue"))
    )
