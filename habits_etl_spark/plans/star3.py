"""Fourth-wave star-schema shapes: the correlated-subquery / decorrelation
patterns (TPC-H Q4, Q13, Q16, Q17, Q18, Q21 families) a SQL engine must
decorrelate into joins. The testdata is TPC-H-ish but slimmer (no
partsupp, no l_commitdate/l_receiptdate, no comment columns), so each
query keeps the reference PATTERN — EXISTS semi join, outer-join count
distribution, NOT IN anti join, correlated scalar average, HAVING-IN,
double-correlated semi+anti — re-anchored on the available columns.

Spark never executes a correlated subquery per row: every shape below is
written directly as the decorrelated join/window plan Catalyst would
produce, so the physical plan is one or two hash shuffles regardless of
data size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import dsum, query, sql_dsum, t

# "late" for this dataset: shipped more than 90 days after the order date
# (stands in for TPC-H's l_receiptdate > l_commitdate, absent here).
_LATE_DAYS = 90


@query(
    "join_q4_priority",
    f"""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_q4_priority(spark, sf_dir):
    """Order-priority checking (TPC-H Q4 family): orders in one quarter
    with at least one LATE line, counted per priority. The correlated
    EXISTS decorrelates to a LEFT SEMI hash join on l_orderkey with the
    lateness predicate as a join residual — each order emitted once no
    matter how many late lines.

    Scale: the quarter filter pushes to the orders scan; the semi join
    shuffles on orderkey (both sides pruned to 2 columns); the final agg
    is 5 groups with map-side partials."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-07-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-10-01")))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "agg_q13_custdist",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def agg_q13_custdist(spark, sf_dir):
    """Customer order-count distribution (TPC-H Q13 family): LEFT OUTER
    join so zero-order customers land in the c_count=0 bucket, with the
    priority exclusion INSIDE the join condition (filtering after the join
    would silently drop those customers — the classic outer-join trap).

    Scale: one shuffle on custkey for join+count (orders pre-projected to
    2 columns), then a tiny re-agg on c_count."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q16_SIZES = (1, 5, 9, 14, 19, 23, 36, 45)


@query(
    "agg_q16_supplier_cnt",
    f"""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN {_Q16_SIZES}
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def agg_q16_supplier_cnt(spark, sf_dir):
    """Parts/supplier relationship count (TPC-H Q16 family): how many
    distinct suppliers ship each (brand, type, size), excluding flagged
    suppliers via NOT IN -> LEFT ANTI join (lineitem's distinct
    (partkey, suppkey) pairs stand in for the absent partsupp table).

    Scale: the distinct pair projection is the only wide shuffle; the
    anti join's build side (flagged suppliers) is tiny and AQE broadcasts
    it; part joins on partkey with the brand/size filters pushed to its
    scan. NOT IN's NULL trap doesn't apply (s_suppkey is a key, never
    NULL) — with nullable columns this would need a null-safe anti join."""
    ps = (
        t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(*_Q16_SIZES)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "agg_q17_small_qty_rev",
    f"""
    WITH lim AS (
      SELECT l_partkey AS pk,
             0.2 * round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                         / count(l_quantity), 6) AS qty_lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dsum("l_extendedprice", 2)} / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN lim ON pk = l_partkey
    WHERE p_brand = 'Brand#13' AND l_quantity < qty_lim
    """,
)
def agg_q17_small_qty_rev(spark, sf_dir):
    """Small-quantity-order revenue (TPC-H Q17 family): revenue from lines
    whose quantity is below 20% of that part's average quantity. The
    correlated scalar subquery (per-part average) decorrelates to a
    grouped aggregate joined back on partkey.

    Determinism: the average is computed as exact decimal sum / count,
    rounded to 6 digits BEFORE the 0.2 multiply, so both engines derive a
    bit-identical threshold regardless of per-partition sum order.

    Scale: per-part averages shuffle (l_partkey, partial sum/count) only;
    the brand filter pushes to the part scan, and AQE broadcasts the
    filtered part side of the final join."""
    li = t(spark, sf_dir, "lineitem")
    lim = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
                / F.count("l_quantity"),
                6,
            )
        ).alias("qty_lim")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(lim, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg((dsum("l_extendedprice", 2) / F.lit(7.0)).alias("avg_yearly"))
    )


_Q18_QTY = 300


@query(
    "join_q18_large_orders",
    f"""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS order_day,
           round(o_totalprice, 2) AS total_price,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > {_Q18_QTY}
    )
    GROUP BY c_custkey, c_name, o_orderkey, order_day, total_price
    ORDER BY total_price DESC, o_orderkey
    LIMIT 100
    """,
)
def join_q18_large_orders(spark, sf_dir):
    """Large-volume customers (TPC-H Q18 family): orders whose total
    quantity exceeds {_Q18_QTY}, with customer detail. The IN-subquery
    with HAVING decorrelates to a pre-aggregated key set joined as LEFT
    SEMI — the big lineitem table is aggregated once on orderkey, and only
    qualifying keys flow into the 3-way join.

    Scale: the HAVING agg and the detail agg share the orderkey shuffle
    key; qualifying orders are rare (~0.3%), so the joins after the semi
    filter are broadcast-sized under AQE. Top-k via
    TakeOrderedAndProject, never a global sort."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"))
        .filter(F.col("q") > _Q18_QTY)
        .select(F.col("l_orderkey").alias("bk"))
    )
    o = t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == F.col("bk"), "left_semi"
    )
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format(F.date_trunc("DAY", F.col("o_orderdate")), "yyyy-MM-dd").alias(
                "order_day"
            ),
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .agg(dsum("l_quantity", 4).alias("total_qty"))
        .orderBy(F.col("total_price").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "join_q21_sole_late_supplier",
    f"""
    WITH l AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    all_s AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l),
    late AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM l
      WHERE l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late t
    JOIN supplier ON s_suppkey = t.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM all_s a
        WHERE a.l_orderkey = t.l_orderkey AND a.l_suppkey <> t.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late x
        WHERE x.l_orderkey = t.l_orderkey AND x.l_suppkey <> t.l_suppkey
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def join_q21_sole_late_supplier(spark, sf_dir):
    """Suppliers who kept finished orders waiting (TPC-H Q21 family): the
    supplier was LATE on a multi-supplier order where no OTHER supplier
    was late — the canonical double-correlated EXISTS + NOT EXISTS,
    decorrelated into a semi join and an anti join on the same key with a
    suppkey-inequality residual.

    Scale: everything is keyed on l_orderkey — the per-order supplier
    sets, the semi, and the anti reuse one shuffle key (co-partitioned
    exchanges); `late` is a filtered projection so the anti join's build
    side is small; supplier name resolution is a broadcast-sized join
    under AQE."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    all_s = lo.select("l_orderkey", "l_suppkey").distinct()
    late = (
        lo.filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    t_arm = late.alias("t")
    others = all_s.alias("a")
    other_late = late.alias("x")
    sole_late = (
        t_arm.join(
            others,
            (F.col("a.l_orderkey") == F.col("t.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("t.l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("x.l_orderkey") == F.col("t.l_orderkey"))
            & (F.col("x.l_suppkey") != F.col("t.l_suppkey")),
            "left_anti",
        )
    )
    s = t(spark, sf_dir, "supplier")
    return (
        sole_late.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "agg_q12_late_by_priority",
    f"""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
    GROUP BY 1 ORDER BY 1
    """,
)
def agg_q12_late_by_priority(spark, sf_dir):
    """Late-shipment priority split (TPC-H Q12 family): among lineitems
    shipped late, how many belong to high- vs low-priority orders, per
    ship year. Q12's l_shipmode dimension and commit/receipt dates are
    absent from this dataset (see module docstring), so the PATTERN is
    kept — fact-to-fact join + disjoint conditional counts — anchored on
    ship year and the orderdate-lateness stand-in.

    Scale: the lateness predicate needs both sides, so it applies at the
    join, not the scan — but the join itself is the one shuffle (orders
    is fact-sized: no broadcast hint; AQE picks the strategy), and the
    final agg is |years| groups with map-side partials."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAY")
        )
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


_Q20_SHARE = 0.2


@query(
    "join_q20_dominant_suppliers",
    f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS supp_qty
      FROM lineitem GROUP BY 1, 2
    ),
    pt AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS part_qty
      FROM lineitem GROUP BY 1
    ),
    dom AS (
      SELECT ps.l_suppkey
      FROM ps JOIN pt USING (l_partkey)
      WHERE ps.supp_qty > {_Q20_SHARE} * pt.part_qty
      GROUP BY 1
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM dom)
    ORDER BY s.s_name
    """,
)
def join_q20_dominant_suppliers(spark, sf_dir):
    """Aggregate-vs-aggregate threshold semi join (TPC-H Q20's
    'excess stock' pattern re-anchored — no partsupp table here, see
    module docstring): suppliers who shipped MORE than a dominance
    share (20%) of some part's total shipped quantity, i.e. a per-(part, supplier) aggregate
    compared against the per-part aggregate, then a semi join into the
    supplier dimension. Q20's correlated subquery-on-aggregate becomes
    two hash-aggs sharing the l_partkey shuffle plus a left-semi join.

    Scale: both aggregates reduce the fact before any join; the
    dominant-supplier id set is collision-small and semi-joins (never
    outer-materializes) into the dimension. Decimal exact sums keep the
    share comparison engine-identical."""
    li = t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("supp_qty")
    )
    pt = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("part_qty")
    )
    dom = (
        ps.join(pt, "l_partkey")
        .filter(F.col("supp_qty") > _Q20_SHARE * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(dom, s["s_suppkey"] == dom["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
