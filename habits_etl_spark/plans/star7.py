"""TPC-H-family star queries, wave 7: the two remaining query SHAPES from
the classic suite that the testdata schema can express — Q22's
scalar-subquery-threshold + anti-join ("customers likely to buy but
idle") and Q11's global-fraction HAVING cut ("groups holding an outsized
share of total value").

Reference parity: the reference's analytical surface is the Grafana SQL in
its README plus sql/001_schema.sql; these extend it per the BASELINE
north-star list like plans/star3.py. No partsupp table exists in the
testdata, so both queries re-anchor on customer balances (same plan
shapes, different fact columns) — documented per query.

Cross-engine float rule: every threshold comparison against an average or
a fraction of a global total is done in DECIMAL via the multiply-through
trick (x * n > total instead of x > total / n), so no engine ever divides
and the comparison is exact in both (plans/common.py rule 1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import dec, query, t


_Q22_BIG_TICKET = 450000.0  # "idle" = never placed an order above this price


@query(
    "join_q22_idle_rich",
    f"""
    WITH pos AS (
      SELECT sum(CAST(c_acctbal AS DECIMAL(18,6))) AS total,
             CAST(count(*) AS DECIMAL(18,0)) AS n
      FROM customer WHERE c_acctbal > 0.0
    ),
    idle AS (
      SELECT c.c_nationkey, c.c_acctbal
      FROM customer c CROSS JOIN pos
      WHERE CAST(c.c_acctbal AS DECIMAL(18,6)) * pos.n > pos.total
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > {_Q22_BIG_TICKET})
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM idle JOIN nation n ON idle.c_nationkey = n.n_nationkey
    GROUP BY 1 ORDER BY 1
    """,
)
def join_q22_idle_rich(spark, sf_dir):
    """TPC-H Q22 family ("global sales opportunity"): customers with an
    above-average account balance who have never placed a big-ticket
    order, counted and summed per nation. Two testdata re-anchors, same
    plan shape as Q22: the customer table has no phone column so the
    country-code grouping becomes the nation dimension, and every
    synthetic customer has ≥1 order so "has no orders" becomes "has no
    order above _Q22_BIG_TICKET" (a filter pushed into the anti-join
    side — the NOT-EXISTS-with-predicate variant). The shape is intact:
    scalar aggregate subquery → threshold filter → anti join on the
    fact → small group-by.

    Scale: the scalar (total, n) is a full-reduce to ONE row, broadcast
    into the filter — no shuffle. The big-ticket filter prunes the
    orders side BEFORE its anti-join shuffle (pushed to the parquet
    scan), and only customers surviving the balance cut shuffle on the
    key; Spark's left_anti stops probing on first match. The final
    group-by is nation-bounded (~25 rows). The average-threshold
    comparison is the decimal multiply-through `bal * n > total`, never
    a division, so Spark and DuckDB agree exactly even for a customer
    sitting on the mean."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > _Q22_BIG_TICKET
    )
    n = t(spark, sf_dir, "nation")
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(dec("c_acctbal")).alias("total"),
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
    )
    rich = (
        c.crossJoin(F.broadcast(pos))
        .filter(dec("c_acctbal") * F.col("n") > F.col("total"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return (
        idle.join(F.broadcast(n), idle["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


# Q11 family: a nation "concentrates value" when it holds more than
# 1/_Q11_DENOM of the global customer balance (TPC-H Q11 uses
# 0.0001/SF of total stock value; same shape, schema re-anchored).
_Q11_DENOM = 25


@query(
    "agg_q11_value_concentration",
    f"""
    WITH per AS (
      SELECT c_nationkey, sum(CAST(c_acctbal AS DECIMAL(18,6))) AS bal
      FROM customer WHERE c_acctbal > 0.0 GROUP BY 1
    ),
    tot AS (SELECT sum(bal) AS g FROM per)
    SELECT n.n_name, CAST(per.bal AS DOUBLE) AS nation_bal
    FROM per CROSS JOIN tot
    JOIN nation n ON per.c_nationkey = n.n_nationkey
    WHERE per.bal * {_Q11_DENOM} > tot.g
    ORDER BY nation_bal DESC, n.n_name
    """,
)
def agg_q11_value_concentration(spark, sf_dir):
    """TPC-H Q11 family ("important stock"): nations holding more than a
    1/25 share (_Q11_DENOM) of the global positive customer balance —
    the group-vs-global-total HAVING shape (no partsupp table in the
    testdata, so value = customer balances; the plan is Q11's).

    Scale: ONE shuffle — the per-nation hash-agg (map-side partials
    reduce the fact first). The global total re-reduces the ~25-row
    per-nation relation to one broadcast scalar; the share cut is the
    decimal multiply-through `bal * denom > g` (no division, exact in
    both engines). Compare agg_value_gini, which ranks the same
    concentration continuously."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    per = (
        c.filter(F.col("c_acctbal") > 0.0)
        .groupBy("c_nationkey")
        .agg(F.sum(dec("c_acctbal")).alias("bal"))
    )
    tot = per.agg(F.sum("bal").alias("g"))
    return (
        per.crossJoin(F.broadcast(tot))
        .filter(F.col("bal") * _Q11_DENOM > F.col("g"))
        .join(F.broadcast(n), per["c_nationkey"] == n["n_nationkey"])
        .select("n_name", F.col("bal").cast("double").alias("nation_bal"))
        .orderBy(F.col("nation_bal").desc(), "n_name")
    )
