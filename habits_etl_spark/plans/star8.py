"""TPC-H-family star queries, wave 8: Q2, the correlated-min subquery —
the last of the 22 classic query SHAPES the testdata schema can express
(star.py..star7.py carry the other 21). "For each qualifying part, the
supplier offering the minimum supply cost within a region."

The testdata has no ``partsupp`` table, so the part-supplier cost
relation is DERIVED from the fact table: supply_cost(part, supplier) =
the minimum effective unit price (extendedprice x (1 - discount) /
quantity) that supplier ever shipped that part at — a groupBy over
lineitem. The Q2 skeleton is untouched: candidate relation -> correlated
per-part MIN over suppliers in one region -> equality join back ->
dimension decoration -> top-100 by supplier balance.

Reference parity: the reference's analytical surface is the Grafana SQL
in its README plus sql/001_schema.sql; this extends it per the BASELINE
north-star list like plans/star3.py. [E] extension; no reference twin.

Cross-engine float rule: the unit price is per-row double arithmetic
(mul/sub/div are correctly-rounded IEEE, identical in Spark and DuckDB)
and both MIN and the min-equality join compare those identical doubles —
no sum enters any comparison, so no DECIMAL promotion is needed
(plans/common.py rule 1); rounding happens only at output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import query, t

_Q2_REGION = "EUROPE"
_Q2_TYPE = "STANDARD"
_Q2_SIZE_LO, _Q2_SIZE_HI = 10, 20


@query(
    "join_q2_min_cost_supplier",
    f"""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice * (1.0 - l_discount) / l_quantity) AS supplycost
      FROM lineitem GROUP BY 1, 2
    ),
    rs AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = '{_Q2_REGION}'
    ),
    cand AS (
      SELECT p.p_partkey, p.p_type, p.p_size,
             rs.s_suppkey, rs.s_name, rs.s_acctbal, rs.n_name, ps.supplycost
      FROM ps
      JOIN rs ON rs.s_suppkey = ps.suppkey
      JOIN part p ON p.p_partkey = ps.partkey
      WHERE p.p_type = '{_Q2_TYPE}'
        AND p.p_size BETWEEN {_Q2_SIZE_LO} AND {_Q2_SIZE_HI}
    ),
    best AS (
      SELECT p_partkey, min(supplycost) AS min_cost FROM cand GROUP BY 1
    )
    SELECT c.s_acctbal, c.s_name, c.n_name,
           c.p_partkey, c.p_type, CAST(c.p_size AS INT) AS p_size,
           c.s_suppkey, round(c.supplycost, 4) AS supplycost
    FROM cand c JOIN best b
      ON b.p_partkey = c.p_partkey AND c.supplycost = b.min_cost
    ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, c.p_partkey, c.s_suppkey
    LIMIT 100
    """,
)
def join_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 family ("minimum cost supplier"): among {_Q2_REGION}
    suppliers, the one(s) offering each qualifying part ({_Q2_TYPE},
    size {_Q2_SIZE_LO}-{_Q2_SIZE_HI}) at the minimum derived supply
    cost, top-100 by supplier account balance. Completes the 22/22
    TPC-H shape coverage (module docstring has the partsupp re-anchor).

    Scale: ONE fact shuffle — the (partkey, suppkey) min-unit-price
    hash-agg over lineitem, with map-side partials. Everything after it
    is broadcast-shaped: the region-filtered supplier dim and the
    type/size-filtered part dim both broadcast into the derived ps
    relation (filters pushed to their parquet scans, pruning ps BEFORE
    the per-part min), and the correlated MIN is a groupBy over the
    already-small cand relation joined back on (partkey, cost) — AQE
    broadcasts it. The top-100 is TakeOrderedAndProject (bounded heap
    per partition), never a global sort of cand."""
    li = t(spark, sf_dir, "lineitem")
    unit = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        / F.col("l_quantity")
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(unit).alias("supplycost"))

    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == _Q2_REGION)
    rs = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_type") == _Q2_TYPE)
        & F.col("p_size").between(_Q2_SIZE_LO, _Q2_SIZE_HI)
    )
    cand = (
        ps.join(F.broadcast(rs), ps["suppkey"] == rs["s_suppkey"])
        .join(F.broadcast(p), ps["partkey"] == p["p_partkey"])
        .select(
            "p_partkey", "p_type", "p_size",
            "s_suppkey", "s_name", "s_acctbal", "n_name", "supplycost",
        )
    )
    # best derives FROM cand (a self-join by lineage), so its key is
    # renamed to keep the join condition unambiguous
    best = cand.groupBy(F.col("p_partkey").alias("best_partkey")).agg(
        F.min("supplycost").alias("min_cost")
    )
    # A shuffle_hash hint on `best` was measured in r14 (guide §3.1) and
    # REJECTED: alternating solo A/B at sf0.1 showed no repeatable win
    # (unhinted 1.48/1.55 s vs hinted 1.70/1.54 s medians) — the
    # apparent 14% gain in the first sweep was host churn.
    out = cand.join(
        best,
        (cand["p_partkey"] == best["best_partkey"])
        & (cand["supplycost"] == best["min_cost"]),
    ).select(
        cand["s_acctbal"], cand["s_name"], cand["n_name"],
        cand["p_partkey"], cand["p_type"],
        cand["p_size"].cast("int").alias("p_size"),
        cand["s_suppkey"],
        F.round(cand["supplycost"], 4).alias("supplycost"),
    )
    return out.orderBy(
        F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "s_suppkey"
    ).limit(100)
