"""Tests for the data-quality rule battery and the distribution-rank
window family."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import t
from habits_etl_spark.plans.dq import dq_rules_over, op_dq_rules
from habits_etl_spark.plans.windows import win_distribution_ranks


def test_dq_all_green_on_testdata(spark, sf_dir):
    rows = {r.rule_id: r for r in op_dq_rules(spark, sf_dir).collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert r.passed and r.metric == 0, r


def test_dq_detects_injected_violations(spark):
    events = spark.createDataFrame(
        [
            # dup key + null value + bad type + out-of-range ts
            (1, "2024-01-02 00:00:00", 1, "click", 1.0),
            (1, "2024-01-03 00:00:00", 1, "view", 2.0),
            (2, "2024-01-04 00:00:00", 2, "bogus", None),
            (3, "2023-12-31 23:59:59", 2, "click", 4.0),
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    orders = spark.createDataFrame(
        [(10, 1), (11, 999)], "o_orderkey long, o_custkey long"
    )
    customer = spark.createDataFrame(
        [(1, 5.0), (2, 200000.0)], "c_custkey long, c_acctbal double"
    )
    got = {r.rule_id: r.metric for r in dq_rules_over(events, orders, customer).collect()}
    assert got == {
        "events_value_complete": 1,
        "events_type_in_domain": 1,
        "events_ts_in_range": 1,
        "events_key_unique": 1,
        "orders_custkey_resolves": 1,
        "customer_balance_sane": 1,
    }


def test_distribution_ranks_against_python(spark, sf_dir):
    rows = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4).cast("double").alias("tv"))
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r.event_type].append((r.user_id, r.tv))
    got = defaultdict(dict)
    for r in win_distribution_ranks(spark, sf_dir).collect():
        got[r.event_type][r.user_id] = r
    for et, members in groups.items():
        order = sorted(members, key=lambda m: (-m[1], m[0]))
        n = len(order)
        for i, (uid, tv) in enumerate(order):
            r = got[et][uid]
            assert r.total_value == tv
            # ANSI ntile: first (n mod 10) buckets get ceil(n/10)
            big, rem = divmod(n, 10)
            if i < (big + 1) * rem:
                expect_decile = i // (big + 1) + 1
            else:  # only reachable when big >= 1 (n >= 10)
                expect_decile = rem + (i - (big + 1) * rem) // big + 1
            assert r.decile == expect_decile, (et, uid, i, n)
            assert abs(r.pct_rank - (i / (n - 1) if n > 1 else 0.0)) < 1e-6
            assert abs(r.cume - (i + 1) / n) < 1e-6
