"""Declarative data-quality rule battery — the constraint-checking layer
(the Deequ/Great-Expectations idea, re-expressed as plain aggregates) a
pipeline runs on every ingest before publishing a snapshot.

One registered query emits one row per rule: (rule_id, metric,
threshold, passed), where metric is the VIOLATION COUNT — integer, so
cross-engine comparison is exact with no float tolerance. The battery is
deliberately multi-table: completeness and domain checks on the events
fact, uniqueness on its key, referential integrity into the customer
dimension, and a range sanity check on balances.

Reference parity: the reference trusts its single-writer ETL and has no
constraint layer; this extends it per the BASELINE north-star list
(pipelines at 100 TB publish snapshots only behind green checks —
sink_manifest_snapshot is the natural consumer).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import query, t

_DQ_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
_DQ_TS_LO = "2024-01-01 00:00:00"
_DQ_TS_HI = "2024-02-01 00:00:00"
_DQ_BAL_ABS_MAX = 100000.0

_TYPES_SQL = ", ".join(f"'{x}'" for x in _DQ_EVENT_TYPES)


@query(
    "op_dq_rules",
    f"""
    WITH ev AS (
      SELECT
        CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT) AS null_value,
        CAST(count(*) FILTER (WHERE event_type IS NULL
               OR event_type NOT IN ({_TYPES_SQL})) AS BIGINT) AS bad_type,
        CAST(count(*) FILTER (WHERE ts IS NULL
               OR ts <  TIMESTAMP '{_DQ_TS_LO}'
               OR ts >= TIMESTAMP '{_DQ_TS_HI}') AS BIGINT) AS bad_ts,
        CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS dup_key
      FROM events
    ),
    orphan AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    ),
    bal AS (
      SELECT CAST(count(*) FILTER (WHERE c_acctbal IS NULL
               OR abs(c_acctbal) > {_DQ_BAL_ABS_MAX}) AS BIGINT) AS n
      FROM customer
    )
    SELECT rule_id, metric, CAST(0 AS BIGINT) AS threshold,
           metric <= 0 AS passed
    FROM (
      SELECT 'events_value_complete' AS rule_id, null_value AS metric FROM ev
      UNION ALL SELECT 'events_type_in_domain', bad_type FROM ev
      UNION ALL SELECT 'events_ts_in_range', bad_ts FROM ev
      UNION ALL SELECT 'events_key_unique', dup_key FROM ev
      UNION ALL SELECT 'orders_custkey_resolves', n FROM orphan
      UNION ALL SELECT 'customer_balance_sane', n FROM bal
    )
    ORDER BY rule_id
    """,
)
def op_dq_rules(spark, sf_dir):
    """Six-constraint data-quality battery: completeness (events.value),
    domain (event_type in its enum), range (ts inside the ingest
    window), key uniqueness (event_id), referential integrity
    (orders.o_custkey resolves in customer), and balance sanity
    (|c_acctbal| bounded). Emits (rule_id, violation count, threshold,
    passed) — the gate sink_manifest_snapshot would consult before
    publishing.

    Scale: all four events rules FUSE into one conditional-aggregate
    scan (one pass over the fact, map-side partials — adding a rule adds
    a column, not a scan); referential integrity is one anti join
    (left_anti stops probing on first match, AQE broadcasts the dim key
    set when it fits); the balance rule is one dimension scan. Metrics
    are integer violation counts, so pass/fail is exact in both engines
    — no float thresholds to drift."""
    return dq_rules_over(
        t(spark, sf_dir, "events"),
        t(spark, sf_dir, "orders"),
        t(spark, sf_dir, "customer"),
    )


def dq_rules_over(events, orders, customer):
    """The rule battery over any (events, orders, customer)-shaped
    DataFrames — factored out so tests can feed corpora with KNOWN
    violations and a pipeline can gate arbitrary staged snapshots."""
    rules = (
        dq_events_rules_over(events)
        .unionByName(
            orders.join(
                customer, orders["o_custkey"] == customer["c_custkey"], "left_anti"
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .selectExpr("'orders_custkey_resolves' AS rule_id", "n AS metric")
        )
        .unionByName(
            customer.agg(
                F.count(
                    F.when(
                        F.col("c_acctbal").isNull()
                        | (F.abs(F.col("c_acctbal")) > _DQ_BAL_ABS_MAX),
                        1,
                    )
                )
                .cast("bigint")
                .alias("n")
            ).selectExpr("'customer_balance_sane' AS rule_id", "n AS metric")
        )
    )
    return _verdicts(rules)


def _verdicts(rules):
    return rules.select(
        "rule_id",
        "metric",
        F.lit(0).cast("bigint").alias("threshold"),
        (F.col("metric") <= 0).alias("passed"),
    ).orderBy("rule_id")


def dq_events_verdicts(events):
    """Verdict rows (rule_id, metric, threshold, passed) for just the
    events battery — what streaming/dq_gate.py evaluates per batch."""
    return _verdicts(dq_events_rules_over(events))


def dq_events_rules_over(events):
    """Just the four single-table events rules — the subset a streaming
    micro-batch gate can evaluate without dimension joins
    (streaming/dq_gate.py). One fused conditional-aggregate pass."""
    ev = events.agg(
        F.count(F.when(F.col("value").isNull(), 1)).cast("bigint").alias("null_value"),
        F.count(
            F.when(
                F.col("event_type").isNull()
                | ~F.col("event_type").isin(*_DQ_EVENT_TYPES),
                1,
            )
        )
        .cast("bigint")
        .alias("bad_type"),
        F.count(
            F.when(
                F.col("ts").isNull()
                | (F.col("ts") < F.lit(_DQ_TS_LO).cast("timestamp"))
                | (F.col("ts") >= F.lit(_DQ_TS_HI).cast("timestamp")),
                1,
            )
        )
        .cast("bigint")
        .alias("bad_ts"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("event_id")))
        .cast("bigint")
        .alias("dup_key"),
    )
    return (
        ev.selectExpr("'events_value_complete' AS rule_id", "null_value AS metric")
        .unionByName(
            ev.selectExpr("'events_type_in_domain' AS rule_id", "bad_type AS metric")
        )
        .unionByName(
            ev.selectExpr("'events_ts_in_range' AS rule_id", "bad_ts AS metric")
        )
        .unionByName(
            ev.selectExpr("'events_key_unique' AS rule_id", "dup_key AS metric")
        )
    )
