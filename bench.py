#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a noop-format write (full plan execution, no
driver collect, no result materialization cost)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "agg_daily_rollup",
    "agg_sum_timeseries",
    "agg_conditional_pct",
    "agg_q1_pricing",
    "join_star_schema",
    "win_streaks",
    "win_analytic",
    "sort_limit_topk",
    "sink_upsert_events",
    "join_asof",
    "ext_exact_dedup",
    "ext_near_dedup_minhash",
    "ext_text_stats",
    "ext_topk_sim_search",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from habits_etl_spark.session import get_spark
    from habits_etl_spark.plans import QUERIES

    spark = get_spark("bench")

    # Warm up the JVM/session so the first query doesn't pay session-startup cost.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
