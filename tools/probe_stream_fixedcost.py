#!/usr/bin/env python
"""Streaming fixed-cost probe (r15, VERDICT r14 #7): attribute each
stream_*_e2e id's wall time between RESTART MACHINERY (checkpoint/offset
log/state-store load + commit of an availableNow trigger that finds no
new files) and the actual per-drop fold work — WITHOUT touching the e2e
ids themselves (a warm harness would weaken the restart semantics they
exist to witness).

Method, per id: (1) run the declared query exactly as the bench does
(noop sink) — its body stages N drops and runs N availableNow
micro-batch runs against one shared checkpoint; (2) immediately re-run
ONE more availableNow trigger against the SAME surviving checkpoint tree
with NO new files (the staging dir is wiped only by the NEXT invocation,
so the tree is intact) and time it. That second number is the pure
restart floor; e2e_sec - setup - n_drops * floor bounds the fold work.

Output: one JSON line per id + PROBE_r15_streaming.json next to the
repo root. Sidecar-only — no query result or bench methodology changes.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from habits_etl_spark.plans import QUERIES  # noqa: E402
from habits_etl_spark.plans import streaming_e2e as SE  # noqa: E402
from habits_etl_spark.plans.common import t  # noqa: E402
from habits_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_stream_fixedcost")

    def base_for(kind: str) -> str:
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        return os.path.join(
            SE._workdir_root(),
            "habits_etl_stream_e2e",
            spark.sparkContext.applicationId,
            kind,
            tag,
        )

    def fb_to(out: str):
        def fb(df, epoch_id):
            df.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out)

        return fb

    def restart_funnel(base: str) -> None:
        from habits_etl_spark.streaming.funnel import funnel_stream

        schema = t(spark, sf_dir, "events").select("ts", "user_id", "event_type").schema
        with SE._pinned_state_partitions(spark):
            q = (
                funnel_stream(
                    spark.readStream.schema(schema).parquet(os.path.join(base, "incoming"))
                )
                .writeStream.foreachBatch(fb_to(os.path.join(base, "updates")))
                .outputMode("update")
                .option("checkpointLocation", os.path.join(base, "checkpoint"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    def restart_retention(base: str) -> None:
        from habits_etl_spark.streaming.retention import retention_stream

        schema = t(spark, sf_dir, "events").select("ts", "user_id").schema
        with SE._pinned_state_partitions(spark):
            q = (
                retention_stream(
                    spark.readStream.schema(schema).parquet(os.path.join(base, "incoming"))
                )
                .writeStream.foreachBatch(fb_to(os.path.join(base, "updates")))
                .outputMode("update")
                .option("checkpointLocation", os.path.join(base, "checkpoint"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    def restart_rollup(base: str) -> None:
        from habits_etl_spark.streaming.rollup import start_continuous_rollup

        schema = (
            t(spark, sf_dir, "events")
            .select(
                "ts",
                F.col("user_id").alias("user_email"),
                F.col("event_type").alias("habit"),
                "value",
            )
            .schema
        )
        q = start_continuous_rollup(
            spark,
            source_dir=os.path.join(base, "incoming"),
            source_schema=schema,
            events_path=os.path.join(base, "events_fact"),
            rollup_path=os.path.join(base, "rollup"),
            checkpoint_path=os.path.join(base, "checkpoint"),
            backfill_horizon_days=36500,
            trigger={"availableNow": True},
            meditation_habit="purchase",
        )
        q.awaitTermination()

    targets = [
        ("stream_funnel_e2e", "funnel", SE._N_DROPS, restart_funnel),
        ("stream_retention_e2e", "retention", SE._N_DROPS_ILV, restart_retention),
        ("stream_rollup_e2e", "rollup", SE._N_DROPS_ILV, restart_rollup),
    ]
    results: dict[str, dict] = {}
    for name, kind, n_drops, restart in targets:
        spark.sparkContext.setJobDescription(f"probe:{name}:e2e")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        e2e = round(time.perf_counter() - t0, 3)
        # the invocation's staging tree survives until the NEXT invocation
        # wipes it — one more availableNow run with no new files is the
        # pure restart machinery (offset log + state-store load + commit)
        spark.sparkContext.setJobDescription(f"probe:{name}:restart-no-new-files")
        t0 = time.perf_counter()
        restart(base_for(kind))
        floor = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        results[name] = {
            "e2e_sec": e2e,
            "n_drops": n_drops,
            "restart_no_new_files_sec": floor,
            "restart_floor_share_of_e2e": round(n_drops * floor / e2e, 3) if e2e else None,
        }
        print(json.dumps({name: results[name]}))

    out = {
        "sf_dir": sf_dir,
        "protocol": (
            "per id: full declared-query run (noop sink), then ONE extra "
            "availableNow restart against the surviving checkpoint with no "
            "new files; floor x n_drops bounds the machinery share, the "
            "rest is staging + stateful fold + final read-back"
        ),
        "results": results,
    }
    with open(os.path.join(REPO, "PROBE_r15_streaming.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
