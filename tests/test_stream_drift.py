"""Streaming PSI drift monitor: batch-equivalence against the shared
compute_psi formula, snapshot-update semantics across micro-batches,
and state carry-over across restarts."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import types as T

from habits_etl_spark.streaming.drift import compute_psi, psi_drift_stream, psi_round6

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

EDGES = [10.0, 20.0, 30.0]  # 4 bins
REF_COUNTS = [25, 25, 25, 25]  # a uniform frozen reference


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "source": str(tmp_path / "in"),
        "ckpt": str(tmp_path / "ckpt"),
        "out": str(tmp_path / "out"),
    }
    os.makedirs(d["source"])
    return d


def _ts(day: int, minute: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day) + datetime.timedelta(minutes=minute)


def _drain(spark, dirs):
    def fb(df, epoch_id):
        df.write.mode("append").parquet(dirs["out"])

    q = (
        psi_drift_stream(
            spark.readStream.schema(SCHEMA).parquet(dirs["source"]),
            EDGES,
            REF_COUNTS,
        )
        .writeStream.foreachBatch(fb)
        .outputMode("append")
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _bin(v: float) -> int:
    return 1 + sum(1 for e in EDGES if v > e)


def _expected_counts(values) -> list[int]:
    counts = [0] * (len(EDGES) + 1)
    for v in values:
        counts[_bin(v) - 1] += 1
    return counts


def test_psi_matches_reference_formula(spark, dirs):
    day1 = [5.0, 15.0, 25.0, 35.0, 12.0, 3.0]  # one window, mixed bins
    rows = [(_ts(1, i), v) for i, v in enumerate(day1)]
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(dirs["source"])
    _drain(spark, dirs)
    out = spark.read.parquet(dirs["out"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == len(day1)
    assert r.n_bins == len(REF_COUNTS)
    expected = psi_round6(compute_psi(_expected_counts(day1), REF_COUNTS))
    assert r.psi == expected


def test_snapshots_accumulate_across_batches_and_restart(spark, dirs):
    day1a = [5.0, 15.0]
    spark.createDataFrame(
        [(_ts(1, i), v) for i, v in enumerate(day1a)], SCHEMA
    ).write.mode("append").parquet(dirs["source"])
    _drain(spark, dirs)

    # second delivery for the SAME window + a new window, then restart
    day1b = [25.0, 35.0, 35.0]
    day2 = [8.0, 9.0]
    spark.createDataFrame(
        [(_ts(1, 100 + i), v) for i, v in enumerate(day1b)]
        + [(_ts(2, i), v) for i, v in enumerate(day2)],
        SCHEMA,
    ).write.mode("append").parquet(dirs["source"])
    _drain(spark, dirs)  # new query instance, same checkpoint -> state reloads

    out = spark.read.parquet(dirs["out"]).collect()
    by_window: dict = {}
    for r in out:
        by_window.setdefault(r.window_start, []).append(r)
    w1 = sorted(by_window[_ts(1)], key=lambda r: r.n_events)
    # two snapshots for day 1: after batch 1 and after batch 2
    assert [r.n_events for r in w1] == [2, 5]
    assert w1[-1].psi == psi_round6(compute_psi(_expected_counts(day1a + day1b), REF_COUNTS))
    w2 = by_window[_ts(2)]
    assert len(w2) == 1 and w2[0].n_events == 2
    assert w2[0].psi == psi_round6(compute_psi(_expected_counts(day2), REF_COUNTS))


def test_identical_distribution_scores_near_zero(spark, dirs):
    # traffic drawn bin-proportional to the reference -> tiny PSI
    values = [5.0] * 25 + [15.0] * 25 + [25.0] * 25 + [35.0] * 25
    spark.createDataFrame(
        [(_ts(1, i), v) for i, v in enumerate(values)], SCHEMA
    ).write.mode("append").parquet(dirs["source"])
    _drain(spark, dirs)
    r = spark.read.parquet(dirs["out"]).collect()[0]
    assert r.psi < 0.01  # matched distribution is stable by definition


def test_edge_validation():
    import pyspark.sql  # noqa: F401

    with pytest.raises(ValueError):
        psi_drift_stream(None, [2.0, 1.0], [1, 1, 1])
    with pytest.raises(ValueError):
        psi_drift_stream(None, [1.0], [1])


def test_stream_drift_e2e_latest_snapshot_matches_batch_psi(spark):
    """The registered oracle-gated e2e query: interleaved drops over one
    shared checkpoint; the latest per-window snapshot must equal the
    batch PSI over that window's full event set."""
    import os

    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t as load
    from habits_etl_spark.plans.streaming_e2e import (
        _DRIFT_EDGES,
        _DRIFT_REF,
        stream_drift_e2e,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    got = {
        r.window_start_s: (r.n_events, r.psi)
        for r in stream_drift_e2e(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bin_expr = F.lit(1)
    for e in _DRIFT_EDGES:
        bin_expr = bin_expr + (F.col("value") > F.lit(e)).cast("int")
    rows = (
        ev.select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("w"),
            bin_expr.alias("bin"),
        )
        .groupBy("w", "bin")
        .count()
        .collect()
    )
    by_w: dict = {}
    for r in rows:
        by_w.setdefault(r.w, [0] * len(_DRIFT_REF))[r.bin - 1] += r["count"]
    assert set(got) == set(by_w)
    for wname, counts in by_w.items():
        n, psi = got[wname]
        assert n == sum(counts)
        assert psi == psi_round6(compute_psi(counts, _DRIFT_REF))
