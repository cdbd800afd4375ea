"""Tests for skew salting, IVF ANN recall, JDBC gating, catalog bootstrap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from habits_etl_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # heavily skewed big side: 90% of rows share key 1
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame([(1, "hot"), (950, "cold")], "k long, tag string")
    plain = big.join(small, "k").select("k", "payload", "tag")
    salted = salted_join(big, small, "k", n_salts=8, salt_source="payload").select(
        "k", "payload", "tag"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    big = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("payload"))
    small = spark.createDataFrame([(1, "x")], "k long, tag string")
    out = salted_join(big, small, "k", n_salts=4, how="left", salt_source="payload")
    rows = {r.k: r.tag for r in out.collect()}
    assert rows[1] == "x" and rows[2] is None and len(rows) == 10


def test_salted_join_rejects_replicating_types(spark):
    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.createDataFrame([(1, "x")], "k long, tag string")
    for how in ("right", "full", "left_anti"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(big, small, "k", how=how)


def test_ensure_schema_detects_absent_column(spark, tmp_path):
    from habits_etl_spark.catalog import SchemaMismatch, ensure_schema

    wh = str(tmp_path / "wh")
    # habits_raw missing the non-nullable ingested_at column entirely
    spark.createDataFrame([("h", "p")], "row_hash string, payload string").write.parquet(
        wh + "/habits_raw"
    )
    with pytest.raises(SchemaMismatch, match="ingested_at"):
        ensure_schema(spark, wh)


def test_ivf_recall(spark, sf_dir):
    from habits_etl_spark.plans import QUERIES

    exact = {(r.query_id, r.neighbor_id) for r in QUERIES["ext_topk_sim_search"](spark, sf_dir).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in QUERIES["ext_ann_ivf_probe"](spark, sf_dir).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"


def test_ivf_handles_non_dense_vec_ids(spark, sf_dir, tmp_path):
    """Centroid selection must not assume contiguous ids: remap every
    non-query id to a sparse range and re-run the probe."""
    from habits_etl_spark.plans import QUERIES

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sparse = emb.withColumn(
        "vec_id",
        F.when(F.col("vec_id") < 10, F.col("vec_id")).otherwise(
            F.col("vec_id") * 37 + 1000
        ),
    )
    d = str(tmp_path / "sparse_sf")
    sparse.write.parquet(d + "/embeddings.parquet")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ext_topk_sim_search"](spark, d).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ext_ann_ivf_probe"](spark, d).collect()
    }
    assert len({q for q, _ in approx}) == 10  # every query answered
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed on sparse ids: {recall}"


def test_jdbc_gated_without_driver(spark):
    from habits_etl_spark.sinks.jdbc import JdbcDriverMissing, write_jdbc

    df = spark.range(3)
    with pytest.raises(JdbcDriverMissing):
        write_jdbc(df, "jdbc:postgresql://x/db", "t")


def test_ensure_schema_roundtrip(spark, tmp_path):
    from habits_etl_spark.catalog import ensure_schema, SchemaMismatch
    from habits_etl_spark.config import PipelineConfig
    from habits_etl_spark.pipeline import run_ingest

    cfg = PipelineConfig.from_dict(
        {
            "date_column": "Report Date",
            "email_column": "Email Address",
            "habits": {"Workout": {"id": "workout", "type": "bool"}},
        }
    )
    wide = spark.createDataFrame(
        [("08/20/2025", "a@x.com", "Yes")],
        "`Report Date` string, `Email Address` string, Workout string",
    )
    wh = str(tmp_path / "wh")
    run_ingest(spark, wide, cfg, wh)
    ensure_schema(spark, wh)  # must not raise, registers views
    assert spark.sql("SELECT count(*) AS n FROM habit_events").collect()[0].n == 1
    ensure_schema(spark, wh)  # idempotent re-run
