"""Invariant tests for curation wave 6 (chunking, shuffle shards) and the
sliding-window aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import t
from habits_etl_spark.plans.ext_curation4 import (
    _CHUNK,
    _N_SHARDS,
    _STRIDE,
    ext_doc_chunking,
    ext_train_shuffle_shards,
)
from habits_etl_spark.plans.extra import stream_sliding_window


def test_chunking_covers_every_token_with_overlap(spark, sf_dir):
    chunks = ext_doc_chunking(spark, sf_dir)
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_toks")
    )
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max(F.col("tok_start") + F.col("n_tokens") - 1).alias("last_tok"),
            F.min("tok_start").alias("first_tok"),
            F.max("n_tokens").alias("max_len"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    assert per_doc, "no documents chunked"
    for r in per_doc:
        # windows start at 1 and the last one ends exactly at the doc's end
        assert r.first_tok == 1
        assert r.last_tok == r.n_toks
        assert r.max_len <= _CHUNK
        # chunk count is ceil(n/stride) with starts while tokens remain
        assert r.n_chunks == ((r.n_toks - 1) // _STRIDE) + 1


def test_chunking_consecutive_windows_overlap(spark, sf_dir):
    chunks = ext_doc_chunking(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    multi = [v for v in by_doc.values() if len(v) > 1]
    assert multi, "need at least one multi-chunk doc for the overlap check"
    for rows in multi:
        rows.sort(key=lambda r: r.chunk_id)
        for a, b in zip(rows, rows[1:]):
            # next window starts before the previous ends -> shared tokens
            assert b.tok_start == a.tok_start + _STRIDE
            if a.n_tokens == _CHUNK:
                assert b.tok_start <= a.tok_start + a.n_tokens - 1


def test_shuffle_shards_deterministic_and_balanced(spark, sf_dir):
    a = ext_train_shuffle_shards(spark, sf_dir).collect()
    b = ext_train_shuffle_shards(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # no rand() anywhere
    shards = [r.shard_id for r in a]
    assert all(0 <= s < _N_SHARDS for s in shards)
    counts: dict[int, int] = {}
    for s in shards:
        counts[s] = counts.get(s, 0) + 1
    assert len(counts) == _N_SHARDS  # every shard populated at 500 docs
    mean = len(shards) / _N_SHARDS
    assert max(counts.values()) < 2.5 * mean  # uniform hash, no hot shard
    # sort keys are unique -> total order within a shard is well-defined
    keys = [r.sort_key for r in a]
    assert len(set(keys)) == len(keys)


def test_sliding_window_double_counts_each_event(spark, sf_dir):
    agg = stream_sliding_window(spark, sf_dir)
    total = agg.agg(F.sum("n")).collect()[0][0]
    n_events = t(spark, sf_dir, "events").count()
    assert total == 2 * n_events  # duration/slide = 2 windows per event


def test_sliding_window_runs_under_structured_streaming(spark, tmp_path):
    """The registered batch query's window expression must work verbatim
    under readStream — every event lands in duration/slide = 2 windows."""
    import json

    from pyspark.sql import types as T

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"ts": "2024-01-05 10:00:00", "event_type": "click", "value": 1.0},
        {"ts": "2024-01-05 23:30:00", "event_type": "click", "value": 2.0},
        {"ts": "2024-01-06 00:30:00", "event_type": "view", "value": 3.0},
        {"ts": "2024-01-08 12:00:00", "event_type": "click", "value": 4.0},
    ]
    (src / "batch0.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("slide_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM slide_test").collect()
    assert sum(r.n for r in out) == 2 * len(rows)
    # spot-check alignment: the 2024-01-05 events appear in the windows
    # starting 01-04 and 01-05 (epoch-midnight-aligned slide)
    starts = {
        str(r.w.start)[:10] for r in out if r.event_type == "click"
    }
    assert {"2024-01-04", "2024-01-05"} <= starts
