"""habits_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``aaronmeza/habits-etl`` reference.

Everything is expressed DataFrame-first: the reference's per-row Python
transforms (reference ``etl/transform.py``) become Catalyst ``Column``
expressions, its Postgres/Timescale storage model becomes date-partitioned
Parquet with idempotent merge sinks, and its continuous aggregate becomes a
Structured Streaming job (plus an equivalent batch rollup).

Layout:
    config        — YAML mapping schema (mirrors reference etl/config/habits.yml)
    functions/    — scalar Column-expression builders (dates, coercions, text, vectors)
    operators/    — relational operators (unpivot, streaks, dedup, similarity, asof)
    sources/      — table registry / readers
    sinks/        — landing + keyed-upsert sinks
    plans/        — the declared query surface (habits + star-schema analytics)
    streaming/    — continuous-aggregate maintenance
    multimodal/   — binary-column (image/audio/video) plumbing with real
                    pure-stdlib codecs (BMP/PNG/JPEG/WAV/MJPEG-AVI)
"""

__version__ = "0.1.0"
