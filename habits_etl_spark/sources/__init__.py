"""Table registry / readers.

The engine reads Parquet natively (columnar scan + predicate pushdown +
column pruning via Catalyst). ``load_table`` is the single entry point the
query layer uses, so swapping a source (CSV landing zone, JDBC, a stream)
means changing one function — the analog of the reference's pluggable
``get_ws`` sheet scan (reference etl/etl_habits.py:11-17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table of the scale-factor directory as a DataFrame.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which the
    Spark vectorized reader rejects. We read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microsecond
    timestamps — the same truncation DuckDB applies, so both engines see
    identical instants."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every table as a temp view for the SQL surface."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_wide_csv(spark: SparkSession, path: str) -> DataFrame:
    """Wide-form source reader (the sheet-tab analog): header row names the
    columns, everything lands as strings — coercion is the config-driven
    normalize layer's job, as in the reference."""
    return spark.read.option("header", True).csv(path)
