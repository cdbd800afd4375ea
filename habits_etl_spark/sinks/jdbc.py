"""Optional JDBC serving sink/source (reference sink_jdbc_pg: Postgres as
the serving store, etl/etl_habits.py:1,45). The engine's native storage is
Parquet; JDBC is a thin egress for dashboards that need a SQL endpoint.

Gated behind driver availability: no Postgres jar ships in this
container, so a missing driver raises a clear error instead of failing
deep inside py4j. The code path itself IS executed in CI — Spark bundles
Derby, and tests/test_jdbc_sink.py drives write_jdbc/read_jdbc (including
the partitioned parallel scan) against an embedded Derby database, which
exercises the identical DataFrameWriter.jdbc machinery."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class JdbcDriverMissing(RuntimeError):
    pass


def _check_driver(spark: SparkSession, driver: str) -> None:
    try:
        spark._jvm.java.lang.Class.forName(driver)  # type: ignore[union-attr]
    except Exception as exc:  # driver jar not on classpath
        raise JdbcDriverMissing(
            f"JDBC driver {driver!r} not on the Spark classpath; add the jar "
            "via spark.jars to enable the JDBC sink (engine-native storage "
            "is Parquet and does not require this)."
        ) from exc


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str = "org.postgresql.Driver",
    **options: str,
) -> None:
    """df.write.jdbc with upfront driver validation. For upsert semantics
    into a SQL store, pre-merge with sinks.upsert.upsert_keyed and write
    mode='overwrite' to a staging table, then swap server-side."""
    _check_driver(df.sparkSession, driver)
    df.write.format("jdbc").options(url=url, dbtable=table, driver=driver, **options).mode(
        mode
    ).save()


def jdbc_column_ddl(spark: SparkSession, schema, url: str) -> dict[str, str]:
    """Resolve the column -> database-type mapping Spark's JDBC writer
    would emit for ``schema`` against the dialect registered for ``url``
    (``JdbcDialects.get``), falling back to the common JDBC mapping when
    the dialect is silent — exactly the resolution order
    ``JdbcUtils.getJdbcType`` applies inside ``df.write.jdbc``.

    No server required: the dialect's type mapping is pure driver-side
    logic, so the Postgres deployment's DDL (reference sql/001_schema.sql
    :7-23 — ``timestamptz``/``text``/``double precision``/``bytea``) can
    be pinned by a unit test even though no Postgres jar ships here
    (tests/test_jdbc_sink.py::test_postgres_dialect_ddl)."""
    jvm = spark._jvm  # type: ignore[union-attr]
    dialect = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    jschema = spark._jsparkSession.parseDataType(schema.json())  # type: ignore[union-attr]
    out: dict[str, str] = {}
    it = jschema.iterator()
    while it.hasNext():
        field = it.next()
        dt = field.dataType()
        opt = dialect.getJDBCType(dt)
        if not opt.isDefined():
            opt = jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils.getCommonJDBCType(
                dt
            )
        if not opt.isDefined():
            raise ValueError(f"no JDBC type for column {field.name()}: {dt}")
        out[field.name()] = opt.get().databaseTypeDefinition()
    return out


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = "org.postgresql.Driver",
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Parallel JDBC scan: always pass partition_column/bounds in
    production — a single-connection read is the reference's row-at-a-time
    bottleneck reborn."""
    _check_driver(spark, driver)
    reader = spark.read.format("jdbc").options(url=url, dbtable=table, driver=driver, **options)
    if partition_column is not None:
        reader = reader.options(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    return reader.load()
