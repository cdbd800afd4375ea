"""Serving layer — the reference's Grafana dashboard panels (reference
README.md:96-143), run as LITERAL SQL through ``spark.sql`` over registered
views. This is entry point 3 of the reference's query lifecycle (SURVEY
§3.3): Grafana interpolates ``${user}`` / ``$__timeFilter(ts)`` macros into
SQL and ships it to the store; here the macro substitution happens in
``_grafana_sql`` and Catalyst replaces the Postgres planner.

The point of this module (vs the same shapes in plans/habits.py): a user of
the reference can paste their panel SQL nearly verbatim — only
``time_bucket('1 day', ts)`` becomes ``date_trunc('DAY', ts)`` — and the
DataFrame-API and SQL-API forms compile to the same Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import TS_FMT_DUCK, query, sql_dsum, t

# Grafana-macro-style parameters for the test dataset (events ≙ habit_events:
# user_id ≙ user_email, event_type ≙ habit, value ≙ value).
_PARAMS = {
    "user": "7",
    "habit": "click",
    "time_from": "2024-01-08",
    "time_to": "2024-01-22",
}


def _events_view(spark, sf_dir) -> str:
    name = "habit_events_v"
    t(spark, sf_dir, "events").createOrReplaceTempView(name)
    return name


def _grafana_sql(template: str, view: str) -> str:
    """Macro interpolation, the engine-side stand-in for Grafana's."""
    sql = template.replace("$__table", view)
    sql = sql.replace(
        "$__timeFilter(ts)",
        f"ts >= TIMESTAMP '{_PARAMS['time_from']}' AND ts < TIMESTAMP '{_PARAMS['time_to']}'",
    )
    sql = sql.replace("${user}", _PARAMS["user"]).replace("${habit}", _PARAMS["habit"])
    return sql


@query(
    "serve_latest_events",
    f"""
    SELECT event_id, strftime(ts, '{TS_FMT_DUCK}') AS ts_s, user_id, event_type, value
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 50
    """,
)
def serve_latest_events(spark, sf_dir):
    """Verification panel (reference README.md:98: 'SELECT * FROM
    habit_events ORDER BY ts DESC LIMIT 50') via spark.sql."""
    view = _events_view(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT event_id, date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts_s,
               user_id, event_type, value
        FROM {view} ORDER BY ts DESC, event_id DESC LIMIT 50
        """
    )


@query(
    "serve_variable_domain",
    "SELECT DISTINCT event_type FROM events ORDER BY 1",
)
def serve_variable_domain(spark, sf_dir):
    """Dashboard variable domain (reference README.md:118-119:
    'SELECT DISTINCT habit FROM habit_events ORDER BY 1')."""
    view = _events_view(spark, sf_dir)
    return spark.sql(f"SELECT DISTINCT event_type FROM {view} ORDER BY 1")


@query(
    "serve_daily_metric",
    f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           {sql_dsum('value')} AS minutes
    FROM events
    WHERE event_type = 'click' AND user_id = 7
      AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-22'
    GROUP BY 1 ORDER BY 1
    """,
)
def serve_daily_metric(spark, sf_dir):
    """Meditation-minutes-per-day panel (reference README.md:121-125),
    macros interpolated: time_bucket -> date_trunc is the only edit."""
    view = _events_view(spark, sf_dir)
    template = """
        SELECT date_format(date_trunc('DAY', ts), 'yyyy-MM-dd') AS day,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS minutes
        FROM $__table
        WHERE event_type = '${habit}' AND user_id = ${user} AND $__timeFilter(ts)
        GROUP BY 1 ORDER BY 1
    """
    return spark.sql(_grafana_sql(template, view))


@query(
    "serve_weekly_pct",
    """
    WITH week AS (
      SELECT date_trunc('week', TIMESTAMP '2024-01-18') AS start_ts,
             date_trunc('week', TIMESTAMP '2024-01-18') + INTERVAL 7 DAYS AS end_ts
    )
    SELECT e.event_type,
           round(100.0 * CAST(sum(CASE WHEN e.value >= 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(greatest(count(*), 1) AS DOUBLE), 4) AS pct_done
    FROM events e, week w
    WHERE e.ts >= w.start_ts AND e.ts < w.end_ts AND e.user_id = 7
    GROUP BY 1 ORDER BY 1
    """,
)
def serve_weekly_pct(spark, sf_dir):
    """Percent-of-days-done panel (reference README.md:128-139): the CTE
    cross join + conditional pct, pasted as SQL with the week anchored to a
    fixed date instead of now() (determinism for the oracle)."""
    view = _events_view(spark, sf_dir)
    template = """
        WITH week AS (
          SELECT date_trunc('WEEK', TIMESTAMP '2024-01-18') AS start_ts,
                 date_trunc('WEEK', TIMESTAMP '2024-01-18') + INTERVAL 7 DAYS AS end_ts
        )
        SELECT e.event_type,
               round(100.0 * CAST(sum(CASE WHEN e.value >= 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(greatest(count(*), 1) AS DOUBLE), 4) AS pct_done
        FROM $__table e, week w
        WHERE e.ts >= w.start_ts AND e.ts < w.end_ts AND e.user_id = ${user}
        GROUP BY 1 ORDER BY 1
    """
    return spark.sql(_grafana_sql(template, view))
