"""Analytics operators, wave 24: the supervised-training-table
assembly and deeper time-series decomposition — a leakage-safe churn
feature/label table, maximum drawdown, an STL-lite
trend/seasonal/residual decomposition, and empirical prediction
intervals for the seasonal-naive forecast.

ext_churn_training_table is the capstone of the feature layer: the
single query that materializes (features, label) pairs with
point-in-time correctness — every feature computed strictly BEFORE the
cutoff, the label strictly AFTER — which is the discipline that
separates a trainable table from a leaky one. The other three extend
the wave-13/15/18 series toolkit: drawdown is the worst-case
peak-to-trough metric, the decomposition splits a metric into
trend × seasonality + residual (the residual is what anomaly rules
should score), and the intervals put honest error bands around the
wave-18 baseline forecast.

Reference parity: the reference has no forecasting surface; these
extend it per the BASELINE north-star list, like plans/trend.py.

Cross-engine float rule: decimal exact sums (plans/common.py rule 1);
trend/seasonal arithmetic is identical double expressions over
pre-rounded decimal dailies; quantiles interpolate identically."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from habits_etl_spark.plans.common import dec, query, t

# --- leakage-safe churn training table ---------------------------------------

_CHURN_CUTOFF = "2024-01-24 00:00:00"  # features < cutoff; label window after


@query(
    "ext_churn_training_table",
    f"""
    WITH feat AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS n_purchases,
             round(CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN CAST(value AS DECIMAL(18,6))
                                 ELSE CAST(0 AS DECIMAL(18,6)) END)
                   AS DOUBLE), 4) AS purchase_value,
             CAST(count(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
               AS days_active,
             CAST(CAST(date_trunc('day', TIMESTAMP '{_CHURN_CUTOFF}') AS DATE)
                  - max(CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
               AS recency_days
      FROM events WHERE ts < TIMESTAMP '{_CHURN_CUTOFF}'
      GROUP BY 1
    ),
    future AS (
      SELECT DISTINCT user_id FROM events
      WHERE ts >= TIMESTAMP '{_CHURN_CUTOFF}'
    )
    SELECT f.user_id, f.n_events, f.n_purchases, f.purchase_value,
           f.days_active, f.recency_days,
           fu.user_id IS NULL AS churned
    FROM feat f LEFT JOIN future fu ON f.user_id = fu.user_id
    ORDER BY f.user_id
    """,
)
def ext_churn_training_table(spark, sf_dir):
    """The supervised training table for churn: per user, activity
    features computed ONLY from events strictly before the cutoff
    ({_CHURN_CUTOFF[:10]}), and the label — did the user go silent
    after it — computed ONLY from events at/after it. Point-in-time
    correctness is the entire point: a feature that peeks past the
    cutoff scores brilliantly offline and collapses in production,
    and this query's structure (two disjoint time slices, one join)
    makes the leak impossible rather than merely avoided.

    Scale: both slices are partition-prunable time-range scans
    (pred_time_range's pushdown); features are one user-keyed
    hash-agg; the label is a broadcast-able distinct-user semi
    join. Exact integers + one decimal sum."""
    ev = t(spark, sf_dir, "events")
    cutoff = F.lit(_CHURN_CUTOFF).cast("timestamp")
    past = ev.filter(F.col("ts") < cutoff)
    feat = past.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("bigint")
        .alias("n_purchases"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", dec("value")).otherwise(
                    F.lit(0).cast("decimal(18,6)")
                )
            ).cast("double"),
            4,
        ).alias("purchase_value"),
        F.countDistinct(F.date_trunc("DAY", "ts").cast("date"))
        .cast("bigint")
        .alias("days_active"),
        F.datediff(
            F.date_trunc("DAY", cutoff).cast("date"),
            F.max(F.date_trunc("DAY", "ts").cast("date")),
        )
        .cast("bigint")
        .alias("recency_days"),
    )
    future = (
        ev.filter(F.col("ts") >= cutoff)
        .select(F.col("user_id").alias("fu_id"))
        .distinct()
    )
    return (
        feat.join(F.broadcast(future), feat.user_id == future.fu_id, "left")
        .select(
            "user_id",
            "n_events",
            "n_purchases",
            "purchase_value",
            "days_active",
            "recency_days",
            F.col("fu_id").isNull().alias("churned"),
        )
        .orderBy("user_id")
    )


# --- maximum drawdown --------------------------------------------------------


@query(
    "win_max_drawdown",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(CAST(value AS DECIMAL(18,6))) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, day, v,
             max(v) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS peak_v
      FROM daily
    ),
    dd AS (
      SELECT event_type, day, peak_v,
             round(CAST(peak_v - v AS DOUBLE), 4) AS drawdown,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY peak_v - v DESC, day) AS rn
      FROM cum
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS trough_day,
           round(CAST(peak_v AS DOUBLE), 4) AS peak_value,
           drawdown AS max_drawdown
    FROM dd WHERE rn = 1 ORDER BY event_type
    """,
)
def win_max_drawdown(spark, sf_dir):
    """Maximum drawdown of each event_type's daily value series: the
    largest drop from the running historical peak to a later day, and
    the day it bottomed. The worst-case-regression number for a level
    metric (daily volume, revenue rate, active users) — a mean or
    trend hides exactly this. (Defined on the daily LEVEL series, not
    its cumulative sum: a running total of positive dailies is
    monotone and its drawdown is identically zero.)

    Scale: one event_type shuffle serves the daily agg, the running
    max, and the argmax pick (same partitioning, zero extra
    Exchanges). The peak is a DECIMAL running max over pre-exact
    daily sums, so the peak-minus-current comparison that picks the
    trough is engine-identical, with the day tie-break (common.py
    rule 4)."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(F.sum(dec("value")).alias("v"))
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "event_type",
        "day",
        "v",
        F.max("v").over(w_run).alias("peak_v"),
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        (F.col("peak_v") - F.col("v")).desc(), "day"
    )
    return (
        cum.select(
            "event_type",
            "day",
            "peak_v",
            F.round((F.col("peak_v") - F.col("v")).cast("double"), 4).alias(
                "drawdown"
            ),
            F.row_number().over(w_pick).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("trough_day"),
            F.round(F.col("peak_v").cast("double"), 4).alias("peak_value"),
            F.col("drawdown").alias("max_drawdown"),
        )
        .orderBy("event_type")
    )


# --- STL-lite decomposition --------------------------------------------------


@query(
    "ts_seasonal_residual",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(isodow(date_trunc('day', ts)) AS INTEGER) AS dow,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
    ),
    trend AS (
      SELECT event_type, day, dow, v,
             round(CAST(sum(CAST(v AS DECIMAL(18,6)))
                        OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   AS DOUBLE)
                   / count(*) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING),
                   6) AS trend
      FROM daily
    ),
    season AS (
      SELECT d.event_type, d.dow,
             CAST(sum(CAST(d.v AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(sum(sum(CAST(d.v AS DECIMAL(18,6)))) OVER
                   (PARTITION BY d.event_type) AS DOUBLE)
               * sum(count(*)) OVER (PARTITION BY d.event_type)
               / count(*) AS factor_raw
      FROM daily d GROUP BY 1, 2
    ),
    seas AS (
      SELECT event_type, dow, round(factor_raw, 6) AS seasonal_factor
      FROM season
    )
    SELECT t.event_type, strftime(t.day, '%Y-%m-%d') AS day, t.v AS actual,
           t.trend, s.seasonal_factor,
           round(t.v - t.trend * s.seasonal_factor, 6) AS residual
    FROM trend t JOIN seas s
      ON t.event_type = s.event_type AND t.dow = s.dow
    ORDER BY t.event_type, t.day
    """,
)
def ts_seasonal_residual(spark, sf_dir):
    """STL-lite decomposition of each event_type's daily series:
    trend = centered 7-day moving average, seasonal factor = the
    day-of-week's share of mass normalized to mean 1 (computed
    mass-weighted over the whole series), residual = actual −
    trend × factor. The residual stream is what anomaly detection
    should score — win_zscore_anomaly on raw values re-alerts every
    weekend; on these residuals the weekly cycle is already explained
    away (agg_weekday_seasonality is this query's factor table
    standalone).

    Scale: everything after the daily pre-agg runs on |types|×|days|
    rows: one centered window (edge days average their available
    window — same convention both engines), one dow-level factor agg
    joined back broadcast. Trend and factor come from decimal sums
    through identical double division, both rounded BEFORE the
    residual so the subtraction is engine-identical."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("DAY", "ts").cast("date").alias("day"),
        (F.weekday(F.date_trunc("DAY", "ts")) + F.lit(1)).cast("int").alias("dow"),
    ).agg(F.round(F.sum(dec("value")).cast("double"), 4).alias("v"))
    w_c = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    trend = daily.select(
        "event_type",
        "day",
        "dow",
        "v",
        F.round(
            F.sum(dec("v")).over(w_c).cast("double")
            / F.count(F.lit(1)).over(w_c),
            6,
        ).alias("trend"),
    )
    w_t = Window.partitionBy("event_type")
    season = (
        daily.groupBy("event_type", "dow")
        .agg(
            F.sum(dec("v")).alias("mass"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select(
            "event_type",
            "dow",
            F.round(
                F.col("mass").cast("double")
                / F.sum("mass").over(w_t).cast("double")
                * F.sum("n_days").over(w_t)
                / F.col("n_days"),
                6,
            ).alias("seasonal_factor"),
        )
    )
    return (
        trend.join(F.broadcast(season), ["event_type", "dow"])
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("v").alias("actual"),
            "trend",
            "seasonal_factor",
            F.round(
                F.col("v") - F.col("trend") * F.col("seasonal_factor"), 6
            ).alias("residual"),
        )
        .orderBy("event_type", "day")
    )


# --- forecast prediction intervals -------------------------------------------

_FI_LAG_DAYS = 7


@query(
    "agg_forecast_intervals",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    resid AS (
      SELECT a.event_type, round(a.v - f.v, 4) AS r
      FROM daily a JOIN daily f
        ON f.event_type = a.event_type
       AND f.day = a.day - {_FI_LAG_DAYS}
    ),
    last_day AS (
      SELECT event_type, max(day) AS d_last FROM daily GROUP BY 1
    ),
    base AS (
      SELECT d.event_type, d.v AS point_forecast, l.d_last
      FROM daily d JOIN last_day l
        ON d.event_type = l.event_type AND d.day = l.d_last
    )
    SELECT b.event_type,
           strftime(b.d_last + CAST({_FI_LAG_DAYS} AS INTEGER), '%Y-%m-%d')
             AS forecast_day,
           b.point_forecast,
           round(b.point_forecast + quantile_cont(r.r, 0.1), 4) AS lo80,
           round(b.point_forecast + quantile_cont(r.r, 0.9), 4) AS hi80,
           CAST(count(*) AS BIGINT) AS n_residuals
    FROM base b JOIN resid r ON b.event_type = r.event_type
    GROUP BY 1, 2, 3 ORDER BY 1
    """,
)
def agg_forecast_intervals(spark, sf_dir):
    """Empirical prediction intervals for the seasonal-naive forecast:
    the point forecast for {_FI_LAG_DAYS} days past the series end is
    the last observed value (same-weekday convention), and the 80%
    band adds the 10th/90th percentiles of the historical
    {_FI_LAG_DAYS}-day-ahead residuals. Honest uncertainty without a
    model: the band is exactly as wide as this forecast has actually
    been wrong (agg_forecast_backtest scores the center; this prices
    the spread).

    Scale: residuals come from the calendar self-join on the daily
    series (the wave-15/18 idiom); the interval is one grouped
    percentile over |days| residuals per type. Residuals are
    differences of pre-rounded dailies; percentiles interpolate
    identically in both engines."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum(dec("value")).cast("double"), 4).alias("v"))
    f_ = daily.select(
        F.col("event_type").alias("f_type"),
        F.col("day").alias("f_day"),
        F.col("v").alias("fv"),
    )
    resid = daily.join(
        f_,
        (daily.event_type == f_.f_type)
        & (f_.f_day == F.date_sub(daily.day, _FI_LAG_DAYS)),
    ).select("event_type", F.round(F.col("v") - F.col("fv"), 4).alias("r"))
    last_day = daily.groupBy("event_type").agg(F.max("day").alias("d_last"))
    base = daily.join(
        last_day.select(
            F.col("event_type").alias("l_type"), F.col("d_last")
        ),
        (daily.event_type == F.col("l_type")) & (daily.day == F.col("d_last")),
    ).select("event_type", F.col("v").alias("point_forecast"), "d_last")
    return (
        base.join(resid, "event_type")
        .groupBy(
            "event_type",
            F.date_format(
                F.date_add("d_last", _FI_LAG_DAYS), "yyyy-MM-dd"
            ).alias("forecast_day"),
            "point_forecast",
        )
        .agg(
            F.round(
                F.col("point_forecast") + F.percentile("r", F.lit(0.1)), 4
            ).alias("lo80"),
            F.round(
                F.col("point_forecast") + F.percentile("r", F.lit(0.9)), 4
            ).alias("hi80"),
            F.count(F.lit(1)).cast("bigint").alias("n_residuals"),
        )
        .orderBy("event_type")
    )
