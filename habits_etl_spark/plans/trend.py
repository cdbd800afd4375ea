"""Analytics operators, wave 18: trend estimation and survival
analysis — OLS and Theil–Sen slopes of the daily series, a
seasonal-naive forecast backtest, and the Kaplan–Meier survival curve
for conversion with right-censoring.

This is the forecasting/inference layer on top of the wave-13/15
diagnostics: OLS gives the trend a dashboard draws, Theil–Sen gives
the robust slope an alerting rule should use (one outlier day flips an
OLS slope but moves a median-of-slopes barely), the backtest scores
the simplest honest forecast (same weekday last week) so fancier
models have a floor to beat, and Kaplan–Meier is THE standard way to
estimate time-to-event distributions when many subjects haven't
converted yet (treating the never-converted as failures biases
agg_time_to_convert's quantiles; KM handles them as censored).

Reference parity: the reference has no forecasting surface; these
extend it per the BASELINE north-star list, like plans/analytics.py.

Cross-engine float rule: decimal exact sums for aggregates
(plans/common.py rule 1); slopes/products push exact sums through
identical double expressions; the KM product is exp(Σ ln(term)) with
per-term rounding before the decimal reduce (the KL-drift pattern).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from habits_etl_spark.operators.distrank import bounded_running_sum
from habits_etl_spark.plans.common import dec, query, t

# --- OLS trend ---------------------------------------------------------------


@query(
    "agg_trend_ols",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE)
               - CAST(date_trunc('day', TIMESTAMP '2024-01-01') AS DATE) AS x,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    st AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             sum(CAST(y AS DECIMAL(18,6))) AS sy,
             CAST(sum(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS BIGINT) AS sxx,
             sum(CAST(x * y AS DECIMAL(28,10))) AS sxy,
             sum(CAST(y * y AS DECIMAL(28,10))) AS syy
      FROM daily GROUP BY 1
    ),
    mo AS (
      SELECT event_type, n,
             CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n
               AS cov,
             CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n
               AS varx,
             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n
               AS vary,
             CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my
      FROM st
    )
    SELECT event_type, n,
           CASE WHEN varx > 0.0 THEN round(cov / varx, 6) END AS slope_per_day,
           CASE WHEN varx > 0.0 THEN round(my - (cov / varx) * mx, 6) END
             AS intercept,
           CASE WHEN varx > 0.0 AND vary > 0.0
                THEN round((cov * cov) / (varx * vary), 6) END AS r2
    FROM mo ORDER BY event_type
    """,
)
def agg_trend_ols(spark, sf_dir):
    """Ordinary-least-squares trend of each event_type's daily value
    total: slope per day, intercept (at the 2024-01-01 origin), and R².
    The line a dashboard draws through a metric — and the drift signal
    an SLO review reads (slope significantly nonzero = the metric is
    going somewhere).

    Scale: the corpus collapses to |types|×|days| daily points, then
    ONE hash-agg computes all five moment sums (x is an exact integer
    day index, y a pre-rounded decimal sum), and the closed-form
    slope/intercept/R² are identical double expressions over those
    exact sums in both engines. Textbook single-pass OLS — no second
    pass, no windows."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("DAY", "ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("x"),
    ).agg(F.round(F.sum(dec("value")).cast("double"), 4).alias("y"))
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(F.col("x").cast("bigint") * F.col("x").cast("bigint"))
        .cast("bigint")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,10)")).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(28,10)")).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy, syy = (
        F.col("sxx").cast("double"),
        F.col("sxy").cast("double"),
        F.col("syy").cast("double"),
    )
    cov, varx, vary = sxy - sx * sy / n, sxx - sx * sx / n, syy - sy * sy / n
    slope = cov / varx
    return st.select(
        "event_type",
        "n",
        F.when(varx > 0.0, F.round(slope, 6)).alias("slope_per_day"),
        F.when(varx > 0.0, F.round(sy / n - slope * (sx / n), 6)).alias(
            "intercept"
        ),
        F.when(
            (varx > 0.0) & (vary > 0.0),
            F.round((cov * cov) / (varx * vary), 6),
        ).alias("r2"),
    ).orderBy("event_type")


# --- Theil–Sen robust trend --------------------------------------------------


@query(
    "agg_trend_theil_sen",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE)
               - CAST(date_trunc('day', TIMESTAMP '2024-01-01') AS DATE) AS x,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
             round((b.y - a.y) / (b.x - a.x), 10) AS pair_slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.x > a.x
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(pair_slope, 0.5), 6) AS theil_sen_slope
    FROM pairs GROUP BY 1 ORDER BY event_type
    """,
)
def agg_trend_theil_sen(spark, sf_dir):
    """Theil–Sen robust trend per event_type: the median of all
    pairwise day-to-day slopes of the daily series. Breakdown point
    ~29% — a handful of outlier days that would whip the OLS slope
    (agg_trend_ols is its fragile twin) barely move the median of
    slopes, which is why monitoring rules should alert on THIS number.

    Scale: the pairwise join runs on the DAILY series (|days|² pairs
    per type, ~435 here), never on events — the corpus collapses
    first, and the pair join is equi on event_type so one shuffle
    co-locates each type's days. At 100 TB the series length, not the
    corpus, bounds the quadratic term; for multi-year series the
    committed fallback is the repeated-median on a capped
    day-pair window. Pair slopes are pre-rounded doubles; the median
    interpolates identically in both engines."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("DAY", "ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("x"),
    ).agg(F.round(F.sum(dec("value")).cast("double"), 4).alias("y"))
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
    )
    pairs = daily.join(
        b, (daily.event_type == b.b_type) & (b.bx > daily.x)
    ).select(
        "event_type",
        F.round(
            (F.col("by") - F.col("y")) / (F.col("bx") - F.col("x")), 10
        ).alias("pair_slope"),
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.percentile("pair_slope", F.lit(0.5)), 6).alias(
                "theil_sen_slope"
            ),
        )
        .orderBy("event_type")
    )


# --- seasonal-naive forecast backtest ----------------------------------------

_BT_LAG_DAYS = 7


@query(
    "agg_forecast_backtest",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    scored AS (
      SELECT a.event_type, a.y AS actual, f.y AS forecast
      FROM daily a JOIN daily f
        ON f.event_type = a.event_type
       AND f.day = a.day - {_BT_LAG_DAYS}
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
           round(CAST(sum(CAST(abs(actual - forecast) AS DECIMAL(18,6)))
                 AS DOUBLE) / count(*), 6) AS mae,
           round(CAST(sum(CAST(abs(actual - forecast) / abs(actual)
                              AS DECIMAL(18,10))) AS DOUBLE)
                 / count(*), 6) AS mape,
           round(sqrt(CAST(sum(CAST((actual - forecast) * (actual - forecast)
                                    AS DECIMAL(28,10))) AS DOUBLE) / count(*)),
                 6) AS rmse
    FROM scored GROUP BY 1 ORDER BY event_type
    """,
)
def agg_forecast_backtest(spark, sf_dir):
    """Backtest of the seasonal-naive forecast (predict each day with
    the value {_BT_LAG_DAYS} days earlier): MAE, MAPE, and RMSE per
    event_type. Seasonal-naive is the honest baseline every real
    forecasting model must beat — publishing a model without this
    floor is how dashboards end up with fancy models that lose to
    "same day last week".

    Scale: daily pre-agg first, then a calendar self-join on
    (type, day − {_BT_LAG_DAYS}) — the gap-proof alignment idiom from
    agg_autocorrelation — and one hash-agg of decimal error sums.
    Error terms are computed from identical pre-rounded doubles and
    decimal-cast before summation, so all three metrics are
    engine-identical."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum(dec("value")).cast("double"), 4).alias("y"))
    f_ = daily.select(
        F.col("event_type").alias("f_type"),
        F.col("day").alias("f_day"),
        F.col("y").alias("forecast"),
    )
    scored = daily.join(
        f_,
        (daily.event_type == f_.f_type)
        & (f_.f_day == F.date_sub(daily.day, _BT_LAG_DAYS)),
    ).select("event_type", F.col("y").alias("actual"), "forecast")
    err = F.col("actual") - F.col("forecast")
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored"),
            F.round(
                F.sum(F.abs(err).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mae"),
            F.round(
                F.sum(
                    (F.abs(err) / F.abs(F.col("actual"))).cast("decimal(18,10)")
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mape"),
            F.round(
                F.sqrt(
                    F.sum((err * err).cast("decimal(28,10)")).cast("double")
                    / F.count(F.lit(1))
                ),
                6,
            ).alias("rmse"),
        )
        .orderBy("event_type")
    )


# --- Kaplan–Meier survival ---------------------------------------------------


@query(
    "ext_kaplan_meier",
    """
    WITH signup AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    conv AS (
      SELECT s.user_id, s.t0, min(e.ts) AS t_conv
      FROM signup s LEFT JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
       AND e.ts >= s.t0
      GROUP BY 1, 2
    ),
    horizon AS (SELECT max(ts) AS t_end FROM events),
    subj AS (
      SELECT user_id,
             CASE WHEN t_conv IS NOT NULL
                  THEN CAST(floor((epoch_us(t_conv) - epoch_us(t0))
                                  / 86400000000.0) AS BIGINT)
                  ELSE CAST(floor((epoch_us(t_end) - epoch_us(t0))
                                  / 86400000000.0) AS BIGINT) END AS t_day,
             t_conv IS NOT NULL AS converted
      FROM conv CROSS JOIN horizon
    ),
    risk AS (
      SELECT t_day,
             CAST(count(*) FILTER (WHERE converted) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leaving,
             CAST((SELECT count(*) FROM subj) AS BIGINT)
               - CAST(coalesce(sum(count(*)) OVER (ORDER BY t_day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS n_at_risk
      FROM subj GROUP BY t_day
    ),
    ev AS (
      SELECT t_day, d, n_at_risk,
             round(ln(1.0 - CAST(d AS DOUBLE) / n_at_risk), 12) AS ln_term
      FROM risk WHERE d > 0 AND d < n_at_risk
    )
    SELECT t_day AS day, d AS n_converted, n_at_risk,
           round(exp(CAST(sum(CAST(ln_term AS DECIMAL(28,12)))
                          OVER (ORDER BY t_day ROWS UNBOUNDED PRECEDING)
                     AS DOUBLE)), 6) AS survival
    FROM ev ORDER BY day
    """,
)
def ext_kaplan_meier(spark, sf_dir):
    """Kaplan–Meier estimate of the signup→purchase survival curve
    (probability of NOT yet having purchased by day t), with users who
    never purchase right-censored at the observation horizon. The
    statistically honest version of agg_time_to_convert: treating the
    never-converted as if they'd converted at the horizon (or dropping
    them) biases every quantile; KM multiplies per-day hazards
    (1 − d/n_at_risk) over only the days where conversions occur.

    Scale: per-subject times are two user-keyed hash-aggs; the risk
    table collapses to |distinct days| rows; both prefix passes over
    it (at-risk depletion and the log-hazard cumsum) are windowless
    triangular broadcast self-joins (distrank.bounded_running_sum —
    legal because |days| is calendar-bounded), and the running product
    is exp of a DECIMAL prefix sum of per-day rounded log-hazards,
    engine-identical because the prefix sums are exact. Days where everyone at risk converts
    (S→0) are excluded from the curve, the standard open-interval
    convention."""
    ev = t(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    conv = (
        signup.join(
            purch,
            (signup.user_id == purch.p_uid) & (purch.p_ts >= signup.t0),
            "left",
        )
        .groupBy("user_id", "t0")
        .agg(F.min("p_ts").alias("t_conv"))
    )
    horizon = ev.agg(F.max("ts").alias("t_end"))
    day_of = lambda a, b: F.floor(  # noqa: E731
        (F.unix_micros(a) - F.unix_micros(b)) / 86400000000.0
    ).cast("bigint")
    subj = conv.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("t_conv").isNotNull(), day_of(F.col("t_conv"), F.col("t0"))
        )
        .otherwise(day_of(F.col("t_end"), F.col("t0")))
        .alias("t_day"),
        F.col("t_conv").isNotNull().alias("converted"),
    )
    total = subj.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    byday = subj.groupBy("t_day").agg(
        F.count(F.when(F.col("converted"), 1)).cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    cum_leave = bounded_running_sum(
        byday, "t_day", {"leaving": "cum_leaving"}, include_current=False
    )
    risk = cum_leave.crossJoin(F.broadcast(total)).select(
        "t_day",
        "d",
        (F.col("n_total") - F.coalesce(F.col("cum_leaving"), F.lit(0)))
        .cast("bigint")
        .alias("n_at_risk"),
    )
    evd = risk.filter(
        (F.col("d") > 0) & (F.col("d") < F.col("n_at_risk"))
    ).select(
        "t_day",
        "d",
        "n_at_risk",
        F.round(
            F.log(1.0 - F.col("d").cast("double") / F.col("n_at_risk")), 12
        ).alias("ln_term"),
    )
    evd = evd.withColumn("_lt", F.col("ln_term").cast("decimal(28,12)"))
    cum = bounded_running_sum(evd, "t_day", {"_lt": "cum_lt"})
    return cum.select(
        F.col("t_day").alias("day"),
        F.col("d").alias("n_converted"),
        "n_at_risk",
        F.round(F.exp(F.col("cum_lt").cast("double")), 6).alias("survival"),
    ).orderBy("day")
