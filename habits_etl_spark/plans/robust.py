"""Analytics operators, wave 15: robust statistics and time-series
diagnostics — MAD-based outlier screens, autocorrelation of the daily
series, CUSUM changepoint detection, weekday seasonality indices, and a
Benford first-digit audit.

These are the "is this data healthy" battery that runs between
ingestion and modeling: MAD outliers are the robust twin of
win_zscore_anomaly (a median/MAD screen survives the very outliers a
mean/stddev screen is poisoned by), the ACF tells a forecaster which
lags carry signal, CUSUM localizes WHEN a level shift happened (KL
drift says THAT a distribution moved; CUSUM says where in time),
seasonal indices normalize day-of-week effects out of metrics, and
Benford deviation is the classic synthetic/fabricated-data detector
for financial columns.

Reference parity: the reference has no diagnostics surface; these
extend it per the BASELINE north-star list, like plans/analytics.py.

Cross-engine float rule: decimal exact sums everywhere aggregated
(plans/common.py rule 1); medians are interpolated percentiles —
percentile() in Spark and quantile_cont() in DuckDB compute the same
linear interpolation over the same sorted doubles; running/log terms
are identical literal double expressions in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from habits_etl_spark.plans.common import dec, query, t

# --- MAD outlier screen ------------------------------------------------------

_MAD_K = 1.4826  # consistency constant: MAD * k estimates sigma under normality
_MAD_CUT = 3.0


@query(
    "agg_mad_outliers",
    f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, e.value, med.med,
             abs(e.value - med.med) AS adev
      FROM events e JOIN med ON e.event_type = med.event_type
      WHERE e.value IS NOT NULL
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           round(d.med, 6) AS median_value,
           round(m.mad, 6) AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (
             WHERE m.mad > 0.0
               AND abs(d.value - d.med) > {_MAD_CUT} * {_MAD_K} * m.mad
           ) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY 1, 2, 3 ORDER BY 1
    """,
)
def agg_mad_outliers(spark, sf_dir):
    """Robust outlier screen per event_type: median and MAD (median
    absolute deviation), flagging values beyond {_MAD_CUT}·{_MAD_K}·MAD
    from the median. The robust twin of win_zscore_anomaly — a handful
    of extreme values shifts a mean/stddev gate but leaves median/MAD
    untouched, so this screen still fires correctly on heavy-tailed
    columns.

    Scale: two grouped percentile passes (Spark's percentile is a
    per-group sort within the aggregate — groups parallelize; the
    100 TB variant swaps in approx_percentile with the same downstream
    shape) and one broadcast-joined counting pass. Medians interpolate
    identically in both engines (percentile vs quantile_cont over the
    same doubles); the cut compares unrounded doubles built from the
    same expressions."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    out = F.when(
        (F.col("mad") > 0.0)
        & (
            F.abs(F.col("value") - F.col("med"))
            > _MAD_CUT * _MAD_K * F.col("mad")
        ),
        1,
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy(
            "event_type",
            F.round("med", 6).alias("median_value"),
            F.round("mad", 6).alias("mad"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count(out).cast("bigint").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# --- autocorrelation of the daily series -------------------------------------

_ACF_MAX_LAG = 7


@query(
    "agg_autocorrelation",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    pairs AS (
      SELECT d.event_type, l.lag, d.v AS x, p.v AS y
      FROM daily d
      CROSS JOIN (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag) l
      JOIN daily p
        ON p.event_type = d.event_type
       AND p.day = d.day - CAST(l.lag AS INTEGER)
    ),
    st AS (
      SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(x AS DECIMAL(18,6))) AS sx,
             sum(CAST(y AS DECIMAL(18,6))) AS sy,
             sum(CAST(x * y AS DECIMAL(28,10))) AS sxy,
             sum(CAST(x * x AS DECIMAL(28,10))) AS sxx,
             sum(CAST(y * y AS DECIMAL(28,10))) AS syy
      FROM pairs GROUP BY 1, 2
    ),
    mo AS (
      SELECT event_type, lag, n,
             CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n
               AS cov,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
             * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
               AS varprod
      FROM st
    )
    SELECT event_type, CAST(lag AS INTEGER) AS lag, n,
           CASE WHEN varprod > 0.0
                THEN round(cov / sqrt(varprod), 6) END AS acf
    FROM mo ORDER BY event_type, lag
    """,
)
def agg_autocorrelation(spark, sf_dir):
    """Autocorrelation function of each event_type's daily value series
    at lags 1..{_ACF_MAX_LAG}: Pearson correlation between the series
    and its lag-shifted self. The forecasting primitive — a spike at
    lag 7 means weekly seasonality, slow decay means trend, white noise
    hovers near 0.

    Scale: the corpus collapses to |types|×|days| daily points FIRST;
    the lag fan-out multiplies that tiny series by {_ACF_MAX_LAG}
    (broadcast cross join) and pairs align by CALENDAR self-join on
    (type, day − lag) — gap-proof (a missing day never silently shifts
    the alignment, which row-offset lag() would) and an equi-join
    Catalyst can broadcast. The join input is days, never events.
    Pearson terms come from decimal exact sums of pre-rounded daily
    values pushed through identical double expressions."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum(dec("value")).cast("double"), 4).alias("v"))
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    cur = daily.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "lag",
        "day",
        F.col("v").alias("x"),
        F.date_sub("day", F.col("lag").cast("int")).alias("prev_day"),
    )
    prev = daily.select(
        F.col("event_type").alias("p_type"),
        F.col("day").alias("p_day"),
        F.col("v").alias("y"),
    )
    pairs = cur.join(
        prev,
        (cur.event_type == prev.p_type) & (cur.prev_day == prev.p_day),
    ).select("event_type", "lag", "x", "y")
    st = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,10)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,10)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(28,10)")).alias("syy"),
    )
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    n = F.col("n")
    varprod = (sxx - sx * sx / n) * (syy - sy * sy / n)
    acf = F.when(
        varprod > 0.0,
        F.round((sxy - sx * sy / n) / F.sqrt(varprod), 6),
    )
    return st.select(
        "event_type", F.col("lag").cast("int").alias("lag"), "n", acf.alias("acf")
    ).orderBy("event_type", "lag")


# --- CUSUM changepoint -------------------------------------------------------


@query(
    "ext_changepoint_cusum",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*), 6) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    g AS (
      SELECT event_type,
             CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS gmean,
             CAST(count(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1
    ),
    cusum AS (
      SELECT d.event_type, d.day, g.n_days,
             round(CAST(sum(CAST(d.v - g.gmean AS DECIMAL(18,6)))
                        OVER (PARTITION BY d.event_type ORDER BY d.day)
                   AS DOUBLE), 6) AS s
      FROM daily d JOIN g ON d.event_type = g.event_type
    ),
    ranked AS (
      SELECT event_type, day, s, n_days,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(s) DESC, day) AS rn
      FROM cusum
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS changepoint_day,
           round(abs(s), 6) AS cusum_stat, n_days
    FROM ranked WHERE rn = 1 ORDER BY event_type
    """,
)
def ext_changepoint_cusum(spark, sf_dir):
    """CUSUM changepoint localization per event_type: the running sum
    of (daily mean − overall mean) peaks in magnitude at the most
    likely level-shift day. Complements agg_histogram_kl_drift — KL
    says the distribution moved between two halves; CUSUM pinpoints the
    day the level changed, the number an on-call engineer actually
    needs.

    Scale: daily pre-agg first (|types|×|days| rows), then a running
    sum and an argmax window, both under ONE (event_type) partitioning.
    The running sum is over DECIMAL deviations — exact prefix sums, so
    the left-to-right accumulation is engine-independent by
    construction, not by luck; the argmax carries a day tie-break."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(
        F.round(
            F.sum(dec("value")).cast("double") / F.count(F.lit(1)), 6
        ).alias("v")
    )
    g = daily.groupBy("event_type").agg(
        (F.sum(dec("v")).cast("double") / F.count(F.lit(1))).alias("gmean"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = daily.join(F.broadcast(g), "event_type").select(
        "event_type",
        "day",
        "n_days",
        F.round(
            F.sum((F.col("v") - F.col("gmean")).cast("decimal(18,6)"))
            .over(w_run)
            .cast("double"),
            6,
        ).alias("s"),
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s")).desc(), "day"
    )
    return (
        cusum.select(
            "event_type",
            "day",
            "s",
            "n_days",
            F.row_number().over(w_rank).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("changepoint_day"),
            F.round(F.abs(F.col("s")), 6).alias("cusum_stat"),
            "n_days",
        )
        .orderBy("event_type")
    )


# --- weekday seasonality -----------------------------------------------------


@query(
    "agg_weekday_seasonality",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(isodow(date_trunc('day', ts)) AS INTEGER) AS dow,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    per_dow AS (
      SELECT event_type, dow,
             CAST(sum(n) AS DOUBLE) / count(*) AS dow_mean
      FROM daily GROUP BY 1, 2
    ),
    overall AS (
      SELECT event_type,
             CAST(sum(n) AS DOUBLE) / count(*) AS all_mean
      FROM daily GROUP BY 1
    )
    SELECT p.event_type, p.dow,
           round(p.dow_mean, 6) AS dow_mean_events,
           round(p.dow_mean / o.all_mean, 6) AS seasonal_index
    FROM per_dow p JOIN overall o ON p.event_type = o.event_type
    ORDER BY p.event_type, p.dow
    """,
)
def agg_weekday_seasonality(spark, sf_dir):
    """Day-of-week seasonal index per event_type: mean daily event
    count on each ISO weekday divided by the overall mean daily count.
    Index 1.3 on Monday means Mondays run 30% hot — the normalization
    table for deseasonalizing metrics before anomaly thresholds are
    applied (win_zscore_anomaly fires falsely every weekend without
    it).

    Scale: one corpus hash-agg to |types|×|days|, two tiny re-aggs,
    one broadcast join. Means are exact-integer sums through identical
    double division; isodow == Spark weekday()+1 (both 1=Monday)."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("DAY", "ts").cast("date").alias("day"),
        (F.weekday(F.date_trunc("DAY", "ts")) + F.lit(1)).cast("int").alias("dow"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    per_dow = daily.groupBy("event_type", "dow").agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("dow_mean")
    )
    overall = daily.groupBy("event_type").agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("all_mean")
    )
    return (
        per_dow.join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            "dow",
            F.round("dow_mean", 6).alias("dow_mean_events"),
            F.round(F.col("dow_mean") / F.col("all_mean"), 6).alias(
                "seasonal_index"
            ),
        )
        .orderBy("event_type", "dow")
    )


# --- Benford first-digit audit -----------------------------------------------


@query(
    "agg_benford_deviation",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                  AS INTEGER) AS d
      FROM orders WHERE o_totalprice >= 1.0
    ),
    cnt AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt)
    SELECT d, n,
           round(CAST(n AS DOUBLE) / total, 6) AS observed_p,
           round(log10(1.0 + 1.0 / d), 6) AS benford_p,
           round(CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / d), 6)
             AS deviation
    FROM cnt CROSS JOIN tot ORDER BY d
    """,
)
def agg_benford_deviation(spark, sf_dir):
    """Benford's-law audit of order values: observed first-significant-
    digit frequencies against the log10(1 + 1/d) expectation, with the
    per-digit deviation. The classic fabricated/synthetic-data detector
    for financial columns — organic multiplicative processes follow
    Benford; uniform generators and padded figures don't (this
    TPC-H-ish synthetic column visibly won't, which is the point of an
    audit that reports deviations instead of asserting conformance).

    Scale: digit extraction is a pure map via the decimal→string cast
    (identical canonical formatting in both engines — no float log10
    on the extraction path, which would be ulp-fragile near powers of
    ten); the audit is a 9-row hash-agg. Expected probabilities are
    identical double literals."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    d = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    cnt = o.select(d.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cnt.agg(F.sum("n").cast("bigint").alias("total"))
    obs = F.col("n").cast("double") / F.col("total")
    ben = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            F.round(obs, 6).alias("observed_p"),
            F.round(ben, 6).alias("benford_p"),
            F.round(obs - ben, 6).alias("deviation"),
        )
        .orderBy("d")
    )
