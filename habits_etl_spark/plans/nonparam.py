"""Operators, wave 27: null-safe join semantics and nonparametric
tests — the ``IS NOT DISTINCT FROM`` equi-join, the Wald–Wolfowitz
runs test for residual randomness, and Kendall's tau rank correlation.

Null-safe equality is the one join comparator the surface had not yet
exercised end-to-end: standard equi-joins silently DROP null keys
(NULL = NULL is NULL), which loses the "uncategorized" bucket exactly
where a reporting rollup needs it. The two tests round out the
statistics layer with distribution-free tools: the runs test asks
whether a residual series is actually random (a trend/seasonal model
whose residuals cluster in runs is underfitting — the check that
should follow ts_seasonal_residual), and Kendall's tau correlates two
metrics by rank agreement, immune to the outliers and nonlinearity
that distort Pearson (agg_corr_value_hour's parametric twin).

Reference parity: the reference has no such surface; these extend it
per the BASELINE north-star list, like plans/robust.py.

Cross-engine rule: all three are exact-integer computations; the only
doubles are final closed-form statistics built from identical
expressions (plans/common.py rule 1)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from habits_etl_spark.plans.common import dec, query, t

# --- null-safe equi-join -----------------------------------------------------

# Bucket: the json props key k collapsed to a coarse tier; k >= 80 maps
# to NULL ("unclassified") — the bucket a null-dropping join would lose.
_NS_MAPPING = (
    ("low", "budget tier"),
    ("mid", "standard tier"),
    ("high", "premium tier"),
    (None, "unclassified"),
)


@query(
    "join_null_safe_eq",
    """
    WITH bucketed AS (
      SELECT CASE
               WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) < 40
                 THEN 'low'
               WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) < 80
                 THEN 'mid'
               WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) < 95
                 THEN 'high'
             END AS bucket,
             value
      FROM events WHERE value IS NOT NULL
    ),
    mapping(bucket, tier_name) AS (
      VALUES ('low', 'budget tier'), ('mid', 'standard tier'),
             ('high', 'premium tier'), (NULL, 'unclassified')
    )
    SELECT m.tier_name,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(b.value AS DECIMAL(18,6))) AS DOUBLE), 4)
             AS sum_value
    FROM bucketed b JOIN mapping m
      ON b.bucket IS NOT DISTINCT FROM m.bucket
    GROUP BY 1 ORDER BY 1
    """,
)
def join_null_safe_eq(spark, sf_dir):
    """Null-safe equi-join (Spark ``eqNullSafe`` ≡ SQL ``IS NOT
    DISTINCT FROM``): events bucketed by a props-derived tier — where
    the top of the range deliberately maps to NULL — joined to a tier
    dimension that carries an explicit NULL→'unclassified' row. A
    plain equi-join drops every null-bucket event on the floor
    (NULL = NULL is NULL, not TRUE); the null-safe comparator keeps
    the unclassified mass visible, which is the difference between a
    rollup that sums to the corpus total and one that silently leaks.

    Scale: the dimension is 4 rows (broadcast); null-safe equality is
    a valid hash-join key in Spark (EqualNullSafe hashes NULL to a
    bucket like any value), so the plan is the standard
    BroadcastHashJoin — no nested-loop penalty for the semantics.
    Exact counts + decimal sum."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    k = F.get_json_object("props", "$.k").cast("int")
    bucket = (
        F.when(k < 40, "low").when(k < 80, "mid").when(k < 95, "high")
    )
    bucketed = ev.select(bucket.alias("bucket"), "value")
    mapping = ev.sparkSession.createDataFrame(
        list(_NS_MAPPING), "bucket string, tier_name string"
    )
    return (
        bucketed.join(
            F.broadcast(mapping),
            bucketed["bucket"].eqNullSafe(mapping["bucket"]),
        )
        .groupBy("tier_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(dec("value")).cast("double"), 4).alias("sum_value"),
        )
        .orderBy("tier_name")
    )


# --- Wald–Wolfowitz runs test ------------------------------------------------


@query(
    "agg_runs_test",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, quantile_cont(v, 0.5) AS med FROM daily GROUP BY 1
    ),
    signed AS (
      SELECT d.event_type, d.day,
             CASE WHEN d.v > m.med THEN 1 WHEN d.v < m.med THEN 0 END AS s
      FROM daily d JOIN med m ON d.event_type = m.event_type
    ),
    seq AS (SELECT * FROM signed WHERE s IS NOT NULL),
    flagged AS (
      SELECT event_type, s,
             CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY day)
                       IS DISTINCT FROM s THEN 1 ELSE 0 END AS is_new_run
      FROM seq
    ),
    st AS (
      SELECT event_type,
             CAST(sum(is_new_run) AS BIGINT) AS n_runs,
             CAST(count(*) FILTER (WHERE s = 1) AS BIGINT) AS n_above,
             CAST(count(*) FILTER (WHERE s = 0) AS BIGINT) AS n_below
      FROM flagged GROUP BY 1
    )
    SELECT event_type, n_runs, n_above, n_below,
           round(1.0 + 2.0 * n_above * n_below / (n_above + n_below), 6)
             AS expected_runs,
           CASE WHEN n_above > 0 AND n_below > 0
                     AND (n_above + n_below) > 1 THEN
             round((n_runs - (1.0 + 2.0 * n_above * n_below
                              / (n_above + n_below)))
                   / sqrt(2.0 * n_above * n_below
                          * (2.0 * n_above * n_below - n_above - n_below)
                          / ((n_above + n_below) * (n_above + n_below)
                             * (n_above + n_below - 1.0))), 6)
           END AS z_stat
    FROM st ORDER BY event_type
    """,
)
def agg_runs_test(spark, sf_dir):
    """Wald–Wolfowitz runs test on each event_type's daily series:
    dichotomize days above/below the median (ties dropped, the
    standard convention), count maximal runs of the same sign, and
    compare to the expected run count under randomness via the normal
    z approximation. |z| large means the series clusters (trend,
    regime) or alternates (overcorrection) — run it on
    ts_seasonal_residual's residuals and a significant z says the
    decomposition is leaving structure on the table.

    Scale: one event_type shuffle serves the median (grouped
    percentile), the lag-based run flagging (gaps-and-islands — the
    ext_sessionize idiom on a sign column), and the final count. Run
    counting is exact integers; only the closed-form z is a double,
    guarded NULL when a side is empty."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum(dec("value")).cast("double"), 4).alias("v"))
    med = daily.groupBy("event_type").agg(
        F.percentile("v", F.lit(0.5)).alias("med")
    )
    s = F.when(F.col("v") > F.col("med"), 1).when(F.col("v") < F.col("med"), 0)
    seq = (
        daily.join(F.broadcast(med), "event_type")
        .select("event_type", "day", s.alias("s"))
        .filter(F.col("s").isNotNull())
    )
    w = Window.partitionBy("event_type").orderBy("day")
    flagged = seq.select(
        "event_type",
        "s",
        F.when(
            ~F.lag("s").over(w).eqNullSafe(F.col("s")), 1
        ).otherwise(0).alias("is_new_run"),
    )
    st = flagged.groupBy("event_type").agg(
        F.sum("is_new_run").cast("bigint").alias("n_runs"),
        F.count(F.when(F.col("s") == 1, 1)).cast("bigint").alias("n_above"),
        F.count(F.when(F.col("s") == 0, 1)).cast("bigint").alias("n_below"),
    )
    na, nb = F.col("n_above"), F.col("n_below")
    n = na + nb
    exp_runs = 1.0 + 2.0 * na * nb / n
    var_runs = (
        2.0 * na * nb * (2.0 * na * nb - na - nb) / (n * n * (n - 1.0))
    )
    return st.select(
        "event_type",
        "n_runs",
        "n_above",
        "n_below",
        F.round(exp_runs, 6).alias("expected_runs"),
        F.when(
            (na > 0) & (nb > 0) & (n > 1),
            F.round((F.col("n_runs") - exp_runs) / F.sqrt(var_runs), 6),
        ).alias("z_stat"),
    ).orderBy("event_type")


# --- Kendall's tau -----------------------------------------------------------


@query(
    "agg_kendall_tau",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             round(CAST(sum(CASE WHEN event_type = 'click'
                                 THEN CAST(value AS DECIMAL(18,6))
                                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE), 4)
               AS x,
             round(CAST(sum(CASE WHEN event_type = 'purchase'
                                 THEN CAST(value AS DECIMAL(18,6))
                                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE), 4)
               AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tie_x,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS tie_y
      FROM daily a JOIN daily b ON a.day < b.day
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(conc) AS BIGINT) AS concordant,
           CAST(sum(disc) AS BIGINT) AS discordant,
           CAST(sum(tie_x) AS BIGINT) AS ties_x,
           CAST(sum(tie_y) AS BIGINT) AS ties_y,
           CASE WHEN count(*) > sum(tie_x) AND count(*) > sum(tie_y) THEN
             round((sum(conc) - sum(disc))
                   / (sqrt(CAST(count(*) - sum(tie_x) AS DOUBLE))
                      * sqrt(CAST(count(*) - sum(tie_y) AS DOUBLE))), 6)
           END AS tau_b
    FROM pairs
    """,
)
def agg_kendall_tau(spark, sf_dir):
    """Kendall's tau-b rank correlation between the daily click-value
    and purchase-value series: over all day pairs, (concordant −
    discordant) normalized with the standard tie correction. The
    distribution-free answer to "do these two metrics move together" —
    a single outlier day that would swing Pearson
    (agg_corr_value_hour) shifts tau by at most O(1/n) pair votes.

    Scale: the corpus collapses to |days| rows FIRST; the pairwise
    comparison is |days|²/2 on that tiny series (the Theil–Sen
    argument — the quadratic term is bounded by series length, never
    corpus size; multi-year series sample day pairs with the same
    estimator). Concordance counting is exact integers; tau is one
    guarded closed-form double."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    zero = F.lit(0).cast("decimal(18,6)")
    daily = ev.groupBy(
        F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(
        F.round(
            F.sum(
                F.when(F.col("event_type") == "click", dec("value")).otherwise(zero)
            ).cast("double"),
            4,
        ).alias("x"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", dec("value")).otherwise(
                    zero
                )
            ).cast("double"),
            4,
        ).alias("y"),
    )
    b = daily.select(
        F.col("day").alias("b_day"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
    )
    prod = (F.col("x") - F.col("bx")) * (F.col("y") - F.col("by"))
    pairs = daily.join(b, daily.day < b.b_day).select(
        F.when(prod > 0, 1).otherwise(0).alias("conc"),
        F.when(prod < 0, 1).otherwise(0).alias("disc"),
        F.when(F.col("x") == F.col("bx"), 1).otherwise(0).alias("tie_x"),
        F.when(F.col("y") == F.col("by"), 1).otherwise(0).alias("tie_y"),
    )
    st = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("conc").cast("bigint").alias("concordant"),
        F.sum("disc").cast("bigint").alias("discordant"),
        F.sum("tie_x").cast("bigint").alias("ties_x"),
        F.sum("tie_y").cast("bigint").alias("ties_y"),
    )
    np_, tx, ty = F.col("n_pairs"), F.col("ties_x"), F.col("ties_y")
    tau = (F.col("concordant") - F.col("discordant")) / (
        F.sqrt((np_ - tx).cast("double")) * F.sqrt((np_ - ty).cast("double"))
    )
    return st.select(
        "n_pairs",
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        F.when((np_ > tx) & (np_ > ty), F.round(tau, 6)).alias("tau_b"),
    )
