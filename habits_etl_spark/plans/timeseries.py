"""Analytics operators, wave 13: market-style time-series rollups,
marketing attribution, and information-theoretic dependence measures.

These cover the "behavioral analytics" layer a serving warehouse adds on
top of the raw event stream: OHLC bars are the canonical first/last/
extreme rollup (any metered resource, not just prices), gap
interpolation repairs sparse per-entity series before feature
extraction, the two attribution queries split conversion credit across
preceding touches (the last-touch window shape and the fractional
linear-credit shape), the Markov transition matrix is the input to
next-event prediction and Sankey flow dashboards, and MI / chi-squared
quantify dependence between event dimensions (the feature-selection and
data-drift primitive).

Reference parity: the reference has no analytics surface beyond the
Grafana rollups (README SQL); these extend it per the BASELINE
north-star list, like plans/analytics.py.

Cross-engine float rule: every aggregated measure uses decimal exact
sums (plans/common.py rule 1); log/ratio terms are identical literal
double expressions in both engines, cast to decimal before the final
reduce (the agg_histogram_kl_drift pattern).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from habits_etl_spark.plans.common import day_str, query, t

# --- OHLC bars ---------------------------------------------------------------


@query(
    "agg_ohlc_bars",
    """
    WITH ordered AS (
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             value, ts, event_id,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type, day,
           round(CAST(max(CASE WHEN rn_a = 1 THEN CAST(value AS DECIMAL(18,6)) END)
                 AS DOUBLE), 6) AS open,
           round(CAST(max(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS high,
           round(CAST(min(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS low,
           round(CAST(max(CASE WHEN rn_d = 1 THEN CAST(value AS DECIMAL(18,6)) END)
                 AS DOUBLE), 6) AS close,
           CAST(count(*) AS BIGINT) AS volume,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS vsum
    FROM ordered GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def agg_ohlc_bars(spark, sf_dir):
    """Open/high/low/close bars per (event_type, day): the canonical
    first/last/extreme rollup over a time bucket (prices, sensor
    readings, metered usage). Open/close are deterministic under
    timestamp ties via the (ts, event_id) total order (common.py rule 4).

    Scale: ONE shuffle on (event_type, day-grain) serves both window
    sorts (ascending and descending row_number share the partition key,
    so Catalyst plans a single Exchange with two Sorts) and the final
    hash-agg is on the same key — no second shuffle. Windows are
    partitioned by the bar key, so per-partition state is one day of one
    series: bounded regardless of corpus size. 100 TB: bars parallelize
    over (type × day) — millions of independent groups."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bar = ev.select(
        "event_type",
        day_str(F.col("ts")).alias("day"),
        "value",
        "ts",
        "event_id",
    )
    w_a = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    w_d = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    dec_v = F.col("value").cast("decimal(18,6)")
    ordered = bar.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return (
        ordered.groupBy("event_type", "day")
        .agg(
            F.round(
                F.max(F.when(F.col("rn_a") == 1, dec_v)).cast("double"), 6
            ).alias("open"),
            F.round(F.max(dec_v).cast("double"), 6).alias("high"),
            F.round(F.min(dec_v).cast("double"), 6).alias("low"),
            F.round(
                F.max(F.when(F.col("rn_d") == 1, dec_v)).cast("double"), 6
            ).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("volume"),
            F.round(F.sum(dec_v).cast("double"), 4).alias("vsum"),
        )
        .orderBy("event_type", "day")
    )


# --- linear gap interpolation ------------------------------------------------


@query(
    "fn_ts_interpolate",
    """
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS v
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    joined AS (
      SELECT s.user_id, s.day, d.v FROM spine s
      LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    ),
    ctx AS (
      SELECT user_id, day, v,
             last_value(v IGNORE NULLS) OVER w_p AS prev_v,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER w_p AS prev_d,
             first_value(v IGNORE NULLS) OVER w_f AS next_v,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER w_f AS next_d
      FROM joined
      WINDOW
        w_p AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_f AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           CASE WHEN v IS NOT NULL THEN v
                ELSE round(prev_v + (next_v - prev_v)
                           * (CAST(day - prev_d AS DOUBLE)
                              / CAST(next_d - prev_d AS DOUBLE)), 6)
           END AS value_filled,
           v IS NULL AS interpolated
    FROM ctx ORDER BY user_id, day
    """,
)
def fn_ts_interpolate(spark, sf_dir):
    """Linear interpolation of gaps in each user's daily purchase-value
    series: build the per-user day spine between first and last active
    day, then fill missing days as prev + (next - prev) * elapsed/gap.
    The series-repair stage every per-entity feature extractor needs
    before rolling windows make sense (a 7-day mean over a series with
    holes silently shortens the window).

    Scale: the daily pre-agg shrinks events to |user|x|day| rows BEFORE
    any window; the spine explodes a bounded sequence (one month) per
    user; both ignore-nulls carries run under ONE shuffle on user_id
    (shared partition key, two Sort orders collapse to one — the frames
    differ, not the ordering). Interpolation is an identical double
    expression in both engines, rounded at emission; anchor values are
    pre-rounded decimal sums so both engines interpolate from identical
    doubles."""
    ev = t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias(
            "v"
        )
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w_p = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    day_if_present = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = joined.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_p).alias("prev_v"),
        F.last(day_if_present, ignorenulls=True).over(w_p).alias("prev_d"),
        F.first("v", ignorenulls=True).over(w_f).alias("next_v"),
        F.first(day_if_present, ignorenulls=True).over(w_f).alias("next_d"),
    )
    frac = F.datediff(F.col("day"), F.col("prev_d")).cast("double") / F.datediff(
        F.col("next_d"), F.col("prev_d")
    ).cast("double")
    return ctx.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(
            F.round(
                F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac, 6
            )
        )
        .alias("value_filled"),
        F.col("v").isNull().alias("interpolated"),
    ).orderBy("user_id", "day")


# --- last-touch attribution --------------------------------------------------

_ATTR_WINDOW_DAYS = 7


@query(
    "win_last_touch_attribution",
    f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS) OVER w AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                        IGNORE NULLS) OVER w AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT coalesce(CASE WHEN touch_ts >= ts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
                         THEN touch_type END, '(direct)') AS touch_type,
           CAST(count(*) AS BIGINT) AS conversions
    FROM ordered WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
)
def win_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase is credited to the user's
    most recent non-purchase event within the preceding 7 days;
    purchases with no in-window touch count as '(direct)'. The classic
    marketing-attribution window shape — an as-of lookup expressed as an
    ignore-nulls carry instead of a join.

    Scale: ONE shuffle on user_id; the two ignore-nulls carries share a
    frame ending at 1 PRECEDING (a purchase never attributes to itself)
    and pick their values from the same row because their CASE
    predicates are identical — no struct carry needed, so no
    struct-ordering divergence between engines. Per-partition window
    state is O(1). The final agg is |touch types| rows."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch_type = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    is_touch_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    ordered = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(is_touch_type, ignorenulls=True).over(w).alias("touch_type"),
        F.last(is_touch_ts, ignorenulls=True).over(w).alias("touch_ts"),
    )
    in_window = F.col("touch_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS"
    )
    return (
        ordered.filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.when(in_window, F.col("touch_type")), F.lit("(direct)")
            ).alias("touch_type")
        )
        .groupBy("touch_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("conversions"))
        .orderBy("touch_type")
    )


# --- linear (multi-touch) attribution ----------------------------------------

_LIN_WINDOW_DAYS = 3


@query(
    "ext_linear_attribution",
    f"""
    WITH purchases AS (
      SELECT user_id, ts AS p_ts, event_id AS p_id FROM events
      WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, ts AS t_ts, event_id AS t_id, event_type AS touch_type
      FROM events WHERE event_type <> 'purchase'
    ),
    pairs AS (
      SELECT p.p_id, t.touch_type
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t.t_ts < p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL {_LIN_WINDOW_DAYS} DAY
    ),
    credit AS (
      SELECT p_id, touch_type,
             round(CAST(count(*) AS DOUBLE)
                   / sum(count(*)) OVER (PARTITION BY p_id), 12) AS frac
      FROM pairs GROUP BY 1, 2
    )
    SELECT touch_type,
           round(CAST(sum(CAST(frac AS DECIMAL(28,12))) AS DOUBLE), 6)
             AS credited_conversions,
           CAST(count(DISTINCT p_id) AS BIGINT) AS touched_purchases
    FROM credit GROUP BY 1 ORDER BY 1
    """,
)
def ext_linear_attribution(spark, sf_dir):
    """Linear multi-touch attribution: each purchase splits one unit of
    conversion credit equally across ALL the user's touch events in the
    preceding 3 days (per-type share = n_type / n_total per purchase).
    Complements win_last_touch_attribution — linear credit is the
    standard fairness baseline when journeys have many touchpoints.

    Scale: the purchase-touch pair join is equi on user_id with a
    bounded time-range predicate — per-user work is (purchases x
    touches-in-3-days), linear in practice because the window bounds the
    right side; the 100 TB escalation is the binned range join
    (join_range_binned) on (user_id, day-bucket). The per-purchase
    credit split collapses pairs to (purchase, type) counts FIRST (one
    hash-agg), so the window normalize runs on |purchases|x|types| rows,
    not raw pairs. Credit fractions are exact rationals rounded to 12
    digits in both engines before the decimal reduce."""
    ev = t(spark, sf_dir, "events")
    # Both sides derive from the SAME events scan; joining on bare
    # attribute Columns (purchases.user_id == touches.user_id) makes
    # Spark 4 warn "Constructing trivially true equals predicate" and
    # auto-disambiguate by lineage — one resolution change away from a
    # silent cross product. Qualified plan aliases pin the resolution.
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    ).alias("p")
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("ts").alias("t_ts"), F.col("event_type").alias("touch_type")
    ).alias("tc")
    pairs = purchases.join(
        touches,
        (F.col("p.user_id") == F.col("tc.user_id"))
        & (F.col("tc.t_ts") < F.col("p.p_ts"))
        & (
            F.col("tc.t_ts")
            >= F.col("p.p_ts") - F.expr(f"INTERVAL {_LIN_WINDOW_DAYS} DAYS")
        ),
    ).select("p_id", "touch_type")
    per_type = pairs.groupBy("p_id", "touch_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_p = Window.partitionBy("p_id")
    credit = per_type.select(
        "p_id",
        "touch_type",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w_p), 12
        ).alias("frac"),
    )
    return (
        credit.groupBy("touch_type")
        .agg(
            F.round(
                F.sum(F.col("frac").cast("decimal(28,12)")).cast("double"), 6
            ).alias("credited_conversions"),
            F.countDistinct("p_id").cast("bigint").alias("touched_purchases"),
        )
        .orderBy("touch_type")
    )


# --- Markov transition matrix ------------------------------------------------


@query(
    "ext_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    cnt AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    )
    SELECT cur, nxt, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur), 6) AS p
    FROM cnt ORDER BY cur, nxt
    """,
)
def ext_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over each user's event
    sequence: count and conditional probability P(next | current) for
    every ordered event-type pair. The input to next-event prediction,
    Sankey flow dashboards, and anomalous-session scoring (low-
    probability paths).

    Scale: one shuffle on user_id for the lead(); the (cur, nxt) count
    is a hash-agg with map-side partials onto a |types|² result; the
    row-normalize window runs on that tiny matrix. Probabilities are
    exact-integer ratios evaluated as the same double division in both
    engines."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    cnt = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w_row = Window.partitionBy("cur")
    return cnt.select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w_row), 6).alias("p"),
    ).orderBy("cur", "nxt")


# --- mutual information ------------------------------------------------------


@query(
    "agg_mutual_information",
    """
    WITH cell AS (
      SELECT event_type AS x, CAST(extract(hour FROM ts) AS INTEGER) AS y,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell),
    marg_x AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM cell GROUP BY 1),
    marg_y AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM cell GROUP BY 1),
    terms AS (
      SELECT (CAST(c AS DOUBLE) / n)
               * ln((CAST(c AS DOUBLE) * n)
                    / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))) AS mi_term
      FROM cell
      JOIN marg_x USING (x) JOIN marg_y USING (y) CROSS JOIN tot
    )
    SELECT round(CAST(sum(CAST(mi_term AS DECIMAL(28,12))) AS DOUBLE), 6)
             AS mutual_information_nats,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM terms
    """,
)
def agg_mutual_information(spark, sf_dir):
    """Mutual information (nats) between event_type and hour-of-day:
    sum over contingency cells of p(x,y)·ln(p(x,y)/(p(x)p(y))). The
    feature-selection / drift primitive: MI ≈ 0 means the dimension
    carries no information about the other (here: whether event mix
    shifts by hour).

    Scale: ONE corpus-sized hash-agg builds the |types|×24 contingency
    table; marginals and the MI reduce run on that broadcast-sized
    matrix. The log term is the same literal double expression in both
    engines over exact integer counts (the KL-drift pattern), cast to
    decimal for the final order-independent sum."""
    ev = t(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("event_type").alias("x"),
        F.hour("ts").cast("int").alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = cell.agg(F.sum("c").cast("bigint").alias("n"))
    marg_x = cell.groupBy("x").agg(F.sum("c").cast("bigint").alias("cx"))
    marg_y = cell.groupBy("y").agg(F.sum("c").cast("bigint").alias("cy"))
    c, n = F.col("c").cast("double"), F.col("n")
    term = (c / n) * F.log(
        (c * n) / (F.col("cx").cast("double") * F.col("cy").cast("double"))
    )
    terms = (
        cell.join(F.broadcast(marg_x), "x")
        .join(F.broadcast(marg_y), "y")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("mi_term"))
    )
    return terms.agg(
        F.round(
            F.sum(F.col("mi_term").cast("decimal(28,12)")).cast("double"), 6
        ).alias("mutual_information_nats"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )


# --- chi-squared independence ------------------------------------------------


@query(
    "agg_chi2_independence",
    """
    WITH cell AS (
      SELECT event_type AS x, CAST(isodow(ts) AS INTEGER) AS y,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell),
    marg_x AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM cell GROUP BY 1),
    marg_y AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM cell GROUP BY 1),
    terms AS (
      SELECT ((CAST(c AS DOUBLE)
               - CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE) / n)
              * (CAST(c AS DOUBLE)
                 - CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE) / n))
             / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE) / n) AS chi_term
      FROM cell
      JOIN marg_x USING (x) JOIN marg_y USING (y) CROSS JOIN tot
    ),
    dims AS (
      SELECT CAST(count(DISTINCT x) AS BIGINT) AS kx,
             CAST(count(DISTINCT y) AS BIGINT) AS ky
      FROM cell
    )
    SELECT round(CAST(sum(CAST(chi_term AS DECIMAL(28,12))) AS DOUBLE), 6)
             AS chi2,
           (SELECT (kx - 1) * (ky - 1) FROM dims) AS dof
    FROM terms
    """,
)
def agg_chi2_independence(spark, sf_dir):
    """Pearson chi-squared statistic for independence between event_type
    and ISO day-of-week: sum over cells of (observed − expected)² /
    expected, with expected = row·col/n. MI's hypothesis-testing twin —
    the standard check that a categorical feature's distribution is
    stable across a second dimension.

    Scale: identical shape to agg_mutual_information — one corpus hash-
    agg to a |types|×7 table, broadcast marginals, decimal reduce over
    identically-computed double terms. Note the cell grid omits
    structurally-empty cells; chi² over observed cells only is the
    sparse-contingency convention both engines share here (expected>0
    for every present cell by construction)."""
    ev = t(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("event_type").alias("x"),
        (F.weekday("ts") + F.lit(1)).cast("int").alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = cell.agg(F.sum("c").cast("bigint").alias("n"))
    marg_x = cell.groupBy("x").agg(F.sum("c").cast("bigint").alias("cx"))
    marg_y = cell.groupBy("y").agg(F.sum("c").cast("bigint").alias("cy"))
    exp = F.col("cx").cast("double") * F.col("cy").cast("double") / F.col("n")
    obs = F.col("c").cast("double")
    terms = (
        cell.join(F.broadcast(marg_x), "x")
        .join(F.broadcast(marg_y), "y")
        .crossJoin(F.broadcast(tot))
        .select(((obs - exp) * (obs - exp) / exp).alias("chi_term"))
    )
    dims = cell.agg(
        F.countDistinct("x").cast("bigint").alias("kx"),
        F.countDistinct("y").cast("bigint").alias("ky"),
    ).select(((F.col("kx") - 1) * (F.col("ky") - 1)).alias("dof"))
    return terms.agg(
        F.round(
            F.sum(F.col("chi_term").cast("decimal(28,12)")).cast("double"), 6
        ).alias("chi2")
    ).crossJoin(F.broadcast(dims))
