"""Analytics operators, wave 16: market-basket association rules and
user-journey mining — co-occurrence lift over per-day baskets, frequent
session paths, signup→purchase conversion lag, per-user behavioral
entropy, and inter-event arrival statistics.

This is the "what do users actually do" layer: basket rules power
cross-sell and next-action hints, frequent paths surface the real
product flows (vs the designed ones), time-to-convert is the growth
team's core funnel metric, journey entropy separates habitual users
from erratic ones, and inter-arrival statistics parameterize load
models and session-gap thresholds (the 30-minute sessionization cutoff
should come FROM this table).

Reference parity: the reference has no journey surface; these extend
it per the BASELINE north-star list, like plans/analytics.py.

Cross-engine float rule: decimal exact sums for aggregates
(plans/common.py rule 1); ratios/logs are identical literal double
expressions over exact integer counts; medians/percentiles interpolate
identically (Spark percentile ≡ DuckDB quantile_cont).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from habits_etl_spark.plans.common import query, t

# --- market-basket association rules -----------------------------------------

_BASKET_MIN_SUPPORT = 5  # pairs seen in fewer baskets are noise


@query(
    "ext_basket_pairs",
    f"""
    WITH basket AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             event_type AS item
      FROM events
    ),
    nb AS (
      SELECT CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS n_baskets
      FROM basket
    ),
    item_n AS (
      SELECT item, CAST(count(*) AS BIGINT) AS n_a FROM basket GROUP BY 1
    ),
    pair_n AS (
      SELECT a.item AS antecedent, b.item AS consequent,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM basket a JOIN basket b
        ON a.user_id = b.user_id AND a.day = b.day AND a.item <> b.item
      GROUP BY 1, 2
      HAVING count(*) >= {_BASKET_MIN_SUPPORT}
    )
    SELECT p.antecedent, p.consequent, p.n_ab,
           round(CAST(p.n_ab AS DOUBLE) / nb.n_baskets, 6) AS support,
           round(CAST(p.n_ab AS DOUBLE) / ia.n_a, 6) AS confidence,
           round((CAST(p.n_ab AS DOUBLE) / ia.n_a)
                 / (CAST(ic.n_a AS DOUBLE) / nb.n_baskets), 6) AS lift
    FROM pair_n p
    JOIN item_n ia ON p.antecedent = ia.item
    JOIN item_n ic ON p.consequent = ic.item
    CROSS JOIN nb
    ORDER BY antecedent, consequent
    """,
)
def ext_basket_pairs(spark, sf_dir):
    """Association rules over (user, day) baskets of event types:
    support, confidence, and lift for every ordered item pair above the
    {_BASKET_MIN_SUPPORT}-basket support floor. Lift > 1 means the pair
    co-occurs more than independence predicts — the level-2 Apriori
    pass that powers "users who did A today also did B".

    Scale: the basket relation dedups FIRST (one hash-agg), so the
    pair self-join explodes at most |items-per-basket|² per basket —
    bounded by the type vocabulary, never by event volume; the join key
    (user, day) co-partitions both sides in ONE shuffle. Item counts
    and the basket total are broadcast. All ratios are exact-integer
    divisions evaluated identically in both engines."""
    ev = t(spark, sf_dir, "events")
    # NOTE (r14): caching this distinct (four consumers: nb, item_n, both
    # self-join sides) was measured and REJECTED — alternating solo A/B
    # at sf0.1 showed a consistent ~30% REGRESSION (1.11/1.19 s -> 1.50/
    # 1.68 s warm medians): the columnar materialization + lost column
    # pruning cost more than three re-scans of a narrow projected
    # distinct. Recompute-per-consumer is the right call here.
    basket = ev.select(
        "user_id",
        F.date_trunc("DAY", "ts").cast("date").alias("day"),
        F.col("event_type").alias("item"),
    ).distinct()
    nb = basket.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets")
    )
    item_n = basket.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a")
    )
    b2 = basket.select(
        F.col("user_id").alias("u2"),
        F.col("day").alias("d2"),
        F.col("item").alias("consequent"),
    )
    pair_n = (
        basket.join(
            b2,
            (basket.user_id == b2.u2)
            & (basket.day == b2.d2)
            & (basket.item != b2.consequent),
        )
        .groupBy(F.col("item").alias("antecedent"), "consequent")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= _BASKET_MIN_SUPPORT)
    )
    ia = item_n.select(
        F.col("item").alias("antecedent"), F.col("n_a").alias("na_a")
    )
    ic = item_n.select(
        F.col("item").alias("consequent"), F.col("n_a").alias("na_c")
    )
    return (
        pair_n.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("n_baskets"), 6).alias(
                "support"
            ),
            F.round(F.col("n_ab").cast("double") / F.col("na_a"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("n_ab").cast("double") / F.col("na_a"))
                / (F.col("na_c").cast("double") / F.col("n_baskets")),
                6,
            ).alias("lift"),
        )
        .orderBy("antecedent", "consequent")
    )


# --- frequent journey paths --------------------------------------------------

_PATH_TOPK = 10


@query(
    "ext_journey_paths_topk",
    f"""
    WITH tri AS (
      SELECT event_type || '>' || lead(event_type, 1) OVER s
               || '>' || lead(event_type, 2) OVER s AS path
      FROM events
      WINDOW s AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    cnt AS (
      SELECT path, CAST(count(*) AS BIGINT) AS n
      FROM tri WHERE path IS NOT NULL
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt)
    SELECT path, n, round(CAST(n AS DOUBLE) / total, 6) AS share
    FROM cnt CROSS JOIN tot ORDER BY n DESC, path LIMIT {_PATH_TOPK}
    """,
)
def ext_journey_paths_topk(spark, sf_dir):
    """The {_PATH_TOPK} most frequent 3-step event paths across each
    user's ordered journey: sliding trigrams over the per-user event
    sequence, counted corpus-wide with their share of all trigrams.
    The "what flows actually happen" table product teams diff against
    their designed funnels; ext_event_transitions is its first-order
    summary, this is the order-2 refinement that catches patterns a
    Markov chain smooths away.

    Scale: trigram assembly is ONE user_id shuffle (two leads share a
    window); the path count is a hash-agg with map-side partials onto
    at most |types|³ groups, and the top-k is a TakeOrdered with a
    path tie-break (common.py rule 4). A session-bounded variant is
    the same plan with the ext_sessionize flag refining the partition
    key — on this corpus per-user inter-arrival gaps run to hours
    (see win_inter_event_times for the per-type tails), so whole-
    journey paths are the meaningful statistic."""
    ev = t(spark, sf_dir, "events")
    w_s = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.when(
            F.lead("event_type", 2).over(w_s).isNotNull(),
            F.concat_ws(
                ">",
                "event_type",
                F.lead("event_type", 1).over(w_s),
                F.lead("event_type", 2).over(w_s),
            ),
        ).alias("path")
    )
    cnt = (
        tri.filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = cnt.agg(F.sum("n").cast("bigint").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.col("n").desc(), "path")
        .limit(_PATH_TOPK)
    )


# --- signup -> purchase conversion lag ---------------------------------------


@query(
    "agg_time_to_convert",
    """
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup
      FROM events GROUP BY 1
    ),
    conv AS (
      SELECT f.user_id, f.first_signup,
             min(e.ts) AS first_purchase_after
      FROM firsts f
      LEFT JOIN events e
        ON e.user_id = f.user_id AND e.event_type = 'purchase'
       AND e.ts >= f.first_signup
      WHERE f.first_signup IS NOT NULL
      GROUP BY 1, 2
    ),
    lagd AS (
      SELECT strftime(date_trunc('week', first_signup), '%Y-%m-%d') AS signup_week,
             first_purchase_after IS NOT NULL AS converted,
             round((epoch_us(first_purchase_after) - epoch_us(first_signup))
                   / 86400000000.0, 6) AS days_to_convert
      FROM conv
    )
    SELECT signup_week,
           CAST(count(*) AS BIGINT) AS n_signups,
           CAST(count(*) FILTER (WHERE converted) AS BIGINT) AS n_converted,
           round(CAST(count(*) FILTER (WHERE converted) AS DOUBLE)
                 / count(*), 6) AS conversion_rate,
           round(quantile_cont(days_to_convert, 0.5), 6) AS median_days,
           round(quantile_cont(days_to_convert, 0.9), 6) AS p90_days
    FROM lagd GROUP BY 1 ORDER BY 1
    """,
)
def agg_time_to_convert(spark, sf_dir):
    """Signup→purchase conversion lag by signup-week cohort: how many
    of each week's first-time signups ever purchased after signing up,
    and the median / p90 days it took. The growth team's core funnel
    latency metric — ext_event_funnel counts WHO converts; this
    measures HOW LONG conversion takes and whether later cohorts
    convert faster.

    Scale: per-user firsts are one hash-agg on user_id; the
    purchase-after-signup lookup joins on the SAME key (co-partitioned,
    no extra shuffle under AQE); the cohort rollup is |weeks| rows.
    Lags are exact-microsecond integers pushed through an identical
    double division, and the percentiles interpolate identically in
    both engines over those pre-rounded doubles."""
    ev = t(spark, sf_dir, "events")
    firsts = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
                "first_signup"
            )
        )
        .filter(F.col("first_signup").isNotNull())
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    conv = (
        firsts.join(
            purchases,
            (firsts.user_id == purchases.p_uid)
            & (purchases.p_ts >= firsts.first_signup),
            "left",
        )
        .groupBy("user_id", "first_signup")
        .agg(F.min("p_ts").alias("first_purchase_after"))
    )
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    lagd = conv.select(
        F.date_format(F.date_trunc("WEEK", "first_signup"), "yyyy-MM-dd").alias(
            "signup_week"
        ),
        F.col("first_purchase_after").isNotNull().alias("converted"),
        F.round(
            (us("first_purchase_after") - us("first_signup")) / 86400000000.0, 6
        ).alias("days_to_convert"),
    )
    return (
        lagd.groupBy("signup_week")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_signups"),
            F.count(F.when(F.col("converted"), 1)).cast("bigint").alias(
                "n_converted"
            ),
            F.round(
                F.count(F.when(F.col("converted"), 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("conversion_rate"),
            F.round(F.percentile("days_to_convert", F.lit(0.5)), 6).alias(
                "median_days"
            ),
            F.round(F.percentile("days_to_convert", F.lit(0.9)), 6).alias(
                "p90_days"
            ),
        )
        .orderBy("signup_week")
    )


# --- per-user behavioral entropy ---------------------------------------------


@query(
    "ext_user_journey_entropy",
    """
    WITH cnt AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1
    ),
    terms AS (
      SELECT cnt.user_id, tot.n,
             -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n) AS h_term
      FROM cnt JOIN tot ON cnt.user_id = tot.user_id
    )
    SELECT user_id, max(n) AS n_events,
           CAST(count(*) AS BIGINT) AS n_types,
           round(CAST(sum(CAST(h_term AS DECIMAL(28,12))) AS DOUBLE), 6)
             AS type_entropy_nats
    FROM terms GROUP BY 1 ORDER BY user_id
    """,
)
def ext_user_journey_entropy(spark, sf_dir):
    """Per-user behavioral entropy: Shannon entropy (nats) of each
    user's event-type distribution, with their event volume and type
    breadth. Entropy ≈ 0 = single-purpose users (bots, monitors);
    entropy near ln(|types|) = uniformly mixed behavior — the
    segmentation feature that separates habitual from exploratory
    usage, and a bot-detection signal.

    Scale: one corpus hash-agg to (user, type) counts, a user-keyed
    re-agg — both map-side-combining on co-partitioned keys — and the
    entropy reduce per user is |types|-bounded. Log terms are identical
    double expressions over exact integer counts, decimal-summed
    (the KL-drift pattern)."""
    ev = t(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = cnt.groupBy("user_id").agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    terms = cnt.join(tot, "user_id").select(
        "user_id", "n", (-p * F.log(p)).alias("h_term")
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.max("n").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.round(
                F.sum(F.col("h_term").cast("decimal(28,12)")).cast("double"), 6
            ).alias("type_entropy_nats"),
        )
        .orderBy("user_id")
    )


# --- inter-event arrival statistics ------------------------------------------


@query(
    "win_inter_event_times",
    """
    WITH gaps AS (
      SELECT event_type,
             CAST(epoch_us(ts)
                  - epoch_us(lag(ts) OVER (PARTITION BY event_type
                                           ORDER BY ts, event_id))
                  AS BIGINT) AS gap_us
      FROM events
    ),
    g AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0, 6)
             AS mean_gap_s,
           round(quantile_cont(CAST(gap_us AS DOUBLE), 0.5) / 1000000.0, 6)
             AS median_gap_s,
           round(quantile_cont(CAST(gap_us AS DOUBLE), 0.9) / 1000000.0, 6)
             AS p90_gap_s,
           round(CAST(max(gap_us) AS DOUBLE) / 1000000.0, 6) AS max_gap_s
    FROM g GROUP BY 1 ORDER BY 1
    """,
)
def win_inter_event_times(spark, sf_dir):
    """Inter-arrival statistics per event_type: mean/median/p90/max
    seconds between consecutive events of that type. The load-model
    table — capacity planning reads the mean, alerting thresholds read
    the p90, and the sessionization gap (ext_sessionize's 30 minutes)
    should sit far in this distribution's tail to be defensible.

    Scale: one shuffle on event_type for the lag window (per-type
    partitions sort locally); the stats are a per-type agg whose sums
    are exact microsecond integers — only the final divisions are
    doubles. Percentiles interpolate identically in both engines over
    integer-valued doubles. At 100 TB the per-type partition is the
    skew risk (one hot type = one partition) — the committed mitigation
    is sub-bucketing by day and merging boundary gaps, the
    plans/skew_stress.py pattern."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
        .cast("bigint")
        .alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    gd = F.col("gap_us").cast("double")
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.round(
                F.sum("gap_us").cast("double") / F.count(F.lit(1)) / 1e6, 6
            ).alias("mean_gap_s"),
            F.round(F.percentile(gd, F.lit(0.5)) / 1e6, 6).alias("median_gap_s"),
            F.round(F.percentile(gd, F.lit(0.9)) / 1e6, 6).alias("p90_gap_s"),
            F.round(F.max("gap_us").cast("double") / 1e6, 6).alias("max_gap_s"),
        )
        .orderBy("event_type")
    )
