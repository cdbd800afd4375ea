"""Operators, wave 29: corpus lifecycle — the mutation/accounting ops a
long-lived training corpus needs between crawls:

- ``sink_cdc_apply``: apply a change-data-capture log (insert / update /
  delete with a monotone sequence number, arriving out of order) onto a
  base snapshot — the generalization of ``sink_upsert_events`` that adds
  DELETE tombstones and latest-wins conflict resolution, i.e. the
  Parquet-era shape of Delta/Iceberg ``MERGE`` fed by a CDC stream.
- ``ext_dedup_impact_report``: per-source accounting of what exact
  dedup would REMOVE (docs and characters) when a re-crawl batch is
  unioned onto the corpus — the cost/benefit report a pipeline reads
  before committing a dedup pass (the collapse itself is
  ``ext_exact_dedup``; this is its ledger).
- ``ext_coreset_kcenter``: greedy k-center (Gonzalez) coreset selection
  over the embedding table — the deterministic data-selection op that
  picks k maximally-spread exemplars and reports the covering radius
  after each pick (how well k points summarize the corpus).

Reference parity: extends the reference's upsert sink
(etl/etl_habits.py:31-38) with deletes/sequence semantics; the other two
have no reference counterpart (BASELINE north-star: dedup, similarity).

Cross-engine rules (plans/common.py): latest-wins resolution uses
``max_by(x, seq)`` with a UNIQUE seq in both engines; no floats cross an
unordered aggregation without exact DECIMAL accumulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.plans.common import managed_cache, query, t


@query(
    "sink_cdc_apply",
    """
    WITH changelog AS (
      SELECT o_custkey
               + CASE WHEN o_orderkey % 11 = 0 THEN 100000 ELSE 0 END AS key,
             o_orderkey AS seq,
             CASE WHEN o_orderkey % 97 = 0 THEN 'D'
                  WHEN o_orderstatus = 'O' THEN 'I'
                  ELSE 'U' END AS op,
             o_totalprice AS new_bal
      FROM orders
    ),
    latest AS (
      SELECT key,
             CAST(count(*) AS BIGINT) AS n_changes,
             CAST(max(seq) AS BIGINT) AS last_seq,
             max_by(op, seq) AS last_op,
             max_by(new_bal, seq) AS last_bal
      FROM changelog GROUP BY key
    )
    SELECT coalesce(c.c_custkey, l.key) AS custkey,
           coalesce(c.c_name, '(cdc-insert)') AS name,
           round(CASE WHEN l.key IS NOT NULL THEN l.last_bal
                      ELSE c.c_acctbal END, 2) AS acctbal,
           coalesce(l.n_changes, 0) AS n_changes,
           l.last_seq AS last_seq
    FROM customer c
    FULL OUTER JOIN latest l ON c.c_custkey = l.key
    WHERE coalesce(l.last_op, '') <> 'D'
    ORDER BY custkey
    """,
)
def sink_cdc_apply(spark, sf_dir):
    """Apply an out-of-order CDC changelog (I/U/D + unique monotone seq,
    fabricated deterministically from orders: every 97th seq a DELETE,
    every 11th keyed past the base snapshot so it lands as a pure
    insert) onto the customer base snapshot. Latest-wins per key: the
    max-seq change decides — DELETE removes the key, otherwise its
    payload overwrites; untouched base rows pass through.

    Scale: the changelog collapses FIRST via one hash-aggregate on key
    (max_by partials combine map-side, so a 100 TB log reduces before
    any join), then meets the base in a single co-partitioned
    full-outer shuffle join on the key — no windows, no driver state.
    This is the MERGE-with-tombstones shape Delta/Iceberg CDC apply
    runs; snapshot atomicity for the written result is
    sinks/manifest.py."""
    o = t(spark, sf_dir, "orders")
    log = o.select(
        (
            F.col("o_custkey")
            + F.when(F.col("o_orderkey") % 11 == 0, 100000).otherwise(0)
        ).alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 97 == 0, "D")
        .when(F.col("o_orderstatus") == "O", "I")
        .otherwise("U")
        .alias("op"),
        F.col("o_totalprice").alias("new_bal"),
    )
    # r14 (guide §2.3 narrower agg state): max_by(op, seq) carries a
    # STRING buffer, which is immutable in UnsafeRow and forced the whole
    # changelog collapse into a SortAggregate. The op (3 values) packs
    # into the seq ordinal instead — seq*4 + code — so every buffer field
    # is fixed-width and the collapse is a HashAggregate with map-side
    # partials. seq is the unique o_orderkey (< 2^61), so the packing is
    # collision-free and max(packed) is max_by in one bigint.
    op_code = (
        F.when(F.col("op") == "D", 1)
        .when(F.col("op") == "I", 2)
        .otherwise(3)
    )
    packed = F.max(F.col("seq") * 4 + op_code)
    latest = log.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_changes"),
        packed.alias("__packed"),
        F.max_by("new_bal", "seq").alias("last_bal"),
    ).select(
        "key",
        "n_changes",
        F.expr("__packed div 4").alias("last_seq"),  # exact bigint division
        F.element_at(
            F.lit(["D", "I", "U"]), F.pmod(F.col("__packed"), 4).cast("int")
        ).alias("last_op"),
        "last_bal",
    )
    c = t(spark, sf_dir, "customer")
    merged = c.join(latest, c.c_custkey == latest.key, "full_outer")
    return (
        merged.filter(F.coalesce(F.col("last_op"), F.lit("")) != "D")
        .select(
            F.coalesce("c_custkey", "key").alias("custkey"),
            F.coalesce("c_name", F.lit("(cdc-insert)")).alias("name"),
            F.round(
                F.when(F.col("key").isNotNull(), F.col("last_bal")).otherwise(
                    F.col("c_acctbal")
                ),
                2,
            ).alias("acctbal"),
            F.coalesce("n_changes", F.lit(0)).alias("n_changes"),
            "last_seq",
        )
        .orderBy("custkey")
    )


@query(
    "ext_dedup_impact_report",
    """
    WITH corpus AS (
      SELECT 1 AS batch, doc_id, source, n_chars, md5(text) AS h
      FROM documents
      UNION ALL
      SELECT 2 AS batch, doc_id, source, n_chars, md5(text) AS h
      FROM documents WHERE doc_id % 4 = 0
    ),
    keep AS (
      SELECT h, min(batch * 1000000 + doc_id) AS keep_rank FROM corpus GROUP BY h
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS rows_total,
           CAST(sum(CASE WHEN batch * 1000000 + doc_id = keep_rank
                         THEN 0 ELSE 1 END) AS BIGINT) AS rows_removed,
           CAST(sum(CASE WHEN batch * 1000000 + doc_id = keep_rank
                         THEN 0 ELSE n_chars END) AS BIGINT) AS chars_removed,
           round(CAST(sum(CASE WHEN batch * 1000000 + doc_id = keep_rank
                              THEN 0 ELSE 1 END) AS DOUBLE) / count(*), 6)
             AS removal_pct
    FROM corpus JOIN keep USING (h)
    GROUP BY source ORDER BY source
    """,
)
def ext_dedup_impact_report(spark, sf_dir):
    """Per-source ledger of what exact dedup removes when a re-crawl
    batch (the same 25% salt ext_exact_dedup uses) is unioned onto the
    corpus: rows and characters dropped, and the removal rate — the
    report that justifies (or kills) a dedup pass before it rewrites
    100 TB. Keep policy mirrors ext_exact_dedup: first copy by (batch,
    doc_id) wins, encoded as one integer rank so both engines compare
    identically.

    Scale: one hash-aggregate on the uniform content hash (map-side
    partials collapse duplicates before the shuffle) produces the
    keeper table; it re-joins the corpus co-partitioned on that same
    hash key (no second shuffle of the corpus side beyond the key
    exchange), then a |sources|-group aggregate. No windows; nothing
    quadratic."""
    d = t(spark, sf_dir, "documents")
    base = d.select(
        F.lit(1).alias("batch"), "doc_id", "source", "n_chars",
        F.md5("text").alias("h"),
    )
    salt = d.filter(F.col("doc_id") % 4 == 0).select(
        F.lit(2).alias("batch"), "doc_id", "source", "n_chars",
        F.md5("text").alias("h"),
    )
    corpus = base.unionByName(salt).withColumn(
        "rank", F.col("batch") * 1000000 + F.col("doc_id")
    )
    keep = corpus.groupBy("h").agg(F.min("rank").alias("keep_rank"))
    removed = F.when(F.col("rank") == F.col("keep_rank"), 0).otherwise(1)
    return (
        corpus.join(keep, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("rows_total"),
            F.sum(removed).cast("bigint").alias("rows_removed"),
            F.sum(
                F.when(F.col("rank") == F.col("keep_rank"), 0).otherwise(
                    F.col("n_chars")
                )
            )
            .cast("bigint")
            .alias("chars_removed"),
            F.round(
                F.sum(removed).cast("double") / F.count(F.lit(1)), 6
            ).alias("removal_pct"),
        )
        .orderBy("source")
    )


_KC_K = 8


def _kcenter_oracle_sql() -> str:
    """The greedy k-center selection UNROLLED: k is a domain constant, so
    the 'iterative' algorithm is just {_KC_K} chained CTE blocks — pick =
    ORDER BY mind DESC, vec_id LIMIT 1; narrow = least(mind, dist2-to-
    pick). Float parity with the Spark loop is pinned by matching the
    operation order exactly: nrm2 and dot are the same sequential folds
    (list_dot_product), and dist2 associates as ((nrm2 - 2*dot) + c2).
    The Spark side collects each pick to the driver anyway (k-bounded),
    so the oracle's scalar-subquery picks state the identical function."""
    dist2 = (
        "greatest((b.nrm2 - 2 * list_dot_product(b.v, c.v))"
        " + list_dot_product(c.v, c.v), 0.0)"
    )
    ctes = [
        "base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,"
        " list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS nrm2"
        " FROM embeddings)",
        "c1 AS (SELECT vec_id, v FROM base ORDER BY nrm2 DESC, vec_id LIMIT 1)",
        f"d1 AS (SELECT b.vec_id, b.v, b.nrm2, {dist2} AS mind"
        " FROM base b CROSS JOIN c1 c)",
    ]
    for i in range(2, _KC_K + 1):
        ctes.append(
            f"c{i} AS (SELECT vec_id, v FROM d{i - 1} ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        ctes.append(
            f"d{i} AS (SELECT b.vec_id, b.v, b.nrm2, least(b.mind, {dist2}) AS mind"
            f" FROM d{i - 1} b CROSS JOIN c{i} c)"
        )
    rows = " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS \"round\","
        f" CAST((SELECT vec_id FROM c{i}) AS BIGINT) AS vec_id,"
        f" round(sqrt((SELECT max(mind) FROM d{i})), 6) AS covering_radius"
        for i in range(1, _KC_K + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + rows


@query("ext_coreset_kcenter", _kcenter_oracle_sql())
def ext_coreset_kcenter(spark, sf_dir):
    """Greedy k-center (Gonzalez 1985) coreset selection over the
    embedding table: seed with the max-norm vector, then {_KC_K}-1
    times pick the point farthest (euclidean) from its nearest chosen
    center, tie-broken by vec_id. Emits one row per pick: selection
    round, vec_id, and the covering radius AFTER the pick (max over
    corpus of distance-to-nearest-center) — the summary-quality curve
    of representing the corpus with k exemplars.

    Oracle-gated since r10: k is a domain constant, so the k-round
    'iteration' unrolls into a chained-CTE SQL statement with the
    identical float-operation order (see _kcenter_oracle_sql); exact
    greedy equivalence against a numpy reference is additionally
    asserted in tests/test_lifecycle.py.

    Scale: each round is ONE corpus scan — a running min-distance
    column narrows against the newest center (a broadcast literal),
    and the next pick is a TakeOrdered(1), never a global sort or
    single-partition window. Driver state is k rows total (the k
    chosen vectors), bounded like ext_kmeans_centroids' seeding. At
    100 TB with large k the same loop runs on a pre-sampled
    k-means|| -style oversample; the per-round plan is unchanged."""
    e = t(spark, sf_dir, "embeddings")
    base = managed_cache(
        e.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        ).withColumn(
            "nrm2",
            F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x),
        ),
        "ext_coreset_kcenter/base",
    )

    def dist2_to(vec: list[float]):
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2, summed in array order
        dot = F.aggregate(
            F.zip_with(
                "v", F.array(*[F.lit(float(c)) for c in vec]),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        c2 = float(sum(c * c for c in vec))
        return F.greatest(F.col("nrm2") - 2 * dot + F.lit(c2), F.lit(0.0))

    first = base.orderBy(F.desc("nrm2"), "vec_id").limit(1).collect()[0]
    picks = [(1, int(first.vec_id), list(first.v))]
    cur = base.withColumn("mind", dist2_to(picks[0][2]))
    out = []
    for rnd in range(2, _KC_K + 1):
        far = cur.orderBy(F.desc("mind"), "vec_id").limit(1).collect()[0]
        out.append((rnd - 1, picks[-1][1], float(far.mind) ** 0.5))
        picks.append((rnd, int(far.vec_id), list(far.v)))
        cur = cur.withColumn(
            "mind", F.least(F.col("mind"), dist2_to(picks[-1][2]))
        )
    radius = cur.agg(F.max("mind")).collect()[0][0]
    out.append((_KC_K, picks[-1][1], float(radius) ** 0.5))
    return spark.createDataFrame(
        [(r, v, round(rad, 6)) for r, v, rad in out],
        "round int, vec_id bigint, covering_radius double",
    )
