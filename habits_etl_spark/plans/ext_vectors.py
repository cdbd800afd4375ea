"""Embedding similarity operators over ``embeddings(vec_id, embedding
float[64], label)`` (SURVEY §2.12 ext_topk_sim_search; BASELINE
north-star 'similarity search').

The kernels are pure SQL expressions — ``zip_with`` + ``aggregate`` fold
for the dot product — so they run JVM-side in codegen, no Python. Math is
done in float64 after casting the float32 arrays up, and scores are
rounded to 4 decimals before any ordering so the Spark and DuckDB top-k
cuts agree.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from habits_etl_spark.plans.common import managed_cache, query, t

_TOP_K = 5
_N_QUERIES = 10  # vec_id < 10 are the query vectors
_COS_THRESHOLD = 0.4
_DIM = 64

# Above this corpus size ext_embedding_cosine_pairs REFUSES (raises) —
# its registered oracle asserts the exact all-pairs result, so semantics
# must not silently change with input size (ADVICE r2). The scale path is
# the separately registered ext_cosine_pairs_lsh.
_EXACT_PAIRS_MAX = 100_000


def _plane_signs(key_prefix: str) -> list[float]:
    """Deterministic pseudo-hyperplane: component i is +-1 from bit 0 of
    md5(f"{key_prefix}:{i}"). The planes are materialized as Python
    literals and inlined into BOTH engines (Spark F.lit arrays, DuckDB
    DOUBLE[] literals), so cross-engine parity holds by construction —
    the hash only has to be a good bit source, never re-evaluated at
    runtime.

    md5, NOT crc32 (r12): CRC is GF(2)-LINEAR, so for equal-length keys
    crc(k1) XOR crc(k2) depends only on k1 XOR k2 — within a digit-length
    class of plane indices, every pair of crc32-parity planes was equal
    or complementary (up to the two i-digit-length blocks), collapsing
    the 128-plane pair family to ~6 effective projections and the 8-bit
    band space to 4 observed values per band (64 distinct buckets for
    500 vectors, measured). The SRP s-curve this file's recall math
    assumes was never in effect; every banding parameter change was a
    no-op. md5 is non-linear, so plane bits are independent; the
    non-degeneracy is pinned in tests/test_vectors.py
    (test_planes_are_pairwise_independent)."""
    import hashlib

    return [
        1.0
        if hashlib.md5(f"{key_prefix}:{i}".encode()).digest()[0] & 1
        else -1.0
        for i in range(_DIM)
    ]


def _plane_sql_lit(signs: list[float]) -> str:
    """The plane as a DuckDB DOUBLE[] literal."""
    return "[" + ", ".join("1.0" if s > 0 else "-1.0" for s in signs) + "]"


def _srp_proj(vcol: Column, plane: int, seed: str) -> Column:
    """Signed projection of ``vcol`` (double array) onto the
    deterministic pseudo-hyperplane ``plane`` (see _plane_signs)."""
    signs = _plane_signs(f"{seed}:{plane}")
    return F.aggregate(
        F.zip_with(
            vcol,
            F.array(*[F.lit(h) for h in signs]),
            lambda x, h: x * h,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def srp_band_values(vcol: Column, n_bands: int, band_bits: int, seed: str = "srp") -> list[Column]:
    """One integer band key per band: ``band_bits`` sign bits packed.
    Two vectors collide in band b iff all of that band's projection signs
    agree — P(bit agree) = 1 - theta/pi, so a band collides with
    p = (1 - theta/pi)^band_bits and overall recall after ``n_bands``
    bands is 1 - (1-p)^n_bands (the classic SRP-LSH s-curve)."""
    values = []
    for b in range(n_bands):
        bits = []
        for j in range(band_bits):
            proj = _srp_proj(vcol, b * band_bits + j, seed)
            bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**j))
        values.append(sum(bits[1:], bits[0]))
    return values


def _proj_array_expr(vcol_name: str, keys: list[str]) -> Column:
    """ALL plane projections as ONE array<double> expression: a literal
    |keys| x {_DIM} matrix folded against the vector in a single
    transform. One parsed expression instead of |keys| independent
    aggregate trees — the 128-fold form cost ~4.5 s of plan/compile time
    per evaluation at sf0.1 and defeated codegen. Per-plane fold order is
    unchanged (zip_with then left fold), so projections are bit-identical
    to _srp_proj's."""
    rows = ", ".join(
        "array(" + ", ".join(f"{h}D" for h in _plane_signs(k)) + ")" for k in keys
    )
    return F.expr(
        f"transform(array({rows}), h -> "
        f"aggregate(zip_with({vcol_name}, h, (x, hh) -> x * hh), 0D, (a, x) -> a + x))"
    )


def _band_vals_from_proj(pj_col: str, n_bands: int, band_bits: int) -> list[Column]:
    """Packed band keys from a projection-array column (1-indexed
    element_at): bit j of band b is the sign of projection b*bits+j."""
    vals = []
    for b in range(n_bands):
        terms = " + ".join(
            f"IF(element_at({pj_col}, {b * band_bits + j + 1}) >= 0D, {1 << j}, 0)"
            for j in range(band_bits)
        )
        vals.append(F.expr(terms))
    return vals


def srp_band_sql(vexpr: str, n_bands: int, band_bits: int, seed: str = "srp") -> list[str]:
    """DuckDB twins of srp_band_values — one SQL expression per band over
    the DOUBLE[] expression ``vexpr``, built from the SAME literal planes,
    so an LSH pipeline's oracle states the identical bucketing."""
    exprs = []
    for b in range(n_bands):
        bits = []
        for j in range(band_bits):
            lit = _plane_sql_lit(_plane_signs(f"{seed}:{b * band_bits + j}"))
            bits.append(
                f"(CASE WHEN list_dot_product({vexpr}, {lit}) >= 0"
                f" THEN {1 << j} ELSE 0 END)"
            )
        exprs.append(" + ".join(bits))
    return exprs


def dot_expr(a: Column, b: Column) -> Column:
    """Sum_i a[i]*b[i] in float64 (left-to-right fold)."""
    prod = F.zip_with(
        F.transform(a, lambda x: x.cast("double")),
        F.transform(b, lambda x: x.cast("double")),
        lambda x, y: x * y,
    )
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


_SQL_COS = (
    "list_dot_product(a.v, b.v)"
    " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)


@query(
    "ext_topk_sim_search",
    f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label AS neighbor_label,
             round({_SQL_COS}, 4) AS cos
      FROM e a JOIN e b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {_N_QUERIES}
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, neighbor_label, cos, rk FROM ranked WHERE rk <= {_TOP_K}
    """,
)
def ext_topk_sim_search(spark, sf_dir):
    """Brute-force cosine top-k (the exact baseline; SURVEY §2.12): the
    {_N_QUERIES} query vectors are broadcast against the corpus, scored
    JVM-side, and cut with a per-query row_number.

    Scale: the broadcast-queries × corpus-scan shape is the right 100 TB
    baseline (queries are small; the corpus never shuffles — only
    (query × corpus) partial top-k results do, via WindowGroupLimit /
    TakeOrdered). The sub-linear path is ext_ann_lsh_bucketed below."""
    e = t(spark, sf_dir, "embeddings")
    # Normalize ONCE per vector (cast to float64 + L2 norm) — computing the
    # norm inside the pair expression would redo it per candidate pair,
    # turning an O(N + Q·N) kernel into O(3·Q·N) folds.
    prepped = e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", F.sqrt(F.aggregate(
        F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )))
    q = prepped.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_nrm"),
    )
    corpus = prepped.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("v").alias("c_v"),
        F.col("nrm").alias("c_nrm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_v"), F.col("c_v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # crossJoin + post-filter, not join(cond=neighbor!=query): the same
    # query×corpus work, but the plan reads as the intended broadcast
    # product instead of a BroadcastNestedLoopJoin a reviewer must stop
    # and justify (the != is selectivity ~1, not a join key).
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            F.round(dot / (F.col("q_nrm") * F.col("c_nrm")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _TOP_K)
    )


def _prepped_embeddings(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", F.sqrt(F.aggregate(
        F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )))


def _cosine_pairs_from(pair_source, threshold=_COS_THRESHOLD):
    """Score (vec_a < vec_b) candidate pairs carrying (v_a, n_a, v_b, n_b)
    columns; keep cos >= threshold.

    Kernel choice, A/B-measured on a fixed 14.2M-candidate checkpoint at
    sf1 (r12): the aggregate/zip_with fold runs at ~0.5 us/pair — an
    unrolled 64-term element_at sum is 8x SLOWER (46 s vs 5-8 s; 128
    element_at calls with per-access null/bounds checks blow past the
    JIT's effective inlining budget), and an Arrow/numpy verify would
    pay ~1 KB/pair of transfer for arrays the JVM already holds. The
    HOF tax that matters in this file is the per-row LITERAL-MATRIX
    rebuild in the plane projection (_banded_rows), not this
    well-shaped fold. Verify stays join-shaped (no corpus broadcast)
    and JVM-side — the LSH scale path's kernel."""
    dot = F.aggregate(
        F.zip_with(F.col("v_a"), F.col("v_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("n_a") * F.col("n_b"))
    return (
        pair_source.filter(cos >= threshold)
        .select("vec_a", "vec_b", "label_a", "label_b", F.round(cos, 4).alias("cos"))
    )


# Memo of corpus broadcasts keyed by (applicationId, corpus sha256):
# without it every _exact_pairs_blocked call leaked one ~51 MB-max
# broadcast per invocation (ADVICE r12). Entries are never destroy()'d —
# a returned DataFrame is lazy and may still reference the handle when a
# later call arrives, so explicit destroy could invalidate a plan the
# caller holds; the memo bounds the leak to one broadcast per distinct
# corpus per session (in practice: one per sf_dir), matching the other
# shared relations in plans/common.py.
#
# Key discipline (r14, ADVICE r13): the old key was (id(spark), weak
# fingerprint). id() can be REUSED after a stopped session's object is
# GC'd (run_scaling stops sessions in-process), resurrecting a broadcast
# tied to a dead SparkContext; and the weak fingerprint (len + first 512
# ids + norm sum) excluded labels and vector bytes, so a norm-preserving
# transform of a same-id corpus — exactly what the scaled fixture's
# Rademacher sign-flip applies — would silently reuse the WRONG
# broadcast. Now: applicationId (the repo-wide dead-handle convention,
# common.py) + sha256 over ids+labels+vectors, with dead-app entries
# evicted on access.
_PAIRS_BCAST_MEMO: dict = {}


def _exact_pairs_blocked(spark, prepped, threshold=_COS_THRESHOLD, n=None):
    """Exact all-pairs cosine >= threshold as a distributed BLOCK MATMUL:
    broadcast the (gate-bounded) corpus matrix once, then each partition
    computes its row-block's A @ V.T against it in numpy and emits only
    the pairs over threshold — the REPOSE-style block layout.

    Replaces the expression-join form (arm x arm equi-less join +
    zip_with/aggregate dot per pair): higher-order functions are
    interpreted, not codegen'd, so the old plan paid ~9 us per pair —
    18.8 s for 2M pair dots at sf0.1 vs ~1 s here (the same
    HOF-vs-Arrow lesson as _banded_rows, measured the same round).

    The _EXACT_PAIRS_MAX refusal gate lives HERE (r13, ADVICE r12) so
    every caller inherits it — the driver collect and the O(n^2) pair
    work are both refused past the gate (100k rows x 64 dims x 8 B =
    51 MB broadcast max; n^2 work pinches far earlier). The scale path
    is the separately registered ext_cosine_pairs_lsh.

    Float parity with the DuckDB oracle: numpy's pairwise-summed dot vs
    the oracle's sequential list_dot_product fold can differ ~1e-16
    relative; after round(cos, 4) a flip needs the true cosine within
    ~1e-12 of a 5e-5 rounding boundary (the documented knife-edge
    residual class; hash-green at all three SFs empirically)."""
    import numpy as np
    import pandas as pd

    ltype = prepped.schema["label"].dataType.simpleString()
    out_schema = (
        f"vec_a long, vec_b long, label_a {ltype}, label_b {ltype}, cos double"
    )
    # Gate BEFORE the collect, or the OOM beats the raise. Callers that
    # already know the corpus row count (a cheap parquet-metadata count of
    # the underlying table) pass it as `n` so the gate costs no extra
    # Spark job (r14, ADVICE r13 — the corpus was counted twice per
    # query: once by the caller's metadata count, once by a full job over
    # the prepped plan here).
    if n is None:
        n = prepped.count()
    if n > _EXACT_PAIRS_MAX:
        raise ValueError(
            f"_exact_pairs_blocked is exact all-pairs (O(n^2)) and refuses "
            f"{n} rows > _EXACT_PAIRS_MAX={_EXACT_PAIRS_MAX}; use "
            "ext_cosine_pairs_lsh (banded SRP-LSH + exact verify) at scale"
        )
    if n == 0:
        return spark.createDataFrame([], out_schema)
    rows = prepped.select("vec_id", "label", "v").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    labels = np.array([r.label for r in rows])
    V = np.vstack([r.v for r in rows])
    nrm = np.sqrt((V * V).sum(axis=1))
    import hashlib

    app_id = spark.sparkContext.applicationId
    digest = hashlib.sha256()
    digest.update(ids.tobytes())
    digest.update("\x1f".join(str(x) for x in labels.tolist()).encode())
    digest.update(V.tobytes())
    memo_key = (app_id, digest.hexdigest())
    # evict broadcasts tied to stopped sessions (their applicationId can
    # never match again; holding them pins dead-JVM handles)
    for k in [k for k in _PAIRS_BCAST_MEMO if k[0] != app_id]:
        del _PAIRS_BCAST_MEMO[k]
    bcast = _PAIRS_BCAST_MEMO.get(memo_key)
    if bcast is None:
        bcast = spark.sparkContext.broadcast((ids, labels, V, nrm))
        _PAIRS_BCAST_MEMO[memo_key] = bcast

    def gen(batches):
        bids, blabels, BV, bnrm = bcast.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.vstack(pdf["v"].to_numpy())
            an = np.sqrt((A * A).sum(axis=1))
            C = (A @ BV.T) / np.outer(an, bnrm)
            aids = pdf["vec_id"].to_numpy()
            mask = (C >= threshold) & (aids[:, None] < bids[None, :])
            ai, bj = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "vec_a": aids[ai],
                    "vec_b": bids[bj],
                    "label_a": pdf["label"].to_numpy()[ai],
                    "label_b": blabels[bj],
                    "cos": np.round(C[ai, bj], 4),
                }
            )

    # Fan the probe side out before the Arrow stage: the fixture's
    # single-row-group parquet arrives as ONE split, and mapInPandas
    # inherits it — the r13 scaling gate caught the whole 20k x 20k
    # block matmul serialized on one core at sf1 (105 s cold / 27 s warm
    # vs ~2 s wide; the same under-split trap _near_dedup_pipeline
    # guards with inputFiles()). The shuffle moved is the gate-bounded
    # probe projection (<= 51 MB), noise next to the O(n^2) work it
    # parallelizes; at real scale input splits already provide width and
    # the guard skips the shuffle entirely.
    probe = prepped.select("vec_id", "label", "v")
    n_part = spark.sparkContext.defaultParallelism
    if len(prepped.inputFiles()) < n_part:
        probe = probe.repartition(n_part)
    return probe.mapInPandas(gen, out_schema)


def _pair_arms(prepped):
    a = prepped.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("label_a"),
        F.col("v").alias("v_a"), F.col("nrm").alias("n_a"),
    )
    b = prepped.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"),
        F.col("v").alias("v_b"), F.col("nrm").alias("n_b"),
    )
    return a, b


_PAIR_BANDS = 16
_PAIR_BAND_BITS = 8
# broadcast the verified-candidate pair list only under this measured
# count — collision-quadratic bucket skew must not blow the driver
_PAIR_BROADCAST_MAX = 2_000_000


def _banded_rows(prepped, seed: str, n_bands: int, band_bits: int):
    """Skinny (vec_id, band_idx, band_val) rows: Arrow-batched numpy
    matmul for the plane projections, behind a cache barrier
    (managed_cache) so no join can inline the projection.

    Two measured lessons at sf1 (20k vectors, 192 planes) are baked in:

    1. The higher-order-function expression path
       (transform/zip_with/aggregate over a literal plane matrix —
       _proj_array_expr) costs ~1.4 ms/vector: HOFs are interpreted,
       never codegen'd, and the 192x64 literal matrix is rebuilt per
       row. One V @ M numpy matmul over an Arrow batch does the same
       245 MFLOPs in milliseconds — the classic vectorized-UDF-beats-
       per-row case, ~100x here (28 s -> <1 s for the signature job).
       At 10^9 vectors the expression path is CPU-days; the batch path
       is minutes. (_proj_array_expr stays as the pure-expression
       reference implementation; cross-path equality is pinned in
       tests/test_vectors.py::test_numpy_and_expression_bands_agree.)
    2. Without a materialization barrier, Catalyst inlines the
       projection into every consumer — the band self-join evaluated it
       once per exploded row per join SIDE. Checkpointing the per-vector
       signature rows (|v| x n_bands ints — a few MB at any realistic
       shard size) runs the projection exactly once per vector; both
       join sides rescan integers. Same lesson as the r11 shared
       MinHash pair relation.

    Cross-engine parity: numpy's pairwise summation can disagree with
    the oracle's sequential list_dot_product fold only when
    |projection| is within ~1e-13 of zero (a sign flip on a knife
    edge) — the ICWS argmin-tie residual class. The fixture margin is
    pinned in tests (min |proj| >> double noise); like the ICWS ties,
    the class is documented rather than provably empty."""
    import numpy as np
    import pandas as pd

    M = np.array(
        [_plane_signs(f"{seed}:{p}") for p in range(n_bands * band_bits)]
    ).T  # dim x planes
    weights = 1 << np.arange(band_bits)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf["v"].to_numpy())  # n x dim
            S = (V @ M) >= 0.0  # n x planes sign bits
            B = S.reshape(len(V), n_bands, band_bits) @ weights
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "bands": list(B.astype("int32"))}
            )

    # managed_cache, NOT localCheckpoint (r13, ADVICE r12): an eager
    # checkpoint ran a full job at PLAN-CONSTRUCTION time (registering a
    # query without executing it paid the projection), and localCheckpoint
    # is non-reliable — a lost executor makes the partitions unrecoverable
    # with no lineage fallback. A cached InMemoryRelation is the same plan
    # barrier (Catalyst cannot inline the projection past it, so both join
    # sides rescan integers), fills lazily on first action, and recomputes
    # from lineage on loss.
    # Same under-split guard as _exact_pairs_blocked (r13): the fixture
    # parquet is one split, and a one-partition Arrow stage serializes
    # the projection matmul on a single core.
    proj_in = prepped.select("vec_id", "v")
    n_part = prepped.sparkSession.sparkContext.defaultParallelism
    if len(prepped.inputFiles()) < n_part:
        proj_in = proj_in.repartition(n_part)
    sig = managed_cache(
        proj_in.mapInPandas(gen, "vec_id long, bands array<int>"),
        f"banded_sig:{seed}:{n_bands}:{band_bits}",
    )
    return sig.select(
        "vec_id", F.posexplode("bands").alias("band_idx", "band_val")
    )


def _lsh_candidate_pairs(prepped, n_bands=_PAIR_BANDS, band_bits=_PAIR_BAND_BITS):
    """Banded SRP-LSH candidate generation, mirroring the MinHash->verify
    text pipeline EXACTLY (same join topology): explode each vector to
    SKINNY (vec_id, band_idx, band_val) rows, self-equi-join on the band
    key, reduce to DISTINCT id pairs, then broadcast the collision-sized
    pair list back against the vector arrays. The r9 shape carried the
    full 64-double arrays on BOTH sides of the band join — ~10M collision
    rows x 1 KB at sf0.1 (clustered synthetic embeddings put 38% of the
    corpus in one bucket) before the dedup, ~70 s; skinny rows + one
    array lookup per verified side take it to ~3 s. The quadratic pair
    space is never materialized; signatures come from the single
    literal-matrix projection expression (_proj_array_expr).

    Band sizing is a function of CORPUS SIZE, not just the recall
    target: a band key has 2^band_bits values, so even zero-similarity
    vectors collide with p = 2^-band_bits per band and expected
    candidates are >= n_bands * n^2 / 2^band_bits regardless of the
    data — pigeonhole, the same law that degenerated the 48-bit ngram
    simhash blocking (r12). Fixed (n_bands, band_bits) is therefore
    inherently quadratic past n ~ 2^band_bits; hold candidates linear
    by growing band_bits ~ log2(n) (and n_bands with it to keep the
    s-curve), i.e. re-tune the index when the corpus grows 10x, exactly
    as a real vector index re-shards. The r12 sf1 sweep measured the
    default 8-bit banding at 20k vectors: 24.7x the sf0.1 time (noise
    collisions 16 * n^2 / 256); 12-bit banding at the same corpus cut
    candidates ~16x (see SCALING.md)."""
    banded = _banded_rows(prepped, "pairs", n_bands, band_bits)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    arr_a = prepped.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("label_a"),
        F.col("v").alias("v_a"), F.col("nrm").alias("n_a"),
    )
    arr_b = prepped.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"),
        F.col("v").alias("v_b"), F.col("nrm").alias("n_b"),
    )
    # The candidate pair list is collision-DRIVEN, not constant-bounded
    # (this very docstring cites 38% of the corpus in one bucket), so the
    # broadcast is gated on a MEASURED count, the connected_components
    # pattern: cache the skinny pair list (also saves re-deriving the
    # band join for both sides of the count/join), count it, and only
    # hint broadcast under the budget — above it the shuffle join stands
    # and AQE may still convert when runtime stats allow. managed_cache,
    # not localCheckpoint (r13): keeps lineage on executor loss; the
    # count() still materializes it here because the gate needs the
    # number before the plan is final.
    cand = managed_cache(cand, f"lsh_cand:{n_bands}:{band_bits}")
    hint = F.broadcast if cand.count() <= _PAIR_BROADCAST_MAX else (lambda df: df)
    return arr_a.join(hint(cand), "vec_a").join(arr_b, "vec_b")


# CTE body + final select for the exact pair set, shared with the
# embedding-cluster oracle in plans/ext_pipeline.py.
_EXACT_PAIRS_CTE = (
    "e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
)
_EXACT_PAIRS_FINAL = f"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           a.label AS label_a, b.label AS label_b,
           round({_SQL_COS}, 4) AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_SQL_COS} >= {_COS_THRESHOLD}"""


@query(
    "ext_embedding_cosine_pairs",
    f"""
    WITH {_EXACT_PAIRS_CTE}
    {_EXACT_PAIRS_FINAL}
    """,
)
def ext_embedding_cosine_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (BASELINE north-star
    'embedding-cosine near-dup'): all pairs above a cosine threshold.

    This query is EXACT at every size it agrees to run at: its oracle
    asserts the complete all-pairs result, so the semantics must not
    depend on input scale. Above ``_EXACT_PAIRS_MAX`` corpus rows (a
    bounded parquet-metadata count) the quadratic join is REFUSED with an
    explicit error instead of silently degrading to lossy LSH candidates
    — the scale path is a *different, honestly-approximate* query,
    registered separately as ``ext_cosine_pairs_lsh`` (rows-only check;
    recall follows the s-curve in ``srp_band_values``: near-complete at
    the cosine levels real near-dup dedup uses (>=0.8), lossy at this
    fixture's 0.4 threshold)."""
    prepped = _prepped_embeddings(spark, sf_dir)
    n = t(spark, sf_dir, "embeddings").count()  # parquet metadata count
    if n > _EXACT_PAIRS_MAX:
        raise ValueError(
            f"ext_embedding_cosine_pairs is exact all-pairs (O(n^2)) and "
            f"refuses {n} rows > _EXACT_PAIRS_MAX={_EXACT_PAIRS_MAX}; use "
            "ext_cosine_pairs_lsh (banded SRP-LSH + exact verify) at scale"
        )
    return _exact_pairs_blocked(spark, prepped, n=n)


def _pairs_lsh_oracle_sql() -> str:
    """Full DuckDB statement of the SRP-LSH pair pipeline: the literal
    planes make bucketing pure SQL, so the approximate op is now
    oracle-gated END TO END (bands -> candidate join -> exact verify),
    not just recall-tested. Float parity: list_dot_product is the same
    sequential fold as the Spark aggregate (the exact-pairs oracle has
    relied on this bit-equality since r2)."""
    band_exprs = srp_band_sql("v", _PAIR_BANDS, _PAIR_BAND_BITS, seed="pairs")
    banded = "\n      UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx, {e} AS band_val FROM n"
        for b, e in enumerate(band_exprs)
    )
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS MATERIALIZED (
      SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ),
    banded AS MATERIALIZED (
      {banded}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT c.vec_a, c.vec_b, na.label AS label_a, nb.label AS label_b,
             list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) AS cos_raw
      FROM cand c
      JOIN n na ON na.vec_id = c.vec_a
      JOIN n nb ON nb.vec_id = c.vec_b
    )
    SELECT vec_a, vec_b, label_a, label_b, round(cos_raw, 4) AS cos
    FROM scored WHERE cos_raw >= {_COS_THRESHOLD}
    """


@query("ext_cosine_pairs_lsh", _pairs_lsh_oracle_sql())
def ext_cosine_pairs_lsh(spark, sf_dir):
    """The 100 TB path of ``ext_embedding_cosine_pairs``, runnable at any
    scale: banded SRP-LSH candidates ({_PAIR_BANDS} bands x
    {_PAIR_BAND_BITS} bits) + exact cosine verify. Every emitted pair is a
    TRUE pair with an exactly-computed cosine (precision 1.0 — verified
    subset of the exact result); recall is the LSH s-curve, asserted
    against the exact pairs in tests/test_vectors.py. Approximate vs the
    exact op, but fully DETERMINISTIC given the data: the planes are
    pinned literals, so the whole pipeline is oracle-gated in SQL (r10 —
    previously rows-only)."""
    return _cosine_pairs_from(_lsh_candidate_pairs(_prepped_embeddings(spark, sf_dir)))


def scale_tuned_cosine_pairs(
    spark,
    sf_dir,
    threshold=_COS_THRESHOLD,
    n_bands=_PAIR_BANDS,
    band_bits=_PAIR_BAND_BITS,
):
    """``ext_cosine_pairs_lsh`` with the index parameters exposed — the
    re-tune-on-growth API the banding law in ``_lsh_candidate_pairs``
    demands. Same planes (literal, deterministic), same verify (every
    emitted pair exact), so precision 1.0 holds at ANY parameterization;
    only the candidate budget and the recall s-curve move. The registered
    query pins the fixture-tuned defaults; a 10x-larger corpus calls this
    with band_bits ~ log2(n) (e.g. 12 bits at 20k vectors — the measured
    SCALING.md configuration) the way a real deployment rebuilds its
    index at re-shard time. Candidate-budget reduction and the precision
    invariant are pinned in tests/test_vectors.py."""
    return _cosine_pairs_from(
        _lsh_candidate_pairs(
            _prepped_embeddings(spark, sf_dir), n_bands=n_bands, band_bits=band_bits
        ),
        threshold=threshold,
    )


_IVF_N_CELLS = 16
_IVF_N_PROBE = 4
# engine-portable row hash for the centroid pick (md5-hex-prefix integer —
# the ext_stratified_sample pattern; Spark's crc32 has no DuckDB twin)
_IVF_H_DUCK = (
    "CAST(('0x' || substr(md5('centroid:' || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)"
)


def _ivf_probe_ctes(n_cells: int = _IVF_N_CELLS, n_probe: int = _IVF_N_PROBE) -> str:
    """The IVF pipeline as a CTE body (``e`` through ``scored``), shared
    by the probe oracle below and the lifecycle oracles in ext_vectors4
    (the _minhash_ctes / _MINHASH_FINAL pattern), parameterized by the
    index layout the way _minhash_ctes is by (b, r). Nothing in it is
    trained or sampled at runtime — centroids are a hash-of-id pick,
    assignment is an argmax over pinned cells — so the 'approximate' op
    (approximate only vs exact ANN) is a deterministic function of the
    data and oracle-gated end to end. Sims compare unrounded doubles:
    both engines produce the identical sequential-fold dot product (the
    exact-pairs oracle has pinned this parity since r2), and every rank
    tie-breaks on cell_id / neighbor_id."""
    sim = "list_dot_product({l}.v, {r}.c_v) / ({l}.nrm * {r}.c_nrm)"
    return f"""e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS MATERIALIZED (
      SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ),
    tot AS (SELECT count(*) AS total FROM e),
    candc AS (
      SELECT vec_id, v, nrm, {_IVF_H_DUCK} AS h
      FROM n CROSS JOIN tot
      WHERE {_IVF_H_DUCK} % greatest(total // {n_cells}, 1) < 2
    ),
    cent AS (
      SELECT cell_id, v AS c_v, nrm AS c_nrm FROM (
        SELECT *, row_number() OVER (ORDER BY h, vec_id) - 1 AS cell_id FROM candc
      ) WHERE cell_id < {n_cells}
    ),
    assign AS MATERIALIZED (
      SELECT vec_id, label, v, nrm, cell_id FROM (
        SELECT n.vec_id, n.label, n.v, n.nrm, c.cell_id,
               row_number() OVER (PARTITION BY n.vec_id
                                  ORDER BY {sim.format(l='n', r='c')} DESC, c.cell_id) AS rk
        FROM n CROSS JOIN cent c
      ) WHERE rk = 1
    ),
    qprobe AS (
      SELECT query_id, q_v, q_nrm, cell_id FROM (
        SELECT a.vec_id AS query_id, a.v AS q_v, a.nrm AS q_nrm, c.cell_id,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY (list_dot_product(a.v, c.c_v) / (a.nrm * c.c_nrm)) DESC,
                                           c.cell_id) AS rk
        FROM assign a CROSS JOIN cent c WHERE a.vec_id < {_N_QUERIES}
      ) WHERE rk <= {n_probe}
    ),
    scored AS (
      SELECT q.query_id, a.vec_id AS neighbor_id,
             round(list_dot_product(q.q_v, a.v) / (q.q_nrm * a.nrm), 4) AS cos
      FROM assign a JOIN qprobe q ON a.cell_id = q.cell_id AND a.vec_id <> q.query_id
    )"""


def _ivf_probe_oracle_sql(n_cells: int = _IVF_N_CELLS, n_probe: int = _IVF_N_PROBE) -> str:
    return f"""
    WITH {_ivf_probe_ctes(n_cells, n_probe)}
    SELECT query_id, neighbor_id, cos, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored
    ) WHERE rk <= {_TOP_K}
    """


def _ivf_pick_assign(spark, sf_dir, n_cells, total=None):
    """Hash-pick ``n_cells`` coarse centroids and assign the corpus — the
    shared build step of the IVF family (probe here, partition-sim /
    recall-audit in ext_vectors4). Returns ``(assigned, centroids)``
    where assigned carries (vec_id, label, v, nrm, cell_id, cell_cos) —
    cell_cos is the winning member-to-centroid cosine, the quantization-
    quality signal the lifecycle reports aggregate.

    Scale: ONE corpus scan against k broadcast centroid literals; the
    centroid pick sorts only the ~2k-row hash-oversampled set (bounded
    heap via TakeOrderedAndProject), and the k-bounded collect is the
    same driver materialization the broadcast needs anyway."""
    prepped = _prepped_embeddings(spark, sf_dir)
    if total is None:
        # bounded metadata read (one count of the corpus); multi-layout
        # callers (the partition sim) pass it in so three layouts don't
        # pay three identical count jobs
        total = prepped.count()
    step = max(total // n_cells, 1)
    # Hash-based centroid pick — no density/contiguity assumption on
    # vec_id: keep rows whose id-hash lands in ~2*n_cells/total of the
    # hash space (oversampled 2x against Poisson shortfall), then number
    # the first n_cells in hash order.
    hsh = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("centroid:"), F.col("vec_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    cand_c = prepped.withColumn("__h", hsh).filter(F.pmod(F.col("__h"), F.lit(step)) < 2)
    picked = cand_c.orderBy("__h", "vec_id").limit(n_cells).select("v", "nrm").collect()
    centroids = spark.createDataFrame(
        [(i, list(r.v), float(r.nrm)) for i, r in enumerate(picked)],
        "cell_id int, c_v array<double>, c_nrm double",
    )
    dot_vc = F.aggregate(
        F.zip_with(F.col("v"), F.col("c_v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim_to_centroid = dot_vc / (F.col("nrm") * F.col("c_nrm"))
    # r15 MEASURED AND REJECTED: replacing this crossJoin+window argmax
    # with a per-row fold over an array<struct> literal of the k cells
    # (zero exchanges — the "ideal" 100 TB shape) was 1.5-2.2x SLOWER at
    # both sf0.1 and sf1 (ext_ann_ivf_probe sf1 warm 3.9 -> 8.5 s,
    # ext_ivf_partition_sim 11.6 -> 15.4 s, alternating solo A/B):
    # Catalyst evaluates higher-order-function lambdas interpreted,
    # per element, while the crossJoin+window path is whole-stage
    # codegen'd end to end — the removed exchange of n rows never buys
    # back the interpreted k x d inner loop. Guide §1.1's gotcha clause,
    # verbatim. Do not re-try without a codegen'd argmax primitive.
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("__sim").desc(), F.col("cell_id"))
    assigned = (
        prepped.crossJoin(F.broadcast(centroids))
        .withColumn("__sim", sim_to_centroid)
        .withColumn("__rk", F.row_number().over(w_assign))
        .filter(F.col("__rk") == 1)
        .select(
            "vec_id", "label", "v", "nrm", "cell_id",
            F.col("__sim").alias("cell_cos"),
        )
    )
    return assigned, centroids


@query("ext_ann_ivf_probe", _ivf_probe_oracle_sql())
def ext_ann_ivf_probe(spark, sf_dir):
    """IVF-style ANN (SURVEY §2.12 'an IVF or LSH-bucketed variant'):

    1. pick deterministic coarse centroids (a hash-of-id sample of the
       corpus — works for any id distribution, a one-pass stand-in for a
       k-means fit, which at 100 TB would be a sampled offline job);
    2. assign every corpus vector to its nearest centroid (broadcast
       centroids x corpus scan — one pass);
    3. probe: each query searches only the ``n_probe`` closest centroids'
       inverted lists, then exact cosine re-rank inside them.

    Scale: the corpus scans once for assignment; query cost drops from
    O(N) to O(N * n_probe / n_cells). Approximate vs the exact top-k
    (cell misses possible; recall asserted in tests/test_scale_utils.py)
    but a deterministic function of the data — r10 moved the row hash
    from crc32 to the engine-portable md5-prefix integer, and the whole
    pipeline (pick -> assign -> probe -> re-rank) is now oracle-gated in
    SQL (previously rows-only)."""
    return ivf_probe(spark, sf_dir)


def ivf_probe(spark, sf_dir, n_cells=_IVF_N_CELLS, n_probe=_IVF_N_PROBE):
    """``ext_ann_ivf_probe`` with the index layout exposed — the
    re-tune-on-growth API, like ``scale_tuned_cosine_pairs`` for the SRP
    index. The registered query pins the deployed defaults; the retuned
    registration in ext_vectors4 runs the nlist the partition sim's
    decision table points to."""
    assigned, centroids = _ivf_pick_assign(spark, sf_dir, n_cells)
    assigned = assigned.drop("cell_cos")

    queries_assigned = (
        assigned.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("q_v"), F.col("nrm").alias("q_nrm"))
        .crossJoin(F.broadcast(centroids))
        .withColumn(
            "__sim",
            F.aggregate(
                F.zip_with(F.col("q_v"), F.col("c_v"), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ) / (F.col("q_nrm") * F.col("c_nrm")),
        )
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("cell_id"))
            ),
        )
        .filter(F.col("__rk") <= n_probe)
        .select("query_id", "q_v", "q_nrm", "cell_id")
    )

    dot_qc = F.aggregate(
        F.zip_with(F.col("q_v"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        assigned.join(F.broadcast(queries_assigned), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot_qc / (F.col("q_nrm") * F.col("nrm")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("bigint")).filter(
        F.col("rk") <= _TOP_K
    )


_ANN_BANDS = 32
_ANN_BAND_BITS = 8


def _ann_lsh_oracle_sql() -> str:
    """Full DuckDB statement of the banded-ANN pipeline (same literal-
    plane trick as _pairs_lsh_oracle_sql): per-band signature buckets,
    the query-vs-corpus band join, exact cosine re-rank, per-query
    top-k."""
    band_exprs = srp_band_sql("v", _ANN_BANDS, _ANN_BAND_BITS, seed="ann")
    banded = "\n      UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx, {e} AS band_val FROM e"
        for b, e in enumerate(band_exprs)
    )
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    banded AS MATERIALIZED (
      {banded}
    ),
    q AS (SELECT vec_id AS query_id, band_idx, band_val
          FROM banded WHERE vec_id < {_N_QUERIES}),
    cand AS (
      SELECT DISTINCT q.query_id, s.vec_id AS neighbor_id
      FROM banded s JOIN q
        ON s.band_idx = q.band_idx AND s.band_val = q.band_val
       AND s.vec_id <> q.query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             round(list_dot_product(eq.v, en.v)
                   / (sqrt(list_dot_product(eq.v, eq.v))
                      * sqrt(list_dot_product(en.v, en.v))), 4) AS cos
      FROM cand c
      JOIN e eq ON eq.vec_id = c.query_id
      JOIN e en ON en.vec_id = c.neighbor_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored
    )
    SELECT query_id, neighbor_id, cos, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_TOP_K}
    """


@query("ext_ann_lsh_bucketed", _ann_lsh_oracle_sql())
def ext_ann_lsh_bucketed(spark, sf_dir):
    """Sub-linear ANN path (SURVEY §2.12 'IVF or LSH-bucketed variant'):
    sign-random-projection LSH with {_ANN_BANDS} tables x
    {_ANN_BAND_BITS} bits (pinned literal ±1 planes — see _plane_signs);
    candidates = the union over bands of same-bucket corpus rows vs the
    query set, then exact cosine re-rank of the distinct candidates.

    MULTI-band, not one table (r12): a single b-bit SRP table recalls a
    cos-θ neighbor with p = (1 - θ/π)^b — at 12 bits and the fixture's
    cos ≈ 0.5 neighbors that is (2/3)^12 ≈ 0.8%, useless. The pre-r12
    shape only LOOKED like it recalled (~0.2+) because the crc32 planes
    were degenerate (see _plane_signs): the "12-bit" bucket held ~4 real
    bits, i.e. it brute-force-scanned ~30% of the corpus per query. With
    independent md5 planes, recall comes from OR-ing L=32 independent
    8-bit tables — 1-(1-p)^L ≈ 0.5-0.8 at the fixture's neighbor
    cosines — the classic (L, b) LSH trade the banding law in
    _lsh_candidate_pairs describes.

    Scale: the corpus scan emits {_ANN_BANDS} skinny (vec_id, band_idx,
    band_val) rows per vector once; only band-collision rows join the
    (broadcast, tiny) query side, and arrays are fetched only for the
    distinct candidates that survive. At 1000 executors the band join
    replaces the full cross product. Approximate vs the exact top-k
    (bucket misses are possible; recall asserted in
    tests/test_vectors.py) but fully DETERMINISTIC given the data, so
    since r10 the whole pipeline is oracle-gated in SQL via the literal
    planes (previously rows-only)."""
    e = t(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    banded = _banded_rows(base, "ann", _ANN_BANDS, _ANN_BAND_BITS)
    q = banded.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band_idx", "band_val"
    )
    cand = (
        banded.join(
            F.broadcast(q),
            ["band_idx", "band_val"],
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    arrs = e.select("vec_id", "embedding")
    scored = (
        cand.join(
            F.broadcast(
                arrs.filter(F.col("vec_id") < _N_QUERIES).select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("q_emb"),
                )
            ),
            "query_id",
        )
        .join(
            arrs.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("n_emb"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("q_emb"), F.col("n_emb")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("bigint")).filter(
        F.col("rk") <= _TOP_K
    )
