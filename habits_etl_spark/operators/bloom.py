"""DataFrame-native Bloom filter for explicit pre-shuffle join pruning.

Spark's own runtime row-level filter (``spark.sql.optimizer.runtime.
bloomFilter.enabled``) injects the same structure automatically for
joins its heuristics accept (creation-side size thresholds, join-type
allowlist), but many real pipelines fall outside them and its sketch is
invisible to the plan reader. This operator expresses the filter as
ordinary DataFrame algebra so ANY join can prune its big side BEFORE the
shuffle, with the pruning rate inspectable like any other filter:

  build:  keys -> k positions each (``xxhash64(key, seed)`` per seed)
          -> positions packed into 64-bit words -> ``bit_or`` per word
          -> ONE row holding ``map<word_index, word_bits>``
  probe:  broadcast that row; keep rows whose k positions are all set
          (``coalesce(try_element_at(map, word), 0) & shiftleft(1, bit)``)

Every stage is built-in-expression work inside whole-stage codegen — no
UDF, no driver round-trip beyond the one-row broadcast.

No false negatives: an inserted key sets exactly the bits its probe
reads, so a bloom-pruned equi join stays EXACT once the join applies its
real predicate. False positives only cost residual join input, bounded
by the standard (1 - e^(-k*n/m))^k — size ``num_bits`` ~ 10-16 bits per
expected distinct key and the waste is <1%.

Scale shape (100 TB): the build aggregates |keys| * k rows down to at
most ``num_bits/64`` words — a bounded-size shuffle no matter how large
the key side — and the probe is a map-side filter on the fact scan, so
the expensive join shuffles only surviving rows. This is the manual
form of the semi-join reduction every distributed engine reaches for
when the dimension filter is selective but too big to broadcast whole.

The network win is MEASURED, not argued: the bench's ``bloom_ab``
section (BENCH_DETAIL sidecar) records execution-level shuffle bytes +
records for the same pinned merge join with and without the prune
(habits_etl_spark/metrics.py reads them from the SQL status store).
Single-host wall time still favors the unpruned plan — a local shuffle
is an in-memory copy — but the recorded bytes delta is what a
1000-executor shuffle pays the network for; see also the constraint-
propagation nuance documented on plans/sketchjoin.py bloom_ab_plain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_COL = "__bloom"


def _seeds(num_hashes: int) -> range:
    return range(1, num_hashes + 1)


def bloom_build(
    keys: DataFrame, key: str, num_bits: int = 1 << 16, num_hashes: int = 5
) -> DataFrame:
    """One-row DataFrame holding the filter as ``map<int,bigint>``
    (64-bit word index -> word bits) over the distinct non-null values
    of ``keys[key]``. NULL keys are skipped (a NULL equi-join key can
    never match, so pruning it is sound)."""
    seed = F.explode(
        F.array(*[F.lit(s) for s in _seeds(num_hashes)])
    ).alias("__seed")
    pos = F.pmod(F.xxhash64(F.col(key), F.col("__seed")), F.lit(num_bits))
    words = (
        keys.select(key)
        .where(F.col(key).isNotNull())
        .select(F.col(key), seed)
        .select(pos.alias("__pos"))
        .select(
            F.expr("cast((__pos div 64) as int)").alias("__word"),
            F.expr("shiftleft(1L, cast(pmod(__pos, 64) as int))").alias("__mask"),
        )
        .groupBy("__word")
        .agg(F.expr("bit_or(__mask)").alias("__bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("__word", "__bits"))).alias(
            BLOOM_COL
        )
    )


def bloom_might_contain_sql(
    key: str, num_bits: int = 1 << 16, num_hashes: int = 5
) -> str:
    """SQL predicate string testing ``key`` against the broadcast
    ``__bloom`` map column — all k bits set. Kept as one expression so
    the whole probe stays inside codegen."""
    terms = []
    for s in _seeds(num_hashes):
        p = f"pmod(xxhash64({key}, {s}), {num_bits})"
        terms.append(
            f"(coalesce(try_element_at({BLOOM_COL}, cast(({p} div 64) as int)), 0L)"
            f" & shiftleft(1L, cast(pmod({p}, 64) as int))) != 0"
        )
    return " AND ".join(terms)


def bloom_prune(
    df: DataFrame,
    key: str,
    bloom: DataFrame,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Filter ``df`` to rows whose ``key`` might be in the filter built
    by :func:`bloom_build` with the SAME ``num_bits``/``num_hashes``.
    Rows with NULL keys are dropped (sound for equi-join pruning)."""
    pred = bloom_might_contain_sql(key, num_bits, num_hashes)
    return (
        df.where(F.col(key).isNotNull())
        .crossJoin(F.broadcast(bloom))
        .where(F.expr(pred))
        .drop(BLOOM_COL)
    )
