#!/usr/bin/env python
"""Synthesize a larger-SF fixture by deterministic replication of an
existing one — the r11 verdict's directive #4 (">sf0.1 datapoint"):
turn "the plan would scale" into a measured per-query scaling exponent
(tools/run_scaling.py writes SCALING.md from it).

Replication rules (factor k, replica index i in 0..k-1):

- Fact/dim keys shift by ``i * KEY_STRIDE`` so every replica is a
  disjoint key range (joins, rollups and distinct counts scale
  linearly, exactly as k independent tenants would).
- ``documents.text`` is alphabet-ROTATED per replica (Caesar shift by
  i on a-z/A-Z): a character bijection, so WITHIN-replica structure —
  word tokens, tf vectors, char n-gram sets, Jaccard values, document
  lengths — is isomorphic to the source fixture, while CROSS-replica
  text shares (almost) nothing at either word or character
  granularity. (A first attempt suffixed tokens with ``~i``; that
  decorrelates WORD-level dedup but char n-gram windows inside a word
  stay identical across replicas, which manufactured ~13M real
  cross-replica near-dup pairs at sf1 and masqueraded as a quadratic
  operator. Replication must not create cross-replica similarity at
  ANY granularity an operator measures.)
- ``embeddings.embedding`` is multiplied element-wise by a per-replica
  Rademacher (±1) sign pattern derived from md5(replica, dim). A fixed
  diagonal ±1 transform is an isometry, and because (s·x)(s·y) = x·y
  EXACTLY in IEEE arithmetic for s = ±1, within-replica dot products,
  norms and cosines are bit-identical to the source fixture. Across
  replicas the product pattern s⁽ⁱ⁾s⁽ʲ⁾ is itself Rademacher, so
  cross-replica cosines collapse to O(1/√dim) noise. (A first attempt
  circularly SHIFTED vectors by i dims; synthetic embeddings are
  smooth, their autocorrelation at small lags is high, and the sf1
  sweep measured a 106× output blowup in ext_cosine_pairs_lsh —
  43,549 pairs vs the 4,090 clean replication predicts — turning a
  linear operator into a fake quadratic one. Same lesson as the text
  rule: replication must not create cross-replica similarity at any
  granularity an operator measures, and "shifted" is not "unrelated"
  for autocorrelated signals.)
- ``region``/``nation`` stay fixed (real dimensions don't scale).

Usage:
    python tools/make_scaled_fixture.py [--src /root/testdata/sf0.1] \
        [--factor 10] [--out /root/repo/.scratch/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_STRIDE = 1_000_000_000  # far above any source key

SHIFTED_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def build(src: str, factor: int, out: str, spark=None) -> None:
    """Deterministic replication (importable for the `pytest -m scaling`
    gate, r13): same rules as the CLI — given the same (src, factor) the
    output tables are row-for-row identical, so the committed exponent
    pins always measure against the same fixture."""
    from pyspark.sql import functions as F

    from habits_etl_spark.session import get_spark

    class _Args:
        pass

    args = _Args()
    args.src, args.factor, args.out = src, factor, out
    if spark is None:
        spark = get_spark("make_scaled_fixture")
    os.makedirs(args.out, exist_ok=True)

    for t in FIXED:
        spark.read.parquet(f"{args.src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/{t}.parquet")
        print(f"{t}: copied")

    for t, keys in SHIFTED_KEYS.items():
        src = spark.read.parquet(f"{args.src}/{t}.parquet")
        rep = src.withColumn(
            "__i", F.explode(F.sequence(F.lit(0), F.lit(args.factor - 1)))
        )
        shift = F.col("__i").cast("long") * F.lit(KEY_STRIDE).cast("long")
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + shift)
        if t == "documents":
            # alphabet rotation by replica index: a character bijection
            lower = "abcdefghijklmnopqrstuvwxyz"
            upper = lower.upper()
            text = F.col("text")
            rotated = text
            for i in range(1, args.factor):
                rot = lower[i:] + lower[:i] + upper[i:] + upper[:i]
                rotated = F.when(
                    F.col("__i") == i, F.translate(text, lower + upper, rot)
                ).otherwise(rotated)
            rep = rep.withColumn("text", rotated).withColumn(
                "n_chars", F.length("text").cast("long")
            )
        if t == "embeddings":
            # per-replica Rademacher sign flip: a ±1 diagonal isometry is
            # EXACT for within-replica dot products ((s·x)(s·y) = x·y in
            # IEEE for s = ±1) and decorrelates cross-replica cosines to
            # O(1/√dim) noise — see the module docstring for why a
            # circular shift is NOT enough (autocorrelation).
            import hashlib

            dim = len(src.select("embedding").first()[0])

            def signs(i: int) -> list[float]:
                return [
                    1.0
                    if hashlib.md5(f"{i}|{d}".encode()).digest()[0] & 1
                    else -1.0
                    for d in range(dim)
                ]

            flipped = F.col("embedding")
            for i in range(1, args.factor):
                flipped = F.when(
                    F.col("__i") == i,
                    F.zip_with(
                        F.col("embedding"),
                        F.array(*[F.lit(s).cast("float") for s in signs(i)]),
                        lambda x, s: (x * s).cast("float"),
                    ),
                ).otherwise(flipped)
            rep = rep.withColumn("embedding", flipped)
        n = rep.drop("__i").write.mode("overwrite").parquet(
            f"{args.out}/{t}.parquet"
        )
        print(f"{t}: x{args.factor}")

    print("done:", args.out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/.scratch/sf1")
    args = ap.parse_args()
    build(args.src, args.factor, args.out)


if __name__ == "__main__":
    main()
