#!/usr/bin/env python
"""Measure per-query scaling sf0.1 -> sf1 (10x rows) and write SCALING.md.

Protocol: FRESH Spark session per query (the r12 shared-session sweep
measured ext_near_dedup_minhash at 14 s vs 2.8 s solo — lingering
caches/memos from earlier queries thrash later ones); each query runs
twice per SF and the BEST rep is kept (rep 0 pays session-lifetime
index builds; these are hour-scale sweeps, not bench records). Exponent =
log10(sec_sf1 / sec_sf0.1): 1.0 = linear, <1 = fixed-cost-amortized,
>1 = super-linear (the thing this file exists to catch).

Usage:
    python tools/run_scaling.py [--sf1 /root/repo/.scratch/sf1] [--out SCALING.md]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The heaviest families by design (dedup, weighted dedup, vector ANN,
# blocked pairs, one stateful streaming e2e) + two baseline aggregates
# whose linearity anchors the table.
QUERIES = [
    "agg_daily_rollup",
    "join_star_schema",
    "ext_exact_dedup",
    "ext_near_dedup_minhash",
    "ext_weighted_minhash_pairs",
    "ext_simhash",
    "ext_ngram_jaccard_simhash_blocked",
    "ext_cosine_pairs_lsh",
    "ext_ann_lsh_bucketed",
    "ext_embedding_cosine_pairs",
    "ext_embedding_dup_clusters",
    "ext_ngram_jaccard_blocked",
    "ext_ivfpq_topk",
    "ext_topk_sim_search",
    "stream_rollup_e2e",
]

# the banding-law variant (band_bits ~ log2 n): measured alongside the
# 8-bit registered default so SCALING.md shows the knob, not just the law
_TUNED = ("ext_cosine_pairs_lsh[12-bit]", 12)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", default="/root/repo/.scratch/sf1")
    ap.add_argument("--out", default="SCALING.md")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    from habits_etl_spark.session import get_spark

    qs = entrymod.queries()

    from habits_etl_spark.plans.ext_vectors import scale_tuned_cosine_pairs

    tuned_name, tuned_bits = _TUNED
    runnable = [(n, qs[n]) for n in QUERIES] + [
        (tuned_name, lambda s, d: scale_tuned_cosine_pairs(s, d, band_bits=tuned_bits))
    ]

    results = {}
    for name, fn in runnable:
        # FRESH session per query: the r12 shared-session sweep measured
        # ext_near_dedup_minhash at 14 s against 2.8 s solo — lingering
        # cached relations and session-lifetime memos from earlier
        # queries evict/thrash later ones, and best-of-reps cannot see
        # past it because the pollution persists across reps. A new
        # applicationId also invalidates shared_cache/memo_fit entries,
        # so every query pays its own honest index-build in rep 0.
        spark = get_spark(f"scaling-{name}")
        row = {}
        try:
            for label, sf_dir in (("sf0.1", args.sf01), ("sf1", args.sf1)):
                reps = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    n = fn(spark, sf_dir).count()
                    reps.append(time.perf_counter() - t0)
                row[label] = (min(reps), n)
                print(f"{name} {label}: best={min(reps):.3f}s rows={n}", flush=True)
        except Exception as exc:  # record the failure, keep sweeping
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
            row["error"] = f"{type(exc).__name__}"
        finally:
            spark.stop()
        results[name] = row

    lines = [
        "# SCALING — sf0.1 -> sf1 (10x rows), measured",
        "",
        f"Fixture: `{args.sf1}` = sf0.1 replicated 10x by",
        "`tools/make_scaled_fixture.py` (disjoint key ranges per replica;",
        "per-replica alphabet rotation of text and Rademacher sign-flip",
        "of embeddings keep within-replica duplicate/ANN structure",
        "identical while preventing cross-replica cliques). local[32],",
        f"FRESH session per query, best of {args.reps} reps per SF (rep 0 pays",
        "session-lifetime index builds — signature/candidate caches,",
        "k-means/PQ fits — so best-of captures the warm per-query cost;",
        "the build-the-index-once contract is the deployment reality).",
        "exponent = log10(sec_sf1 / sec_sf0.1): 1.0 = linear in rows,",
        "< 1 = fixed cost amortizing, > 1 = super-linear (bad).",
        "",
        "| query | sf0.1 sec | sf1 sec | rows sf0.1 | rows sf1 | x | exponent |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, row in results.items():
        if "error" in row or "sf1" not in row:
            lines.append(f"| {name} | — | — | — | — | ERROR | {row.get('error', '?')} |")
            continue
        s01, n01 = row["sf0.1"]
        s1, n1 = row["sf1"]
        ratio = s1 / max(s01, 1e-9)
        expo = math.log10(max(ratio, 1e-9))
        lines.append(
            f"| {name} | {s01:.3f} | {s1:.3f} | {n01} | {n1} "
            f"| {ratio:.1f}x | {expo:.2f} |"
        )
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
