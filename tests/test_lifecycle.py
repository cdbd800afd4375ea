"""Wave-29 lifecycle family: CDC apply and dedup-impact invariants
(exact values are oracle-checked by tools/check_correctness.py), plus
EXACT greedy equivalence of the k-center coreset against a numpy
reference."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from habits_etl_spark.plans.common import t
from habits_etl_spark.plans.lifecycle import (
    _KC_K,
    ext_coreset_kcenter,
    ext_dedup_impact_report,
    sink_cdc_apply,
)


def test_cdc_apply_semantics(spark, sf_dir):
    rows = sink_cdc_apply(spark, sf_dir).collect()
    by_key = {r.custkey: r for r in rows}
    o = (
        t(spark, sf_dir, "orders")
        .select(
            (
                F.col("o_custkey")
                + F.when(F.col("o_orderkey") % 11 == 0, 100000).otherwise(0)
            ).alias("key"),
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
        )
        .collect()
    )
    latest: dict[int, tuple] = {}
    for r in o:
        if r.key not in latest or r.o_orderkey > latest[r.key][0]:
            op = (
                "D"
                if r.o_orderkey % 97 == 0
                else ("I" if r.o_orderstatus == "O" else "U")
            )
            latest[r.key] = (r.o_orderkey, op, r.o_totalprice)
    base_keys = {
        r.c_custkey
        for r in t(spark, sf_dir, "customer").select("c_custkey").collect()
    }
    deleted = {k for k, v in latest.items() if v[1] == "D"}
    inserted = set(latest) - deleted - base_keys
    # row accounting: base - deletes-of-base-keys + pure inserts
    assert len(rows) == len(base_keys) - len(deleted & base_keys) + len(
        inserted
    )
    for k in deleted:
        assert k not in by_key  # tombstone applied
    for k in list(inserted)[:20]:
        assert by_key[k].name == "(cdc-insert)"
        assert abs(by_key[k].acctbal - round(latest[k][2], 2)) < 1e-6
    # a key saw changes iff it carries a last_seq
    assert all((r.n_changes == 0) == (r.last_seq is None) for r in rows)


def test_dedup_impact_matches_exact_dedup(spark, sf_dir):
    from habits_etl_spark.plans.ext_text import ext_exact_dedup

    report = ext_dedup_impact_report(spark, sf_dir).collect()
    # ledger total removed == total collapse ext_exact_dedup performs
    collapsed = ext_exact_dedup(spark, sf_dir).agg(
        F.sum(F.col("n_copies") - 1)
    ).collect()[0][0]
    assert sum(r.rows_removed for r in report) == collapsed
    for r in report:
        assert 0 <= r.rows_removed < r.rows_total
        assert (r.rows_removed == 0) == (r.chars_removed == 0)
        assert abs(r.removal_pct - r.rows_removed / r.rows_total) < 1e-6


def test_coreset_kcenter_matches_numpy_greedy(spark, sf_dir):
    rows = ext_coreset_kcenter(spark, sf_dir).collect()
    assert [r.round for r in rows] == list(range(1, _KC_K + 1))
    # radius is non-increasing as centers are added
    radii = [r.covering_radius for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(radii, radii[1:]))

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in emb])
    x = np.array([r.embedding for r in emb], dtype=np.float64)
    order = np.lexsort((ids,))
    ids, x = ids[order], x[order]
    nrm2 = (x * x).sum(axis=1)
    # seed: max norm, tie-break min vec_id (lexsorted => argmax is first max)
    seed = int(np.argmax(nrm2))
    picks = [seed]
    mind = ((x - x[seed]) ** 2).sum(axis=1)
    expect = []
    for _ in range(_KC_K - 1):
        far = int(np.argmax(mind))
        expect.append((int(ids[picks[-1]]), float(np.sqrt(mind[far]))))
        picks.append(far)
        mind = np.minimum(mind, ((x - x[far]) ** 2).sum(axis=1))
    expect.append((int(ids[picks[-1]]), float(np.sqrt(mind.max()))))

    got = [(r.vec_id, r.covering_radius) for r in rows]
    for (gv, gr), (ev, er) in zip(got, expect):
        assert gv == ev  # EXACT same greedy selection
        assert abs(gr - er) < 1e-4
