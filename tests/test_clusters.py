"""Connected components: transitive closure, convergence, and the dup-cluster query.

Both strategies are pinned: the bounded driver union-find (default for
small measured edge counts) and the distributed label-propagation loop
(forced via driver_solve_max_edges=0 — the path big pair graphs take)."""

from __future__ import annotations

import pytest

from habits_etl_spark.operators.clusters import connected_components

# kwargs per strategy: driver union-find (default) vs forced distributed loop
_STRATS = [{}, {"driver_solve_max_edges": 0}]


def comps_of(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.vertex: r.component for r in connected_components(df, **kw).collect()}


@pytest.mark.parametrize("kw", _STRATS)
def test_transitive_chain(spark, kw):
    # 1-2, 2-3, 3-4 one component; 10-11 another
    c = comps_of(spark, [(1, 2), (2, 3), (3, 4), (10, 11)], **kw)
    assert c[1] == c[2] == c[3] == c[4] == 1
    assert c[10] == c[11] == 10


@pytest.mark.parametrize("kw", _STRATS)
def test_long_chain_converges(spark, kw):
    # a 40-vertex path needs ~log rounds of min-label propagation
    c = comps_of(spark, [(i, i + 1) for i in range(40)], **kw)
    assert set(c.values()) == {0} and len(c) == 41


def test_strategies_agree_on_random_graph(spark):
    # same (vertex, component) map from the driver solve and the loop
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    a = comps_of(spark, edges)
    b = comps_of(spark, edges, driver_solve_max_edges=0)
    assert a == b


def test_dup_clusters_query(spark, sf_dir):
    from habits_etl_spark.plans import QUERIES

    pairs = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["ext_near_dedup_minhash"](spark, sf_dir).collect()
    }
    clusters = {
        r.doc_id: r.keep_doc_id
        for r in QUERIES["ext_dup_clusters"](spark, sf_dir).collect()
    }
    for a, b in pairs:  # every near-dup pair must land in the same cluster
        assert clusters[a] == clusters[b]
    assert all(k >= v for k, v in clusters.items())  # canonical = min doc_id

@pytest.mark.parametrize("kw", _STRATS)
def test_self_loops_and_nulls(spark, kw):
    # self-loops register the vertex without uniting; null endpoints are
    # dropped before either strategy sees them (the driver union-find's
    # min-id comparison must never see None)
    df = spark.createDataFrame(
        [(1, 1), (2, 3), (4, None), (None, 5), (None, None), (6, 6)],
        "src long, dst long",
    )
    c = {r.vertex: r.component for r in connected_components(df, **kw).collect()}
    assert c == {1: 1, 2: 2, 3: 2, 6: 6}


def test_self_loop_gate_counts_undirected_edges(spark):
    # a self-loop-heavy graph: each self-loop appears ONCE in the
    # symmetrized-distinct list, so the gate must count undirected edges
    # directly, not halve the symmetric count. budget=3 with 4 undirected
    # edges (3 self-loops + 1 real) must take the distributed path and
    # still be correct.
    edges = [(1, 1), (2, 2), (3, 3), (1, 2)]
    a = comps_of(spark, edges, driver_solve_max_edges=3)
    b = comps_of(spark, edges)
    assert a == b == {1: 1, 2: 1, 3: 3}
