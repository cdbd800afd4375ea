"""Connected components: transitive closure, convergence, and the dup-cluster query."""

from __future__ import annotations

from habits_etl_spark.operators.clusters import connected_components


def comps_of(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.vertex: r.component for r in connected_components(df).collect()}


def test_transitive_chain(spark):
    # 1-2, 2-3, 3-4 one component; 10-11 another
    c = comps_of(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert c[1] == c[2] == c[3] == c[4] == 1
    assert c[10] == c[11] == 10


def test_long_chain_converges(spark):
    # a 40-vertex path needs ~log rounds of min-label propagation
    c = comps_of(spark, [(i, i + 1) for i in range(40)])
    assert set(c.values()) == {0} and len(c) == 41


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