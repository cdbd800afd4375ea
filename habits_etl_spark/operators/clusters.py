"""Connected components over near-duplicate pairs — duplicate CLUSTERS.

Pair lists (from MinHash/embedding dedup) aren't directly actionable: a
keep-one-per-cluster policy needs the transitive closure (a~b, b~c => one
cluster). This is the canonical iterative Spark algorithm: alternating
small-star / large-star label propagation until no label changes — each
iteration is one join + one aggregation, converging in O(log n) rounds.

At 100 TB: edges are the (tiny) near-dup pair set, not the corpus, so the
loop runs on collision-scale data; each round is a shuffle on vertex id.
(Driver check: rows-only — iterative fixpoints aren't single-statement SQL;
semantics are asserted in tests/test_clusters.py against known components.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Label propagation: every vertex converges to the minimum vertex id
    reachable from it. Returns (vertex, component)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize: the edge list is re-joined every iteration and its
        # lineage may be an expensive dedup pipeline — compute it exactly once
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    for _ in range(max_iter):
        # step 1: each vertex adopts the min(label) among itself + neighbors
        # (left join + least instead of union+groupBy: a self-referencing
        # union plan trips Catalyst's Union constraint propagation)
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["vertex"])
            .groupBy(F.col("a").alias("nv"))
            .agg(F.min("component").alias("ncomp"))
        )
        stepped = (
            labels.join(neighbor_min, labels["vertex"] == neighbor_min["nv"], "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce(F.col("ncomp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        # step 2: pointer jumping — follow the label's own label
        # (component ids are vertex ids, so the self-join always hits);
        # together the two steps halve path lengths => O(log n) rounds.
        l1 = stepped.alias("l1")
        l2 = stepped.alias("l2")
        new_labels = l1.join(
            l2, F.col("l1.component") == F.col("l2.vertex")
        ).select(F.col("l1.vertex").alias("vertex"), F.col("l2.component").alias("component"))
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        # keep the lineage shallow across iterations
        labels = new_labels.localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels
