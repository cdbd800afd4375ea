#!/usr/bin/env python
"""End-to-end corpus-curation run: the composition a 100 TB pretraining
pipeline ships, expressed with this repo's registered operators.

    gopher rule gate  ->  admission gate  ->  decontamination
                      ->  domain mixing  ->  packing

Each stage is the registered query (so it is oracle-verified elsewhere);
the composition joins on doc_id decision sets — exactly how a production
run wires stages that were developed and validated independently.

    PYTHONPATH=. python examples/curation_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from habits_etl_spark.plans import QUERIES
from habits_etl_spark.plans.common import t
from habits_etl_spark.plans.ext_curation import seq_packing_over
from habits_etl_spark.plans.ext_curation2 import domain_mix_over
from habits_etl_spark.plans.ext_curation3 import gopher_rules_over
from habits_etl_spark.session import get_spark


def run_pipeline(spark, sf_dir: str, out: str) -> dict[str, int]:
    """The full composition; returns the per-stage counts (pytest asserts
    them at sf0.01 in tests/test_curation_pipeline.py)."""

    # 0. Gopher rule battery: a cheap structural gate (pure map, no
    # shuffle) whose verdicts are intersected with the admission decision
    # below. Stages here are the registered fixed-input queries, composed
    # by doc_id decision sets; a production run would instead feed the
    # gopher SURVIVORS into the expensive admission DAG so the MinHash /
    # connected-components work never touches structurally rejected docs.
    gopher = gopher_rules_over(t(spark, sf_dir, "documents"))
    gopher_pass = gopher.filter(F.col("passed")).select("doc_id")

    # 1. admission: pii -> quality -> per-language tercile -> dedup keep.
    # Cached: the admission DAG (MinHash LSH + iterative connected
    # components) is the expensive stage and feeds five consumers below —
    # uncached it would re-execute for each of them.
    from habits_etl_spark.plans.common import managed_cache

    admission = managed_cache(
        QUERIES["ext_admission_decision"](spark, sf_dir), "example.admission"
    )
    admitted = (
        admission.filter(F.col("admitted")).select("doc_id").join(gopher_pass, "doc_id")
    )

    # 2. decontamination: any doc sharing a 13-gram with the eval set
    contaminated = (
        QUERIES["ext_contamination_ngram"](spark, sf_dir).select("doc_id").distinct()
    )
    survivors = admitted.join(contaminated, "doc_id", "left_anti")

    # 3+4 run on the SURVIVING corpus — packing offsets computed over a
    # superset would leave gaps for rejected docs' tokens and mis-place
    # every sequence boundary; mixture weights over the raw corpus would
    # target the pre-filter source distribution
    surviving_docs = t(spark, sf_dir, "documents").join(survivors, "doc_id")
    mix = domain_mix_over(surviving_docs)
    manifest = seq_packing_over(surviving_docs)

    n_total = admission.count()
    n_gopher = gopher_pass.count()
    n_admitted = admitted.count()
    n_contam = contaminated.count()
    n_final = manifest.count()

    manifest.write.mode("overwrite").parquet(f"{out}/pack_manifest")
    mix.write.mode("overwrite").parquet(f"{out}/domain_mix")
    (
        admission.groupBy("admitted", "rejecting_stage")
        .count()
        .orderBy("admitted", "rejecting_stage")
        .write.mode("overwrite")
        .parquet(f"{out}/admission_report")
    )

    print(
        f"docs={n_total} gopher_pass={n_gopher} admitted={n_admitted} "
        f"contaminated={n_contam} packed={n_final} -> {out}"
    )
    return {
        "docs": n_total,
        "gopher_pass": n_gopher,
        "admitted": n_admitted,
        "contaminated": n_contam,
        "packed": n_final,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curation_out"
    run_pipeline(get_spark("curation_pipeline"), sf_dir, out)


if __name__ == "__main__":
    main()
