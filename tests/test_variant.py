"""VARIANT shredding semantics (op_variant_shred, plans/extra.py).

The driver fixture's props are homogeneous ({"k": int}), so the oracle
gate alone can't exercise the ragged-payload behavior the VARIANT path
exists for. This pins it on heterogeneous literals: missing fields,
type-mismatched fields, nested objects, and top-level non-objects all
shred to NULL through try_variant_get (ANSI-safe), never to an error —
the schema-on-read contract from_json cannot offer without a
user-supplied (and producer-synchronized) schema.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_try_variant_get_is_total_over_ragged_payloads(spark):
    rows = [
        ('{"k": 7}',),                  # the fixture shape
        ('{"k": "not-an-int"}',),       # uncastable -> NULL, no ANSI error
        ('{"j": 1}',),                  # missing path -> NULL
        ('{"k": {"nested": 1}}',),      # object at a scalar path -> NULL
        ('[1, 2, 3]',),                 # top-level array
        ('null',),                      # JSON null
    ]
    df = spark.createDataFrame(rows, "props string")
    out = df.select(
        F.try_variant_get(F.parse_json("props"), "$.k", "bigint").alias("k")
    ).collect()
    assert [r.k for r in out] == [7, None, None, None, None, None]


def test_variant_shred_matches_per_field_extraction(spark, sf_dir):
    """parse-once-shred-many must agree with the per-field
    get_json_object path on the real fixture (the perf claim is that
    they differ in DECODE count, never in values)."""
    from habits_etl_spark.plans import QUERIES

    got = {r.event_type: r for r in QUERIES["op_variant_shred"](spark, sf_dir).collect()}
    e = (
        QUERIES["op_variant_shred"].__globals__["t"](spark, sf_dir, "events")
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("s"))
        .collect()
    )
    for r in e:
        assert got[r.event_type].n_events == r.n
        assert got[r.event_type].k_sum == r.s
        assert got[r.event_type].n_absent_field == 0
