"""Structural invariants for the PERMISSIVE malformed-CSV audit (exact
values are hash-checked against the DuckDB oracle, which predicts the
classification relationally; these assert what must hold on ANY input)."""

from __future__ import annotations

from habits_etl_spark.plans.common import t
from habits_etl_spark.plans.formats_e2e import src_csv_malformed_audit


def test_csv_audit_accounting(spark, sf_dir):
    rows = src_csv_malformed_audit(spark, sf_dir).collect()
    assert rows
    events = t(spark, sf_dir, "events")
    assert sum(r.n_rows for r in rows) == events.count()  # no row lost on disk
    for r in rows:
        # the four classes partition each type's rows exactly
        assert r.n_valid + r.n_too_few + r.n_bad_field + r.n_too_many == r.n_rows
        assert r.n_bad_field > 0  # the injected corruption is detected
        assert r.n_too_few > 0 and r.n_too_many > 0
        assert r.sum_cents_valid > 0
    # classification is deterministic: second run identical
    again = src_csv_malformed_audit(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
