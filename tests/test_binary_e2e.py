"""Wave-23 e2e invariants: the binaryFile scan round-trips real bytes
with correct MIME sniffing, and manifest time travel reproduces every
historical version. (Exact tuples are hash-checked against the DuckDB
oracle by tools/check_correctness.py.)"""

from __future__ import annotations

from habits_etl_spark.plans.binary_e2e import (
    _N_BIN_DOCS,
    sink_manifest_time_travel,
    src_binaryfile_scan,
)


def test_binaryfile_scan_covers_every_fixture(spark, sf_dir):
    rows = src_binaryfile_scan(spark, sf_dir).collect()
    assert len(rows) == _N_BIN_DOCS
    names = [r.file_name for r in rows]
    assert names == sorted(names) and len(set(names)) == _N_BIN_DOCS
    mimes = {r.sniffed_mime for r in rows}
    # all three payload classes present, incl. the RIFF probe-at-offset
    assert mimes == {"image/png", "audio/wav", "application/octet-stream"}
    for r in rows:
        doc_id = int(r.file_name[4:8])
        magic_len = {0: 8, 1: 12, 2: 0}[doc_id % 3]
        assert r.n_bytes >= magic_len
        assert len(r.content_md5) == 32


def test_time_travel_versions_are_independent(spark, sf_dir):
    from pyspark.sql import functions as F

    from habits_etl_spark.plans.common import t

    rows = {r.version: r for r in sink_manifest_time_travel(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    ev = t(spark, sf_dir, "events")
    n0 = ev.filter(F.col("user_id") % 5 == 0).count()
    n1 = ev.filter(F.col("user_id") % 5 == 1).count()
    n2 = ev.filter(F.col("user_id") % 5 == 2).count()
    assert rows[1].n_rows == n0
    assert rows[2].n_rows == n0 + n1  # append accumulated on v1
    assert rows[3].n_rows == n2  # overwrite replaced, not merged
