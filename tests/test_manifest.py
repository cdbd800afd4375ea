"""Snapshot-manifest commits (sinks/manifest.py): atomic publish, snapshot
isolation for readers concurrent with overwrite/upsert/compact, optimistic
writer conflicts, crash recovery, vacuum retention."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from habits_etl_spark.sinks import manifest as M


def _vals(df):
    return sorted(r.v for r in df.collect())


def _table(spark, tmp_path, n=100, parts=4):
    path = str(tmp_path / "t")
    df = spark.range(n).select(F.col("id").alias("v")).repartition(parts)
    M.overwrite_snapshot(spark, df, path)
    return path


def test_overwrite_append_read_roundtrip(spark, tmp_path):
    path = _table(spark, tmp_path, n=10)
    assert _vals(M.read_snapshot(spark, path)) == list(range(10))
    M.append_snapshot(
        spark, spark.range(10, 15).select(F.col("id").alias("v")), path
    )
    assert _vals(M.read_snapshot(spark, path)) == list(range(15))
    # append reuses the old files (file-level append, no rewrite)
    m = M.current_manifest(path)
    assert m["version"] == 2 and len(m["files"]) > 1


def test_reader_snapshot_survives_concurrent_compact(spark, tmp_path):
    """THE gate (VERDICT r3 item 5): a reader that resolved its snapshot
    keeps exactly that data while compact + a retention-respecting vacuum
    run underneath it — never partial, never doubled."""
    path = _table(spark, tmp_path, n=1000, parts=8)
    reader_df = M.read_snapshot(spark, path)  # pins v1's file list
    v1_files = M.snapshot_files(path)

    M.compact_snapshot(spark, path, target_files=1)  # publishes v2
    M.vacuum(path, retain_versions=2)  # retention keeps v1's files alive

    # the pinned reader still sees exactly v1's rows — no loss, no doubling
    assert _vals(reader_df) == list(range(1000))
    assert all(os.path.exists(f) for f in v1_files)
    # a NEW reader resolves v2: same rows, one file
    m = M.current_manifest(path)
    assert m["version"] == 2 and len(m["files"]) == 1
    assert _vals(M.read_snapshot(spark, path)) == list(range(1000))

    # once retention drops v1, its files go and v2 is untouched
    M.vacuum(path, retain_versions=1)
    assert not any(os.path.exists(f) for f in v1_files)
    assert _vals(M.read_snapshot(spark, path)) == list(range(1000))


def test_reader_races_many_commits_sees_whole_snapshots_only(spark, tmp_path):
    """Hammer test: a reader loop racing a writer loop must observe ONLY
    committed states (multiples of the batch size), never a torn file set.
    Every resolved snapshot is immutable, so each read is internally
    consistent even while commits land concurrently."""
    path = _table(spark, tmp_path, n=50, parts=2)
    stop = threading.Event()
    bad: list[tuple[int, int]] = []

    def reader():
        while not stop.is_set():
            n = M.read_snapshot(spark, path).count()
            if n % 50 != 0:
                bad.append((n, -1))

    rt = threading.Thread(target=reader)
    rt.start()
    try:
        for i in range(1, 6):
            M.append_snapshot(
                spark,
                spark.range(i * 50, (i + 1) * 50).select(F.col("id").alias("v")),
                path,
            )
            if i % 2 == 0:
                M.compact_snapshot(spark, path, target_files=1)
    finally:
        stop.set()
        rt.join()
    assert bad == []
    assert _vals(M.read_snapshot(spark, path)) == list(range(300))


def test_crash_before_pointer_swap_leaves_old_snapshot(spark, tmp_path, monkeypatch):
    """Simulated crash: data files and manifest written, pointer swap never
    happens -> readers still get v1, intact."""
    path = _table(spark, tmp_path, n=20)

    real_replace = os.replace

    def crashing_replace(src, dst):
        if os.path.basename(dst) == "_current":
            raise OSError("simulated crash at commit point")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crashing_replace)
    with pytest.raises(OSError, match="simulated crash"):
        M.overwrite_snapshot(
            spark, spark.range(5).select(F.col("id").alias("v")), path
        )
    monkeypatch.setattr(os, "replace", real_replace)
    # old snapshot intact; orphaned new files invisible
    assert M.current_manifest(path)["version"] == 1
    assert _vals(M.read_snapshot(spark, path)) == list(range(20))
    # the interrupted writer's lock was released: the next commit succeeds
    M.append_snapshot(spark, spark.range(20, 25).select(F.col("id").alias("v")), path)
    assert _vals(M.read_snapshot(spark, path)) == list(range(25))


def test_conflicting_writers_one_wins(spark, tmp_path):
    """Optimistic concurrency: two writers based on the same version — the
    second commit raises CommitConflict instead of silently clobbering."""
    path = _table(spark, tmp_path, n=10)
    base = M.current_manifest(path)["version"]
    files_a = M._write_data_files(
        spark.range(100, 110).select(F.col("id").alias("v")), path
    )
    files_b = M._write_data_files(
        spark.range(200, 210).select(F.col("id").alias("v")), path
    )
    M._commit(path, files_a, base)
    with pytest.raises(M.CommitConflict):
        M._commit(path, files_b, base)
    assert _vals(M.read_snapshot(spark, path)) == list(range(100, 110))


def test_upsert_snapshot_merge_semantics(spark, tmp_path):
    """MERGE through the manifest: set_cols overwrite (even with NULL
    coalesce_cols keep old on NULL) — sinks/upsert.py semantics behind an
    atomic publish."""
    path = str(tmp_path / "t")
    existing = spark.createDataFrame(
        [(1, 10.0, "old1"), (2, 20.0, "old2")], "k int, value double, notes string"
    )
    M.overwrite_snapshot(spark, existing, path)
    incoming = spark.createDataFrame(
        [(2, 99.0, None), (3, 30.0, "new3")], "k int, value double, notes string"
    )
    M.upsert_snapshot(
        spark, incoming, path, keys=["k"], set_cols=["value"], coalesce_cols=["notes"]
    )
    rows = {
        r.k: (r.value, r.notes)
        for r in M.read_snapshot(spark, path).collect()
    }
    assert rows == {1: (10.0, "old1"), 2: (99.0, "old2"), 3: (30.0, "new3")}
    # pre-merge snapshot is still readable until vacuum (time travel)
    man_dir = os.path.join(path, "_manifests")
    versions = sorted(
        json.load(open(os.path.join(man_dir, f)))["version"]
        for f in os.listdir(man_dir)
        if f.endswith(".json")
    )
    assert versions == [1, 2]


def test_manifest_entry_pruning_skips_disjoint_files(spark, tmp_path):
    """Iceberg-style file skipping: per-file min/max from the parquet
    footers prune files whose range is provably disjoint from the
    predicate — and never change query results."""
    path = str(tmp_path / "t")
    # three appends with disjoint k-ranges -> three file sets with
    # distinguishable stats
    for lo in (0, 100, 200):
        df = spark.range(lo, lo + 50).select(F.col("id").alias("k")).coalesce(1)
        if lo == 0:
            M.overwrite_snapshot(spark, df, path)
        else:
            M.append_snapshot(spark, df, path)
    m = M.current_manifest(path)
    assert len(m["files"]) == 3 and set(m["stats"]) == set(m["files"])

    # range [120, 130]: only the middle file can contain matches
    pruned = M.prune_files(m, {"k": (120, 130)})
    assert len(pruned) == 1
    got = sorted(
        r.k
        for r in M.read_snapshot(spark, path, where={"k": (120, 130)})
        .filter("k between 120 and 130")
        .collect()
    )
    assert got == list(range(120, 131))

    # fully out of range: zero files, empty result, schema preserved
    assert M.prune_files(m, {"k": (1000, 2000)}) == []
    empty = M.read_snapshot(spark, path, where={"k": (1000, 2000)})
    assert empty.count() == 0 and empty.columns == ["k"]

    # open-ended ranges: (lo, None) keeps files with max >= lo
    # (file ranges are 0-49 / 100-149 / 200-249: lo=140 keeps the last two)
    assert len(M.prune_files(m, {"k": (140, None)})) == 2
    # a column with no stats is conservatively kept
    assert len(M.prune_files(m, {"nope": (0, 1)})) == 3


def test_time_travel_reads_old_versions(spark, tmp_path):
    path = _table(spark, tmp_path, n=10)
    M.append_snapshot(spark, spark.range(10, 20).select(F.col("id").alias("v")), path)
    M.overwrite_snapshot(spark, spark.range(5).select(F.col("id").alias("v")), path)

    assert _vals(M.read_snapshot(spark, path)) == list(range(5))
    assert _vals(M.read_snapshot(spark, path, version=1)) == list(range(10))
    assert _vals(M.read_snapshot(spark, path, version=2)) == list(range(20))
    with pytest.raises(KeyError):
        M.manifest_at(path, 99)
    # vacuum past v1 removes its manifest: time travel there now fails,
    # the newer versions still resolve
    M.vacuum(path, retain_versions=2)
    with pytest.raises(KeyError):
        M.manifest_at(path, 1)
    assert _vals(M.read_snapshot(spark, path, version=3)) == list(range(5))
