"""Snapshot-manifest table commits: atomic multi-file publish on plain
Parquet, without Delta/Iceberg.

The gap this closes (SURVEY §2.1 maps ``sink_upsert_events`` to Delta
MERGE; VERDICT r3 "What's missing" #3): ``sinks/compact.py`` and
``sinks/upsert.py`` are correct under single-writer discipline, but a
reader listing the directory DURING a rewrite can see partial or doubled
data — directory listing is not a snapshot. The minimal fix, and the core
idea behind every transactional table format (Delta's _delta_log,
Iceberg's metadata.json pointer): writers never mutate published files,
they write NEW files and then atomically swap ONE pointer; readers
resolve the pointer once and read an immutable file list.

Layout::

    table/
      data/<uuid>/part-*.parquet     immutable once referenced
      _manifests/<uuid>.json         {"files": [...], "version": N, ...}
      _current                       one line: manifest filename

Guarantees (POSIX rename atomicity — local FS/HDFS/NFS; on S3-class
stores swap the pointer in a conditional-PUT/DynamoDB-style commit
instead, which is exactly what Delta does):

- **Atomic commit**: ``os.replace`` of ``_current`` is all-or-nothing; a
  crash anywhere before it leaves the previous snapshot intact (orphan
  data files are garbage, never visible).
- **Snapshot isolation**: ``read_snapshot`` resolves ``_current`` once;
  the file list it returns is immutable, so a concurrent
  ``overwrite``/``upsert``/``compact`` never changes what an in-flight
  reader sees (``vacuum`` with a retention window bounds how long).
- **Serialized writers**: commits are optimistic — the writer records
  the version it read, and the commit re-reads ``_current`` under an
  O_EXCL lock file and refuses when someone else committed in between
  (the caller retries on ``CommitConflict``). Same optimistic-
  concurrency shape as Delta; at one-writer-per-table (the reference's
  topology, etl/etl_habits.py:45) the conflict path never fires.

At 100 TB: the manifest holds file PATHS + per-file column stats, a few
KB per thousand files; reads plan from the manifest (no directory
listing — object-store LIST is the scaling bottleneck this kills); time
travel is "read an old manifest". ``read_snapshot(where=...)`` does
Iceberg-style manifest-entry pruning: per-file min/max (harvested from
the parquet footers at commit time) skip whole files BEFORE Spark ever
sees them — the planner-side rung above row-group skipping, and the one
that matters on object stores where every opened file is a round trip.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer committed since this snapshot was read; retry."""


_CURRENT = "_current"
_MANIFESTS = "_manifests"
_DATA = "data"
_LOCK = "_commit.lock"


def _paths(table_path: str) -> tuple[str, str]:
    return os.path.join(table_path, _MANIFESTS), os.path.join(table_path, _DATA)


def current_manifest(table_path: str) -> dict | None:
    """The committed snapshot dict, or None for an empty/new table."""
    ptr = os.path.join(table_path, _CURRENT)
    try:
        with open(ptr) as fh:
            name = fh.read().strip()
    except FileNotFoundError:
        return None
    with open(os.path.join(table_path, _MANIFESTS, name)) as fh:
        return json.load(fh)


def manifest_at(table_path: str, version: int) -> dict:
    """The manifest that committed ``version`` — time travel. Raises
    KeyError when that version is gone (vacuumed past) or never existed."""
    man_dir, _ = _paths(table_path)
    if os.path.isdir(man_dir):
        for f in os.listdir(man_dir):
            if not f.endswith(".json"):
                continue
            with open(os.path.join(man_dir, f)) as fh:
                m = json.load(fh)
            if m["version"] == version:
                return m
    raise KeyError(f"no manifest for version {version} at {table_path}")


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    where: dict[str, tuple] | None = None,
    version: int | None = None,
) -> DataFrame:
    """Read the table at its current committed snapshot. The resolved
    file list is immutable — concurrent commits cannot change or
    partially apply to this DataFrame's input split set.

    ``where``: optional {column: (lo, hi)} closed ranges. Files whose
    manifest stats PROVE no row can match are dropped from the scan
    (manifest-entry pruning); the predicate itself is NOT applied to the
    surviving rows — callers keep their own ``.filter`` (which Spark then
    also pushes into row-group stats; the two rungs compose).

    ``version``: optional time travel — read the table as of that commit
    (any version the vacuum retention window still holds)."""
    m = (
        manifest_at(table_path, version)
        if version is not None
        else current_manifest(table_path)
    )
    if m is None or not m["files"]:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    files = m["files"] if not where else prune_files(m, where)
    if not files:  # every file provably excluded: empty frame, same schema
        return spark.read.parquet(*m["files"]).limit(0)
    return spark.read.parquet(*files)


def prune_files(manifest: dict, where: dict[str, tuple]) -> list[str]:
    """Manifest-entry file skipping: keep a file unless its [min, max]
    for some predicate column is provably disjoint from the asked range.
    Files without stats for a column (old commits, unsupported types)
    are conservatively KEPT."""
    stats: dict[str, dict] = manifest.get("stats", {})
    out = []
    for f in manifest["files"]:
        fstats = stats.get(f)
        keep = True
        if fstats:
            for col, (lo, hi) in where.items():
                cs = fstats.get(col)
                if not cs:
                    continue
                fmin, fmax = cs
                if fmin is None or fmax is None:
                    continue
                if (hi is not None and fmin > hi) or (
                    lo is not None and fmax < lo
                ):
                    keep = False
                    break
        if keep:
            out.append(f)
    return out


# Stats are harvested for these parquet physical types only (min/max on
# strings/binary are truncation-prone across writers; numeric and
# date/time stats are exact).
_STATS_TYPES = ("INT32", "INT64", "FLOAT", "DOUBLE")


def _collect_file_stats(files: list[str]) -> dict[str, dict]:
    """{file: {column: [min, max]}} from the parquet footers — one
    metadata read per file at COMMIT time (the writer just produced these
    files; the footers are hot). Row-group mins/maxes fold to file level."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for path in files:
        try:
            meta = pq.ParquetFile(path).metadata
        except Exception:
            continue  # stats are an optimization; never fail the commit
        cols: dict[str, list] = {}
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                s = c.statistics
                if (
                    s is None
                    or not s.has_min_max
                    or c.physical_type not in _STATS_TYPES
                ):
                    continue
                name = c.path_in_schema
                mn, mx = s.min, s.max
                # JSON-safe values only: INT64 TIMESTAMP logical stats
                # surface as datetime objects — recording those would
                # crash the manifest serialization at commit time
                if not isinstance(mn, (int, float)) or not isinstance(
                    mx, (int, float)
                ):
                    continue
                if name in cols:
                    cols[name][0] = min(cols[name][0], mn)
                    cols[name][1] = max(cols[name][1], mx)
                else:
                    cols[name] = [mn, mx]
        if cols:
            out[path] = cols
    return out


def snapshot_files(table_path: str) -> list[str]:
    m = current_manifest(table_path)
    return list(m["files"]) if m else []


def _write_data_files(df: DataFrame, table_path: str) -> list[str]:
    """Materialize df into a fresh immutable data dir; return file paths."""
    _, data_root = _paths(table_path)
    out = os.path.join(data_root, uuid.uuid4().hex)
    df.write.parquet(out)
    return sorted(
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def _commit(
    table_path: str,
    files: list[str],
    base_version: int,
    extra: dict | None = None,
) -> dict:
    """Publish ``files`` as the next snapshot iff nobody committed since
    ``base_version``. Lock file serializes the check-and-swap so two
    same-version writers cannot both win. ``extra`` fields (e.g. the
    streaming sink's last_batch_id) ride in the SAME atomic commit."""
    man_dir, data_dir = _paths(table_path)
    os.makedirs(man_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)
    lock = os.path.join(table_path, _LOCK)
    fd = None
    for _ in range(200):  # ~2 s of 10 ms retries, then surface the stall
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            time.sleep(0.01)
    if fd is None:
        raise TimeoutError(f"commit lock busy at {lock}")
    try:
        cur = current_manifest(table_path)
        cur_version = cur["version"] if cur else 0
        if cur_version != base_version:
            raise CommitConflict(
                f"snapshot moved v{base_version} -> v{cur_version}; retry"
            )
        manifest = {
            "version": cur_version + 1,
            "files": files,
            "committed_unix": time.time(),
            **(extra or {}),
        }
        name = f"{uuid.uuid4().hex}.json"
        mpath = os.path.join(man_dir, name)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, mpath)
        ptr_tmp = os.path.join(table_path, f"_current.{uuid.uuid4().hex}.tmp")
        with open(ptr_tmp, "w") as fh:
            fh.write(name)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(ptr_tmp, os.path.join(table_path, _CURRENT))  # THE commit
        return manifest
    finally:
        os.close(fd)
        os.unlink(lock)


def _merged_stats(cur: dict | None, new_files: list[str]) -> dict:
    """Carried-over stats for still-referenced files + footer stats for
    the new ones."""
    old = dict(cur.get("stats", {})) if cur else {}
    old.update(_collect_file_stats(new_files))
    return old


def overwrite_snapshot(spark: SparkSession, df: DataFrame, table_path: str) -> dict:
    """Replace the table contents with ``df`` in one atomic commit."""
    cur = current_manifest(table_path)
    base = cur["version"] if cur else 0
    os.makedirs(os.path.join(table_path, _DATA), exist_ok=True)
    files = _write_data_files(df, table_path)
    return _commit(
        table_path, files, base, extra={"stats": _collect_file_stats(files)}
    )


def append_snapshot(spark: SparkSession, df: DataFrame, table_path: str) -> dict:
    """Append ``df`` as new files: old files stay referenced, the new
    manifest is old list + new list (file-level append, no rewrite)."""
    cur = current_manifest(table_path)
    base = cur["version"] if cur else 0
    old_files = cur["files"] if cur else []
    files = _write_data_files(df, table_path)
    return _commit(
        table_path,
        old_files + files,
        base,
        extra={"stats": _merged_stats(cur, files)},
    )


def upsert_snapshot(
    spark: SparkSession,
    incoming: DataFrame,
    table_path: str,
    keys: list[str],
    set_cols: list[str],
    coalesce_cols: list[str],
    keep_old_cols: list[str] | None = None,
) -> dict:
    """MERGE against the current snapshot (sinks/upsert.py semantics),
    publish the merged result atomically. Readers concurrent with the
    merge keep the pre-merge snapshot until the pointer swap."""
    from habits_etl_spark.sinks.upsert import upsert_keyed

    cur = current_manifest(table_path)
    if cur is None:
        return overwrite_snapshot(spark, incoming, table_path)
    existing = spark.read.parquet(*cur["files"])
    merged = upsert_keyed(
        existing, incoming, keys, set_cols, coalesce_cols, keep_old_cols
    )
    files = _write_data_files(merged, table_path)
    return _commit(
        table_path, files, cur["version"], extra={"stats": _collect_file_stats(files)}
    )


def compact_snapshot(
    spark: SparkSession, table_path: str, target_files: int = 1
) -> dict:
    """Rewrite the current snapshot into ``target_files`` files and
    publish. Pure metadata swap from the reader's perspective: the data
    is byte-identical, only the file layout changes (coalesce — merging
    files needs no shuffle, same as compact.py)."""
    cur = current_manifest(table_path)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot at {table_path}")
    df = spark.read.parquet(*cur["files"]).coalesce(target_files)
    files = _write_data_files(df, table_path)
    return _commit(
        table_path, files, cur["version"], extra={"stats": _collect_file_stats(files)}
    )


def vacuum(table_path: str, retain_versions: int = 1) -> list[str]:
    """Delete data files referenced ONLY by manifests older than the
    ``retain_versions`` newest. In-flight readers pinned to a retained
    snapshot keep every file they resolved; this is the bounded-staleness
    contract every snapshot store ships (Delta VACUUM's retention)."""
    man_dir, _ = _paths(table_path)
    if not os.path.isdir(man_dir):
        return []
    manifests = []
    for f in os.listdir(man_dir):
        if f.endswith(".json"):
            with open(os.path.join(man_dir, f)) as fh:
                manifests.append((json.load(fh), f))
    manifests.sort(key=lambda m: m[0]["version"])
    cur = current_manifest(table_path)
    keep_from = max(0, len(manifests) - retain_versions)
    live: set[str] = set(cur["files"]) if cur else set()
    for m, _f in manifests[keep_from:]:
        live.update(m["files"])
    dead: set[str] = set()
    for m, f in manifests[:keep_from]:
        dead.update(set(m["files"]) - live)
        os.unlink(os.path.join(man_dir, f))
    removed = []
    for path in sorted(dead):
        try:
            os.unlink(path)
            removed.append(path)
        except FileNotFoundError:
            pass
        parent = os.path.dirname(path)
        try:
            os.rmdir(parent)  # only succeeds when the data dir emptied
        except OSError:
            pass
    return removed


# --- streaming bridge --------------------------------------------------------


def append_snapshot_batch(
    spark: SparkSession, df: DataFrame, table_path: str, batch_id: int
) -> dict | None:
    """Idempotent micro-batch append for ``foreachBatch`` sinks.

    Structured Streaming replays the last uncommitted batch after a crash
    (foreachBatch is at-least-once); recording the committing ``batch_id``
    in the manifest and refusing batches at-or-below it upgrades the sink
    to exactly-once — the same epoch-dedup contract Delta's streaming
    sink implements with its txn table. Returns the new manifest, or None
    when the batch was already committed (the replay case)."""
    cur = current_manifest(table_path)
    last = cur.get("last_batch_id", -1) if cur else -1
    if batch_id <= last:
        return None  # replayed batch: already durable, skip
    base = cur["version"] if cur else 0
    old_files = cur["files"] if cur else []
    files = _write_data_files(df, table_path)
    # the batch id commits ATOMICALLY with the file list: there is no
    # window where the data is published but the id is not (which a crash
    # could turn into a double-append on replay)
    return _commit(
        table_path,
        old_files + files,
        base,
        extra={"last_batch_id": batch_id, "stats": _merged_stats(cur, files)},
    )


def manifest_stream_sink(stream_df: DataFrame, table_path: str, checkpoint: str, trigger: dict | None = None):
    """writeStream -> snapshot-manifest table, exactly-once.

    foreachBatch appends each micro-batch through append_snapshot_batch;
    on restart, a replayed batch is a no-op (batch-id dedup), so readers
    of the manifest never see doubled rows even across crash/restart —
    proven in tests/test_manifest_stream.py by killing between the data
    write and the offset-log commit."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        append_snapshot_batch(batch_df.sparkSession, batch_df, table_path, batch_id)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
