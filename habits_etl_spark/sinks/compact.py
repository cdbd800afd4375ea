"""Small-file compaction for partitioned parquet tables.

Streaming/micro-batch ingest (streaming/rollup.py appends per trigger;
sinks/landing.py appends per sheet pull) accumulates many small files per
day partition. At scale that breaks reads twice: every file costs a
namenode/liststatus round-trip, and row-groups below
``maxPartitionBytes`` defeat the splittable-scan parallelism the layout
exists for (bench.py's optimize_layout measures exactly this on the
driver's single-row-group inputs).

``compact_table`` rewrites only the partitions whose file count exceeds
what their byte size justifies, into ceil(bytes/target) files each, via
write-to-temp + atomic directory swap. Cost is O(oversized partitions),
never O(table) — the same invalidation-scoped property as the rollup
refresh. On a table format with transactions (Delta/Iceberg OPTIMIZE)
the swap is a metadata commit; on raw parquet, the swap window is the
directory rename, so run it from the single writer that owns the table
(the reference's single-ETL-writer topology, etl/etl_habits.py:45).

POSIX-rename semantics assumed: on a local FS / HDFS the two renames are
atomic metadata ops. On object stores (S3/GCS) "rename" is copy+delete —
neither atomic nor cheap — so there the right tool is a transactional
table format (Delta/Iceberg OPTIMIZE), not this directory swap.

Crash safety: work dirs all start with ``_`` and contain no ``=``
(``_compact_<hex>`` for the rewrite, ``_old_<hex>__<key~value>`` for the
displaced copy), which Spark partition discovery and
``partition_file_stats`` both ignore — a reader
racing the swap never sees the old data double-counted under a bogus
partition value. ``compact_table`` starts by sweeping stale work dirs
from a previous crashed run: an orphaned ``_old_`` whose partition
directory is missing (crash between the two renames) is restored —
losing only the compaction work, never data — and completed leftovers
are deleted.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _sweep_stale_workdirs(table_path: str) -> None:
    """Recover from a previous crashed compaction run.

    ``_old_<hex>__<key~value>`` (the partition's ``=`` encoded as ``~`` —
    see the naming note in ``compact_table``) with its partition dir
    missing means the crash hit between the two renames: restore the
    displaced copy (the rewrite in ``_compact_*`` is then redundant and
    deleted below). Any other ``_old_*`` / ``_compact_*`` leftover is
    garbage from after a completed swap (or an unfinished rewrite with
    the partition still intact)."""
    for entry in os.listdir(table_path):
        if not entry.startswith("_old_"):
            continue
        full = os.path.join(table_path, entry)
        _, sep, enc = entry[len("_old_"):].partition("__")
        part = enc.replace("~e", "=").replace("~t", "~")
        target = os.path.join(table_path, part)
        if sep and part and not os.path.exists(target):
            os.rename(full, target)
        else:
            shutil.rmtree(full, ignore_errors=True)
    for entry in os.listdir(table_path):
        if entry.startswith("_compact_"):
            shutil.rmtree(os.path.join(table_path, entry), ignore_errors=True)


def partition_file_stats(table_path: str) -> dict[str, tuple[int, int]]:
    """{partition_dir_name: (n_data_files, total_bytes)} for one-level
    hive-partitioned layout (``key=value`` subdirectories)."""
    out: dict[str, tuple[int, int]] = {}
    for entry in sorted(os.listdir(table_path)):
        pdir = os.path.join(table_path, entry)
        # skip work/hidden dirs (_compact_*, _old_*__<part> — the latter
        # contains '=' and would otherwise read as a real partition)
        if entry.startswith(("_", ".")) or "=" not in entry or not os.path.isdir(pdir):
            continue
        files = [
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        out[entry] = (len(files), sum(os.path.getsize(f) for f in files))
    return out


def compact_table(
    spark: SparkSession,
    table_path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    slack: int = 2,
) -> dict[str, int]:
    """Compact every partition whose file count exceeds
    ``ceil(bytes/target) + slack``; returns {partition: new_file_count}
    for the rewritten ones. Reads and rewrites ONLY those partitions."""
    _sweep_stale_workdirs(table_path)
    rewritten: dict[str, int] = {}
    for part, (n_files, total) in partition_file_stats(table_path).items():
        want = max(1, math.ceil(total / target_bytes))
        if n_files <= want + slack:
            continue
        pdir = os.path.join(table_path, part)
        tmp = os.path.join(table_path, f"_compact_{uuid.uuid4().hex}")
        # coalesce, not repartition: merging files needs no shuffle
        spark.read.parquet(pdir).coalesce(want).write.mode("overwrite").parquet(tmp)
        # leading underscore + NO '=' anywhere: Spark partition discovery
        # ignores '='-free underscore dirs, but a dir containing '=' is
        # parsed as a partition column whatever its prefix (verified
        # empirically: '_old_x__day=a' raises CONFLICTING_PARTITION_
        # COLUMN_NAMES). So '=' is escape-encoded with '~' ('~'->'~t',
        # '='->'~e' — injective even when the partition VALUE itself
        # contains '=' or '~'); the suffix records which partition the dir
        # held, making a crash between the two renames recoverable.
        enc = part.replace("~", "~t").replace("=", "~e")
        swap = os.path.join(table_path, f"_old_{uuid.uuid4().hex}__{enc}")
        os.rename(pdir, swap)
        os.rename(tmp, pdir)
        shutil.rmtree(swap)
        # drop the _SUCCESS marker inside the partition dir (hive layout
        # expects only data files below partition level)
        marker = os.path.join(pdir, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)
        rewritten[part] = want
    return rewritten
