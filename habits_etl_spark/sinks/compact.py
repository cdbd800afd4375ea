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
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def partition_file_stats(table_path: str) -> dict[str, tuple[int, int]]:
    """{partition_dir_name: (n_data_files, total_bytes)} for one-level
    hive-partitioned layout (``key=value`` subdirectories)."""
    out: dict[str, tuple[int, int]] = {}
    for entry in sorted(os.listdir(table_path)):
        pdir = os.path.join(table_path, entry)
        if "=" not in entry or not os.path.isdir(pdir):
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
    rewritten: dict[str, int] = {}
    for part, (n_files, total) in partition_file_stats(table_path).items():
        want = max(1, math.ceil(total / target_bytes))
        if n_files <= want + slack:
            continue
        pdir = os.path.join(table_path, part)
        tmp = os.path.join(table_path, f"_compact_{uuid.uuid4().hex}")
        # coalesce, not repartition: merging files needs no shuffle
        spark.read.parquet(pdir).coalesce(want).write.mode("overwrite").parquet(tmp)
        swap = pdir + f".old_{uuid.uuid4().hex}"
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
