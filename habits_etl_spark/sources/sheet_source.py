"""Wide-sheet Python Data Source — the reference's Google-Sheets tab scan
(``get_ws(...).get_all_records()``, reference etl/etl_habits.py:11-17,44)
as a FIRST-CLASS Spark source: ``spark.read.format("wide_sheet")``.

Where ``sources.read_wide_csv`` wraps the built-in CSV reader, this is
the Spark 4 Python Data Source API shape a real sheets connector needs —
the pieces that matter at scale are all present and tested:

- **driver-side schema discovery** from the header row (the
  ``get_all_records`` dict-keys analog): every column is a string, the
  config-driven normalize layer owns typing (reference semantics);
- **partitioned reads**: the row range splits into ``numPartitions``
  input partitions, each task reading only its slice — a sheets API
  connector would map these to ranged ``values.get`` calls;
- **filter pushdown INTO the Python source** (``pushFilters``): EqualTo
  / IsNotNull / null-free In / string-range comparisons are applied
  inside the partition read so non-matching rows never cross into the
  JVM; everything else is returned to Spark to re-apply (the contract's
  safety valve).

A real Sheets connector would swap ``_read_rows``'s file I/O for the
HTTP calls and keep every other line. Payload rows cross as plain tuples
(Arrow batching is the DataSourceArrowWriter path, write-side only).
"""

from __future__ import annotations

import csv
import itertools
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType


@dataclass
class _RangePartition(InputPartition):
    start: int  # 0-based data-row index, header excluded
    end: int  # exclusive


def _read_header(path: str) -> list[str]:
    """Header row with duplicate names uniquified (``col``, ``col_1``,
    ``col_2``, the usual sheet-connector convention). Without this, two
    same-named columns would both resolve to the LAST index in the
    reader's name→index map, so a pushed filter on the duplicated name
    would test the wrong cell — and pushed filters are trusted, not
    re-applied by Spark."""
    with open(path, newline="") as fh:
        raw = next(csv.reader(fh))
    seen: dict[str, int] = {}
    out = []
    for h in raw:
        if h in seen:
            seen[h] += 1
            out.append(f"{h}_{seen[h]}")
        else:
            seen[h] = 0
            out.append(h)
    return out


def _read_rows(path: str) -> Iterator[list[str]]:
    with open(path, newline="") as fh:
        rows = csv.reader(fh)
        next(rows, None)  # header
        yield from rows


class WideSheetReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.path = options.get("path")
        self.n_parts = int(options.get("numPartitions", "4"))
        self.columns = [f.name for f in schema.fields]
        self.eq: dict[str, str] = {}
        self.not_null: set[str] = set()
        self.in_sets: dict[str, set[str]] = {}
        # (column, op) -> bound; every cell is a STRING, so ranges push
        # only for string-typed comparisons (which is what the source
        # schema declares — Spark only hands us string-comparison filters)
        self.ranges: list[tuple[str, str, str]] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        ops = {
            GreaterThan: "gt",
            GreaterThanOrEqual: "ge",
            LessThan: "lt",
            LessThanOrEqual: "le",
        }
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1:
                self.eq[f.attribute[0]] = str(f.value)
            elif isinstance(f, IsNotNull) and len(f.attribute) == 1:
                self.not_null.add(f.attribute[0])
            elif (
                isinstance(f, In)
                and len(f.attribute) == 1
                and all(v is not None for v in f.value)
            ):
                self.in_sets[f.attribute[0]] = {str(v) for v in f.value}
            elif type(f) in ops and len(f.attribute) == 1 and isinstance(f.value, str):
                self.ranges.append((f.attribute[0], ops[type(f)], f.value))
            else:
                yield f  # unsupported: Spark re-applies it post-scan

    def partitions(self) -> list[InputPartition]:
        n_rows = sum(1 for _ in _read_rows(self.path))
        n = max(self.n_parts, 1)
        step = -(-n_rows // n) if n_rows else 1
        return [
            _RangePartition(i, min(i + step, n_rows))
            for i in range(0, max(n_rows, 1), step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        idx = {c: i for i, c in enumerate(self.columns)}
        # islice: skip to the slice cheaply and STOP at the end bound —
        # each task's csv scan ends at its own range instead of running
        # to EOF numPartitions times (O(N) total, not O(parts x N)).
        sliced = itertools.islice(_read_rows(self.path), partition.start, partition.end)
        _cmp = {
            "gt": lambda x, b: x is not None and x > b,
            "ge": lambda x, b: x is not None and x >= b,
            "lt": lambda x, b: x is not None and x < b,
            "le": lambda x, b: x is not None and x <= b,
        }
        for row in sliced:
            cells = [
                row[i] if i < len(row) and row[i] != "" else None
                for i in range(len(self.columns))
            ]
            if any(cells[idx[c]] != v for c, v in self.eq.items()):
                continue
            if any(cells[idx[c]] is None for c in self.not_null):
                continue
            if any(cells[idx[c]] not in s for c, s in self.in_sets.items()):
                continue
            if any(not _cmp[op](cells[idx[c]], b) for c, op, b in self.ranges):
                continue
            yield tuple(cells)


class WideSheetDataSource(DataSource):
    """``spark.read.format("wide_sheet").option("path", p).load()`` after
    ``spark.dataSource.register(WideSheetDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "wide_sheet"

    def schema(self) -> StructType:
        header = _read_header(self.options["path"])
        return StructType([StructField(h, StringType()) for h in header])

    def reader(self, schema: StructType) -> WideSheetReader:
        return WideSheetReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType):
        return WideSheetStreamReader(schema, self.options)


class WideSheetStreamReader(SimpleDataSourceStreamReader):
    """Incremental sheet polling (the reference's cron-driven re-ingest,
    Makefile `make etl` on a schedule, made a real streaming source):
    the offset is the count of data rows already ingested; each
    micro-batch reads only rows appended since. Exactly-once comes from
    the offset log — ``readBetweenOffsets`` replays a committed range
    deterministically after restart, so a crashed batch re-reads the SAME
    rows (append-only sheet assumption, the landing-zone contract)."""

    def __init__(self, schema: StructType, options):
        self.path = options.get("path")
        self.n_cols = len(schema.fields)

    def initialOffset(self) -> dict:
        return {"rows": 0}

    def _rows_from(self, start: int, end: int | None = None) -> Iterator[tuple]:
        for i, row in enumerate(_read_rows(self.path)):
            if i < start or (end is not None and i >= end):
                continue
            yield tuple(
                row[j] if j < len(row) and row[j] != "" else None
                for j in range(self.n_cols)
            )

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        # Single enumerate pass: count all rows AND collect the new slice
        # in the same scan (was a count pass + a read pass). The batch is
        # materialized eagerly but returned as an ITERATOR: when the
        # offset does not advance, the runner validates emptiness with
        # next(it) (datasource_internal.add_result_to_cache), which a
        # bare list breaks — any no-new-rows poll would crash.
        committed = start["rows"]
        batch: list[tuple] = []
        n_now = 0
        for i, row in enumerate(_read_rows(self.path)):
            n_now = i + 1
            if i >= committed:
                batch.append(
                    tuple(
                        row[j] if j < len(row) and row[j] != "" else None
                        for j in range(self.n_cols)
                    )
                )
        # Offset monotonicity: if the sheet shrank (rewrite/truncation —
        # a violation of the append-only contract), clamp to the committed
        # offset and emit nothing rather than regress the offset, which
        # would wedge the streaming query.
        if n_now < committed:
            return iter(()), {"rows": committed}
        return iter(batch), {"rows": n_now}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return list(self._rows_from(start["rows"], end["rows"]))
