"""Execution-level shuffle metrics, read back from Spark's SQL status
store after forcing a plan.

Why this exists: the Bloom-pruning A/B (plans/sketchjoin.py,
BENCH_DETAIL bloom_ab) argues that pruning the fact side before a
shuffle join is a NETWORK win even when single-host wall time says
otherwise — on local[32] a shuffle is an in-memory copy, so the probe
overhead isn't bought back. That claim needs a measured byte story, not
prose: this module reads the "shuffle bytes written" / "shuffle records
written" SQLMetrics that Spark's listener aggregates per SQL execution,
so the A/B can record {plain,pruned}_shuffle_bytes alongside the row
counts.

Implementation notes:

- The metrics hang off the SQLAppStatusStore (the same store the SQL UI
  tab renders), keyed by execution id; the listener bus is async, so we
  poll (bounded) until the execution we just forced reports a
  completion time.
- A single SQLMetric accumulator is displayed on every plan node that
  reuses it (AQE reused exchanges, wrapped query stages), so totals are
  deduped by accumulatorId before summing.
- Aggregated byte metrics come back human-formatted ("total (min, med,
  max ...)\\n20.4 KiB (...)"); _metric_total parses the leading total.
  3-significant-digit precision is ample for a bytes-moved comparison.

No new dependencies and no custom listener registration (a Python
SparkListener needs a py4j callback server, which the driver's bench
environment doesn't enable): everything is read from the JVM-side store
Spark already maintains.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

_UNITS = {
    "B": 1,
    "KiB": 1 << 10,
    "MiB": 1 << 20,
    "GiB": 1 << 30,
    "TiB": 1 << 40,
    "PiB": 1 << 50,
    "EiB": 1 << 60,
}


def _metric_total(display: str) -> float:
    """Parse the TOTAL out of a SQLMetric display string.

    Forms observed (Spark 4.x):
      "776"                                  -- plain sum
      "1,234"                                -- grouped sum
      "total (min, med, max (stageId: taskId))\\n20.4 KiB (2.5 KiB, ...)"
      "size total (min, med, max ...)\\n18.2 KiB (...)"
    """
    line = display.split("\n")[-1].strip()
    head = line.split(" (")[0].strip()
    parts = head.split()
    if len(parts) == 2 and parts[1] in _UNITS:
        return float(parts[0].replace(",", "")) * _UNITS[parts[1]]
    return float(head.replace(",", ""))


def run_with_shuffle_metrics(
    spark: SparkSession, df: DataFrame, timeout_sec: float = 30.0
) -> dict:
    """Force ``df`` with a noop write and return its execution's shuffle
    totals: ``{"elapsed_sec", "shuffle_bytes_written",
    "shuffle_records_written"}``.

    Caller contract: no other SQL execution may run concurrently in
    this session (the bench and tests are single-threaded) — the
    metrics are read from the LAST completed execution in the store.
    """
    store = spark._jsparkSession.sharedState().statusStore()
    # Record the max execution id BEFORE the write and accept only a
    # strictly newer execution. (Checking executionsCount() against a
    # separately-snapshotted executionsList() is a TOCTOU race on the
    # async listener bus: if our execution registers between the two JVM
    # calls, the list's last element is the PREVIOUS execution — already
    # completed — and its metrics would be silently attributed to us.)
    before = store.executionsList()
    max_id_before = (
        before.apply(before.size() - 1).executionId() if before.size() > 0 else -1
    )

    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    elapsed = round(time.perf_counter() - t0, 3)

    last = None
    deadline = time.monotonic() + timeout_sec
    while time.monotonic() < deadline:
        execs = store.executionsList()
        n = execs.size()
        if n > 0:
            cand = execs.apply(n - 1)
            if (
                cand.executionId() > max_id_before
                and cand.completionTime().isDefined()
            ):
                last = cand
                break
        time.sleep(0.1)

    out = {
        "elapsed_sec": elapsed,
        "shuffle_bytes_written": None,
        "shuffle_records_written": None,
    }
    if last is None:  # listener bus never drained; report timing only
        return out

    values = store.executionMetrics(last.executionId())
    bytes_total = 0.0
    records_total = 0.0
    seen: set[int] = set()
    descs = last.metrics().iterator()
    while descs.hasNext():
        m = descs.next()
        name = m.name()
        if name not in ("shuffle bytes written", "shuffle records written"):
            continue
        accid = m.accumulatorId()
        if accid in seen:  # one accumulator, many plan-node displays
            continue
        seen.add(accid)
        opt = values.get(accid)
        if not opt.isDefined():
            continue
        total = _metric_total(opt.get())
        if name == "shuffle bytes written":
            bytes_total += total
        else:
            records_total += total
    out["shuffle_bytes_written"] = int(bytes_total)
    out["shuffle_records_written"] = int(records_total)
    return out
