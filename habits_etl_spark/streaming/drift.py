"""Custom stateful streaming operator: windowed PSI drift monitoring
against a frozen reference distribution (``applyInPandasWithState``).

The streaming twin of plans/experiment.py::agg_psi_drift — a scoring
service freezes its reference decile edges at deploy time and wants the
Population Stability Index of LIVE traffic per event-time window,
updated as micro-batches arrive, without re-reading history. State per
window is one fixed-size bin-count vector, so memory is
O(windows × bins) regardless of stream length, and the operator
composes with checkpointing/RocksDB like the other stateful ops here
(streaming/anomaly.py, heavy_hitters.py).

Semantics: each emitted row is the monitored window's CURRENT PSI
snapshot (recomputed from exact accumulated counts after folding the
micro-batch in), so downstream alerting always reads a PSI over
everything seen so far for that window — identical, by construction, to
the batch PSI over the same rows (tests/test_stream_drift.py asserts
this equivalence and state carry-over across restarts).

Scale: bin assignment happens map-side against the broadcast edge list
BEFORE the stateful exchange, so the shuffle carries (window, bin)
rather than raw values; state updates are per-window vector adds.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "window_start TIMESTAMP, n_events LONG, psi DOUBLE, n_bins INT"


def compute_psi(act_counts: Sequence[int], ref_counts: Sequence[int]) -> float:
    """PSI with add-one smoothing over a fixed bin grid — the single
    formula shared by the streaming operator, the batch oracle shape
    (plans/experiment.py) and the test reference.

    ENGINE-PORTABLE reduction: each per-bin term is a plain IEEE double,
    but the cross-bin sum folds every term onto the 1e-12 grid and adds
    the grid units as exact integers, so the result is order-invariant
    and equals ``sum(CAST(term AS DECIMAL(28,12)))`` in DuckDB — what
    lets stream_drift_e2e hash-gate the operator's snapshots against a
    pure-SQL oracle (the agg_psi_drift pattern).

    The grid fold is ``round(term * 1e12)`` — half-even on the DOUBLE
    product, Python's built-in float round — because that is what
    DuckDB's double→DECIMAL(28,12) cast actually computes for |term| <
    2^53/1e12 ≈ 9e3 (PSI terms are < ~35 by construction: |Δp| < 1 and
    |ln ratio| < ln(1e9)). The previous shortest-repr HALF_UP rule
    (Spark's cast semantics) differs from DuckDB's on knife-edge terms
    whose repr and binary value straddle a grid midpoint — the r11
    ADVICE class, eliminated by quantizing the identical product double
    under the identical rule on both sides
    (tests/test_stream_oracle_parity.py pins this end to end)."""
    k = len(ref_counts)
    t_act = sum(act_counts) + k
    t_ref = sum(ref_counts) + k
    units = 0  # exact integer sum of 1e-12 grid units
    for a, r in zip(act_counts, ref_counts):
        p_act = (a + 1.0) / t_act
        p_ref = (r + 1.0) / t_ref
        term = (p_act - p_ref) * math.log(p_act / p_ref)
        units += round(term * 1e12)
    return float(Decimal(units) * Decimal("1e-12"))


def psi_round6(psi: float) -> float:
    """Round a PSI double to 6 dp with HALF_UP on its shortest decimal
    repr — bit-matching Spark's ``F.round(col, 6)`` (BigDecimal HALF_UP)
    and DuckDB's ``round(x, 6)``, where Python's built-in ``round``
    (half-even) can land one ulp away on ties."""
    return float(Decimal(repr(psi)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


def _make_update(ref_counts: list[int]):
    n_bins = len(ref_counts)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        counts = list(state.get) if state.exists else [0] * n_bins
        (win_start,) = key
        for pdf in pdfs:
            # vectorized fold: bins are 1-indexed ints in [1, n_bins]
            batch = np.bincount(
                pdf["bin"].to_numpy(dtype=int) - 1, minlength=n_bins
            )
            for i in range(n_bins):
                counts[i] += int(batch[i])
        state.update(tuple(int(c) for c in counts))
        yield pd.DataFrame(
            [
                (
                    win_start,
                    int(sum(counts)),
                    psi_round6(compute_psi(counts, ref_counts)),
                    n_bins,
                )
            ],
            columns=["window_start", "n_events", "psi", "n_bins"],
        )

    return update


def psi_drift_stream(
    events_stream,
    edges: Sequence[float],
    ref_counts: Sequence[int],
    window_duration: str = "1 day",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """events_stream: streaming DF with at least (ts, value). ``edges``
    are the frozen reference bin edges (len = n_bins − 1, ascending;
    value v lands in bin 1 + |{e : v > e}|) and ``ref_counts`` the
    reference histogram over the same grid. Returns the stream of
    per-window PSI snapshots (one row per touched window per batch)."""
    edges = [float(e) for e in edges]
    if sorted(edges) != edges:
        raise ValueError("edges must be ascending")
    if len(ref_counts) != len(edges) + 1:
        raise ValueError("need len(edges) + 1 reference bin counts")
    bin_col = F.lit(1)
    for e in edges:
        bin_col = bin_col + F.when(F.col("value") > F.lit(e), 1).otherwise(0)
    binned = events_stream.select(
        F.window(F.col(ts_col), window_duration).start.alias("window_start"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("value").isNotNull()).select(
        "window_start", bin_col.cast("int").alias("bin")
    )
    # state = one LONG column per bin (fixed-width row, no array codec)
    state_schema = ", ".join(f"c{i} LONG" for i in range(len(ref_counts)))
    return binned.groupBy("window_start").applyInPandasWithState(
        _make_update([int(c) for c in ref_counts]),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
