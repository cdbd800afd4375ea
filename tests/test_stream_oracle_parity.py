"""Property tests for the two cross-engine parity assumptions the r11
streaming oracles stand on (no Spark session — pure Python vs DuckDB):

1. stream_drift_e2e: ``compute_psi`` folds each IEEE PSI term onto the
   DECIMAL(28,12) grid and sums exactly, and ``psi_round6`` rounds
   HALF_UP — together these must equal DuckDB's
   ``round(CAST(sum(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6)``
   for ARBITRARY count vectors, or the oracle only passes by luck of
   the fixture.

2. stream_anomaly_e2e: the Python Welford fold (score-before-update,
   n/mean/m2 recurrence) keeps state BIT-IDENTICAL to the DuckDB
   recursive CTE that replays it — same IEEE ops in the same order —
   but the FINAL scoring expression ``(x-mean)/sqrt(m2/(n-1))`` is not
   ulp-portable on identical inputs (r11 counterexample
   ``xs=[0.0, 0.0, 1.0, 180.86111876312918]``, pinned below with
   ``@example``). The contract under test is therefore the QUANTIZED
   one both sides now implement: fold z onto a 1e-12 grid in pure
   double arithmetic — ``round(z * 1e12) / 1e12`` with half-away
   std::round, DuckDB's own round() (streaming/anomaly.py::quantize_z
   is the Python twin) — and the emitted doubles are repr-identical
   with no knife edge. A direct quantizer-vs-DuckDB property below
   pins the twin relation itself across magnitudes.

Hypothesis shrinks any counterexample to a minimal sequence, which is
exactly what a knife-edge rounding tie would need for a postmortem.
Example database + profiles: committed under tests/hypothesis_examples
(conftest.py registers ``default`` and a 500-example ``nightly``
profile; select with HYPOTHESIS_PROFILE=nightly)."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from habits_etl_spark.streaming.anomaly import quantize_z
from habits_etl_spark.streaming.drift import compute_psi, psi_round6

# Bounded, adversarially-shaped doubles: exact integers, dyadic
# fractions, decimal-looking values (0.1 family) and a few irrationals.
_VALUES = st.one_of(
    st.integers(min_value=-1000, max_value=1000).map(float),
    st.floats(min_value=-500.0, max_value=500.0, allow_nan=False, width=64),
    st.sampled_from([0.1, 0.2, 0.3, 1e-9, 123.456, 490.02, 0.005]),
)


@settings(deadline=None)
@given(
    act=st.lists(st.integers(min_value=0, max_value=10**9), min_size=2, max_size=16),
    ref=st.lists(st.integers(min_value=0, max_value=10**6), min_size=2, max_size=16),
)
def test_psi_decimal_fold_matches_duckdb(act, ref):
    k = min(len(act), len(ref))
    act, ref = act[:k], ref[:k]
    got = psi_round6(compute_psi(act, ref))

    t_act = sum(act) + k
    t_ref = sum(ref) + k
    rows = ", ".join(f"({i}, {a}, {r})" for i, (a, r) in enumerate(zip(act, ref)))
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH bins(i, a, r) AS (VALUES {rows}),
        terms AS (
          SELECT ((a + 1.0) / {t_act} - (r + 1.0) / {t_ref})
                 * ln(((a + 1.0) / {t_act}) / ((r + 1.0) / {t_ref})) AS term
          FROM bins
        )
        SELECT round(CAST(sum(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6)
        FROM terms
        """
    ).fetchone()[0]
    assert got == want, (act, ref, got, want)


@settings(deadline=None)
@given(xs=st.lists(_VALUES, min_size=1, max_size=40))
@example(xs=[0.0, 0.0, 1.0, 180.86111876312918])  # the r11 1-ulp counterexample
def test_welford_fold_matches_recursive_cte_bitwise(xs):
    min_n, threshold = 3, 1.5

    # Python fold — the operator's exact loop (streaming/anomaly.py),
    # including the quantize_z grid fold the operator applies on emit
    n, mean, m2 = 0, 0.0, 0.0
    py_rows = []
    for i, x in enumerate(xs):
        if n >= min_n:
            var = m2 / (n - 1)
            if var > 0:
                z = quantize_z((x - mean) / math.sqrt(var))
                py_rows.append((i, z, n))
        n += 1
        d = x - mean
        mean += d / n
        m2 += d * (x - mean)

    # embed every value as a string->double cast: a bare VALUES literal
    # is typed DECIMAL first, which drops the sign of -0.0 (and strtod
    # round-trips the shortest repr exactly)
    vals = ", ".join(f"({i + 1}, CAST('{x!r}' AS DOUBLE))" for i, x in enumerate(xs))
    con = duckdb.connect()
    duck_rows = con.execute(
        f"""
        WITH RECURSIVE vals(rn, x) AS (VALUES {vals}),
        seq AS (
          SELECT CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS n,
                 CAST(0.0 AS DOUBLE) AS mean, CAST(0.0 AS DOUBLE) AS m2,
                 CAST(NULL AS DOUBLE) AS x, CAST(NULL AS DOUBLE) AS z,
                 CAST(NULL AS BIGINT) AS n_history
          UNION ALL
          SELECT v.rn, s.n + 1,
                 s.mean + (v.x - s.mean) / (s.n + 1),
                 s.m2 + (v.x - s.mean)
                      * (v.x - (s.mean + (v.x - s.mean) / (s.n + 1))),
                 v.x,
                 CASE WHEN s.n >= {min_n} AND s.m2 / (s.n - 1) > 0
                      THEN round((v.x - s.mean) / sqrt(s.m2 / (s.n - 1))
                                 * 1000000000000.0) / 1000000000000.0 END,
                 s.n
          FROM seq s JOIN vals v ON v.rn = s.rn + 1
        )
        SELECT rn - 1, z, n_history FROM seq WHERE z IS NOT NULL ORDER BY rn
        """
    ).fetchall()

    # every scored row must agree BIT-FOR-BIT (repr equality is how the
    # correctness harness hashes doubles)
    py_scored = {i: (repr(z), h) for i, z, h in py_rows}
    duck_scored = {i: (repr(z), h) for i, z, h in duck_rows}
    assert py_scored == duck_scored, (xs, py_scored, duck_scored)


def test_psi_round6_half_up_on_knife_edge():
    """The exact tie class Python's built-in round() gets wrong:
    HALF-UP must round .5 grid points away from zero like Spark's
    F.round/BigDecimal and DuckDB's round()."""
    assert psi_round6(0.0000005) == 0.000001
    assert psi_round6(0.0000015) == 0.000002  # round() would give same
    assert psi_round6(0.0000025) == 0.000003  # round() gives 0.000002
    assert psi_round6(-0.0000025) == -0.000003


def test_psi_round6_matches_duckdb_on_grid_ties():
    con = duckdb.connect()
    for v in [0.0000025, 0.0000035, 1.9999995, -0.0000025, 123.4567895]:
        want = con.execute(f"SELECT round(CAST({v!r} AS DOUBLE), 6)").fetchone()[0]
        assert psi_round6(v) == want, v


# Arbitrary finite doubles across the full magnitude range — the
# quantizer twin must hold EVERYWHERE, not just at z-score scales
# (the DECIMAL(28,12)-cast approach failed exactly this: DuckDB's
# double->decimal conversion switches strategy with magnitude).
_ANY_DOUBLE = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.integers(min_value=-10**6, max_value=10**6).map(float),
    # product-level ties (k * 2^-13 * 1e12 is exactly representable and
    # exactly half-grid) and classic shortest-repr adversaries
    st.integers(min_value=-64, max_value=64).map(lambda k: (2 * k + 1) * 2.0**-13),
    st.sampled_from(
        [0.1, 0.3, 1 / 3, 312.6832965422988, 312.6832965422989,
         5e-13, -5e-13, 4.9e-13, 0.49999999999999994e-12, -9986.928112437166]
    ),
)


@settings(deadline=None)
@given(z=_ANY_DOUBLE)
@example(z=312.6832965422988)
@example(z=312.6832965422989)
@example(z=-0.045)  # signed-zero result: std::round preserves the sign
def test_quantize_z_is_duckdb_round_twin(z):
    """streaming/anomaly.py::quantize_z must equal DuckDB's
    ``round(z * 1e12) / 1e12`` BIT-FOR-BIT for every finite double —
    this is the single cross-engine assumption stream_anomaly_e2e's
    hash gate stands on after the r11 1-ulp postmortem."""
    from habits_etl_spark.streaming.anomaly import quantize_z

    con = duckdb.connect()
    (want,) = con.execute(
        "SELECT round(CAST(? AS DOUBLE) * 1000000000000.0) / 1000000000000.0",
        [z],
    ).fetchone()
    assert repr(quantize_z(z)) == repr(want), (z, quantize_z(z), want)
