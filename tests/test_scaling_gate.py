"""The committed sf1 scaling gate (r13, VERDICT r12 #3).

The r12 sweep surfaced four real scale defects (quadratic band space,
GF(2)-degenerate planes, interpreted projection kernel, 1.5B-row join
shape) that every smaller gate was green over — so the sweep itself must
be un-losable: reproducible from the repo alone and pinned against
regression.

`pytest -m scaling` (skipped in the default run — see conftest):
1. regenerates `.scratch/sf1` with tools/make_scaled_fixture.build if it
   is absent or incomplete (the generator is deterministic, so a fresh
   clone reproduces the exact fixture the pins were measured on),
2. runs the full tools/run_scaling sweep (fresh session per witness,
   best-of-reps), rewrites SCALING.md,
3. FAILS if any witness's exponent exceeds its PINNED_EXPONENTS entry by
   more than PIN_TOLERANCE, if a witness errors, or if a witness has no
   pin (a new witness must be pinned the round it lands).
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scratch", "sf1")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _fixture_complete() -> bool:
    # Spark writes each table as a directory with a _SUCCESS marker; a
    # directory WITHOUT the marker is an interrupted write and must be
    # regenerated, not trusted.
    for t in TABLES:
        p = os.path.join(SF1, f"{t}.parquet")
        if not os.path.exists(p):
            return False
        if os.path.isdir(p) and not os.path.exists(os.path.join(p, "_SUCCESS")):
            return False
    return True


@pytest.mark.scaling
def test_sf1_sweep_exponents_hold():
    import make_scaled_fixture
    import run_scaling

    if not _fixture_complete():
        make_scaled_fixture.build(SF01, 10, SF1)
    assert _fixture_complete(), "fixture generation left tables missing"

    results = run_scaling.sweep(SF01, SF1, reps=3)

    # Double-violation rule (the bench outlier-re-probe lesson applied to
    # the sweep): an exponent is a log-RATIO of two wall-clock times, so
    # on sub-10 s witnesses a single bursty-host window can swing it by
    # ~0.3 on identical plans (measured: join_q3_shipping 0.35 vs 0.70 in
    # two same-code sweeps hours apart). A witness over its pin is
    # re-swept once, solo, and the per-SF BEST of the two runs is kept —
    # a real regression is slow in both runs and still fails; churn that
    # fails once and passes once is absorbed, and both runs' numbers are
    # in the committed SCALING.md history via git.
    first = run_scaling.check_pins(results)
    if first:
        suspects = [
            v.split(":")[0] for v in first if v.split(":")[0] in results
        ]
        if suspects:
            rerun = run_scaling.sweep(SF01, SF1, reps=3, names=suspects)
            for name, row in rerun.items():
                old = results.get(name, {})
                if "error" in row:
                    continue
                merged = {}
                for sf in ("sf0.1", "sf1"):
                    pairs = [r[sf] for r in (old, row) if sf in r]
                    # both runs may lack one SF (e.g. each errored on sf1
                    # only, leaving a partial row): min([]) would raise
                    # here and kill the gate with an unrelated traceback
                    # instead of letting check_pins report the witness as
                    # missing data (ADVICE r13)
                    if pairs:
                        merged[sf] = min(pairs, key=lambda p: p[0])
                results[name] = merged

    md = run_scaling.render(results, SF1, reps=3)
    with open(os.path.join(REPO, "SCALING.md"), "w") as fh:
        fh.write(md)

    violations = run_scaling.check_pins(results)
    assert not violations, "scaling regressions (each failed TWICE):\n" + "\n".join(
        violations
    )
