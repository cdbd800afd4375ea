"""Property test: the DataFrame funnel must agree with an exact per-user
Python simulation on arbitrary small event streams (the fixture saturates
stage 1, so tests/test_analytics.py alone cannot catch ordering or
window-bound mistakes)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from habits_etl_spark.plans.analytics import funnel_stages

_STAGES = ("a", "b", "c")
_STEP_US = 3_600 * 1_000_000  # 1 h window for the generated streams
_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

_event = st.tuples(
    st.integers(min_value=0, max_value=4),          # user_id
    st.integers(min_value=0, max_value=5_000),      # seconds offset
    st.sampled_from(_STAGES),                        # event_type
)


def _simulate(events):
    """Exact first-touch funnel: per user, t1 = min a-instant; t_{k+1} =
    min instant of stage k+1 in (t_k, t_k + step]."""
    reached = {1: set(), 2: set(), 3: set()}
    users = {u for u, _, _ in events}
    for u in users:
        per = [sorted(sec for uu, sec, et in events if uu == u and et == s)
               for s in _STAGES]
        if not per[0]:
            continue
        t = per[0][0]
        reached[1].add(u)
        for k in (1, 2):
            nxt = [s for s in per[k] if t < s <= t + _STEP_US // 1_000_000]
            if not nxt:
                break
            t = nxt[0]
            reached[k + 1].add(u)
    return [len(reached[1]), len(reached[2]), len(reached[3])]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_event, min_size=0, max_size=40))
def test_funnel_matches_simulation(spark, events):
    expected = _simulate(events)
    if not events:
        rows = []
    else:
        df = spark.createDataFrame(
            [(u, _T0 + timedelta(seconds=sec), et) for u, sec, et in events],
            "user_id long, ts timestamp, event_type string",
        )
        frames = funnel_stages(df, _STAGES, _STEP_US)
        rows = [f.count() for f in frames]
    assert (rows or [0, 0, 0]) == expected, (rows, expected)
