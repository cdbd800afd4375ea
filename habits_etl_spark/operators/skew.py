"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; explicit salting is the deterministic fallback when one key carries
an outsized share (the classic "null key" / "whale user" problem at
100 TB). The hot side gets a salt in [0, n); the small side is replicated
n ways; the join key becomes (key, salt) so the hot key's rows spread
over n reducers.

Correctness bound: because the small side is replicated n_salts ways, the
operator is only sound for join types where unmatched SMALL-side rows are
never emitted (inner / left-outer / left-semi from the big side). A
right/full/left-anti-from-small join would emit each unmatched small row
once per replica — ``salted_join`` rejects those.

Salt derivation: pass ``salt_source`` (a stable column of ``big``) to get
a hash-derived salt that is deterministic and retry-safe — a failed task
recomputes the same salt. The fallback salts by
``monotonically_increasing_id()``, which depends on partition layout: the
JOIN RESULT is still correct for the allowed join types (every big row
matches the same small rows whatever its salt), but the salt assignment
itself is not stable across retries/re-reads, so prefer ``salt_source``
when downstream logic observes physical placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALLOWED_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``key`` with an n-way salt.

    ``how`` must keep the replicated small side un-emittable when
    unmatched: one of {'inner', 'left', 'left_outer', 'left_semi'}.
    ``salt_source``: a column of ``big`` whose hash spreads rows; required
    for a retry-stable salt assignment (see module docstring).
    """
    if how not in _ALLOWED_HOW:
        raise ValueError(
            f"salted_join: how={how!r} is unsupported — the small side is "
            f"replicated {n_salts}x, so join types that emit unmatched "
            f"small-side rows (right/full/anti-from-small) would duplicate "
            f"them. Allowed: inner, left, left_outer, left_semi."
        )
    salt_col = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    big_salted = big.withColumn("__salt", salt_col.cast("int"))
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_salted.join(small_salted, [key, "__salt"], how)
    return out.drop("__salt")
