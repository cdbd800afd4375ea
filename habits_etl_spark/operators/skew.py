"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; explicit salting is the deterministic fallback when one key carries
an outsized share (the classic "null key" / "whale user" problem at
100 TB). The hot side gets a random-ish salt in [0, n); the small side is
replicated n ways; the join key becomes (key, salt) so the hot key's rows
spread over n reducers.

Salt derivation is hash-based (pmod of a stable hash of a tiebreaker
column), not rand(), so the operator stays deterministic and retry-safe —
a failed task re-computes the same salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``key`` with an n-way salt.

    ``salt_source``: a column of ``big`` whose hash spreads rows (defaults
    to the whole row via monotonically varying partition/offset hash).
    """
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
