"""Deterministic content hashing (reference etl/transform.py:16-18).

The reference hashes ``json.dumps(row, sort_keys=True, ensure_ascii=False)``
with SHA-256. The engine equivalent sorts struct fields by name *before*
``to_json`` (Spark preserves struct field order in JSON output), giving a
stable canonical form for arbitrary-width rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_hash_expr(df: DataFrame, cols: list[str] | None = None) -> Column:
    """SHA-256 hex digest of the row's JSON form with sorted keys."""
    names = sorted(cols if cols is not None else df.columns)
    return F.sha2(F.to_json(F.struct(*[F.col(n) for n in names])), 256)


def canonical_hash_expr(*cols: Column) -> Column:
    """SHA-256 over a '\\x1f'-joined canonical string of the given columns —
    an engine-portable variant (same result in any engine with sha256 +
    concat) used where cross-engine hash equality matters."""
    parts = [F.coalesce(c.cast("string"), F.lit("\x00")) for c in cols]
    return F.sha2(F.concat_ws("\x1f", *parts), 256)
