"""Value coercion / normalization expressions (reference etl/transform.py:71-113)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from habits_etl_spark.config import TRUTHY


def bool_coerce_expr(c: Column, invert: bool = False) -> Column:
    """Truthy-set boolean -> 0.0/1.0, optional invert
    (reference etl/transform.py:96-99): lower(trim(v)) in
    {yes,true,1,y,t,on} => 1.0 else 0.0; invert => 1.0 - v."""
    v = F.when(F.lower(F.trim(c.cast("string"))).isin(*TRUTHY), F.lit(1.0)).otherwise(F.lit(0.0))
    return (F.lit(1.0) - v) if invert else v


def number_coerce_expr(c: Column) -> Column:
    """float(str(v).strip()) with parse failure => NULL (caller filters),
    reference etl/transform.py:100-104. try_cast keeps this ANSI-safe."""
    return F.trim(c.cast("string")).try_cast("double")


def email_normalize_expr(c: Column) -> Column:
    """str(v).strip().lower() (reference etl/transform.py:81)."""
    return F.lower(F.trim(c.cast("string")))


def notes_concat_expr(df_cols: dict[str, Column]) -> Column:
    """Labeled multi-column concat: '"Col: val"' joined by ' | ', all-empty
    => NULL (reference etl/transform.py:83-87). ``df_cols`` maps the label
    (source column name) to its Column."""
    parts = [
        F.when(
            c.isNotNull() & (F.trim(c.cast("string")) != ""),
            F.concat(F.lit(f"{name}: "), c.cast("string")),
        )
        for name, c in df_cols.items()
    ]
    if not parts:
        return F.lit(None).cast("string")
    joined = F.concat_ws(" | ", *parts)
    return F.nullif(joined, F.lit(""))


def blank_cell_filter_expr(c: Column) -> Column:
    """True when the cell is non-empty after trim (reference etl/transform.py:92-94)."""
    return c.isNotNull() & (F.trim(c.cast("string")) != "")
