"""Scalar Column-expression builders (no Python UDFs in the core path)."""

from habits_etl_spark.functions.datetime_ops import (  # noqa: F401
    parse_report_date_expr,
    parse_serial_date_expr,
    noon_anchor_utc_expr,
)
from habits_etl_spark.functions.coerce import (  # noqa: F401
    bool_coerce_expr,
    number_coerce_expr,
    email_normalize_expr,
    notes_concat_expr,
)
from habits_etl_spark.functions.hashing import row_hash_expr, canonical_hash_expr  # noqa: F401
