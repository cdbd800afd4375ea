"""Date/time parsing as pure Column expressions.

Reproduces the reference's ``parse_report_date`` cascade
(reference etl/transform.py:20-68) without any Python UDF:

1. Google/Excel **serial numbers** — days since 1899-12-30 plus a
   fractional-day time component; a zero time component means "date only"
   and is anchored to **local noon** (reference etl/transform.py:25-34).
2. **Date-only strings** — ``M/d/yyyy``, ``yyyy-M-d``, ``M/d/yy``, then
   month names ``MMM d, yyyy`` / ``MMMM d, yyyy`` — anchored to local noon
   (reference etl/transform.py:38-55, README.md:215: noon anchoring avoids
   DST day-boundary cliffs).
3. **Datetime strings** — ``yyyy-M-d H:m:s``, ``M/d/yyyy H:m``,
   ``M/d/yyyy H:m:s`` — interpreted as local wall time
   (reference etl/transform.py:57-62).
4. **ISO-8601 fallback** — offset-aware strings keep their offset; naive
   strings are interpreted as local wall time (reference etl/transform.py:64-68).

Everything returns a UTC instant (TimestampType with session tz UTC).
``try_to_timestamp`` returns NULL on mismatch, so ``coalesce`` reproduces
the reference's try/except cascade *in the same precedence order* — and the
whole thing stays inside whole-stage codegen.

Known intentional divergence: Python's ``%Y`` accepts 2-digit years (so the
reference parses ``"8/22/25"`` as year 25 via the first pattern); Java's
``yyyy`` requires 4 digits, so this engine parses it as 2025 via ``M/d/yy``
— strictly saner behavior for the same input class.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SERIAL_EPOCH = "1899-12-30"  # Google/Excel day-serial epoch (reference etl/transform.py:27)

# Java DateTimeFormatter patterns, in the reference's precedence order.
_DATE_ONLY_PATTERNS = ("M/d/yyyy", "yyyy-M-d", "M/d/yy", "MMM d, yyyy", "MMMM d, yyyy")
_DATETIME_PATTERNS = ("yyyy-M-d H:m:s", "M/d/yyyy H:m", "M/d/yyyy H:m:s")

# A numeric literal (possibly fractional) => Google serial date.
_SERIAL_RE = r"^[0-9]+(\.[0-9]+)?$"
# Explicit UTC offset or Z suffix => ISO instant, don't re-localize.
_OFFSET_RE = r"(Z|[+-][0-9]{2}:?[0-9]{2})$"


def noon_anchor_utc_expr(d: Column, tz: str) -> Column:
    """date -> timestamp at 12:00 *local* converted to UTC
    (reference etl/transform.py:41-43)."""
    local_noon = F.to_timestamp(d) + F.expr("INTERVAL 12 HOURS")
    return F.to_utc_timestamp(local_noon, tz)


def parse_serial_date_expr(c: Column, tz: str) -> Column:
    """Google serial number (string or numeric column) -> UTC timestamp.

    days = int(s); seconds = round(frac * 86400); seconds == 0 => noon
    anchor (reference etl/transform.py:26-34). Arithmetic is done on the
    naive local wall clock then converted, matching Python's
    wall-clock timedelta arithmetic on a ZoneInfo-aware datetime.
    """
    v = c.cast("double")
    days = F.floor(v).cast("long")
    seconds = F.round((v - F.floor(v)) * F.lit(86400)).cast("long")
    base = F.to_timestamp(F.lit(SERIAL_EPOCH))
    with_time = F.timestamp_add("SECOND", seconds, F.timestamp_add("DAY", days, base))
    noon = F.timestamp_add("HOUR", F.lit(12), F.timestamp_add("DAY", days, base))
    local = F.when(seconds == 0, noon).otherwise(with_time)
    return F.to_utc_timestamp(local, tz)


def parse_report_date_expr(c: Column, tz: str) -> Column:
    """Full multi-format cascade -> UTC timestamp (NULL if nothing matched).

    Order matches reference etl/transform.py: serial, date-only formats
    (noon-anchored), month names (noon-anchored), datetime formats
    (local wall time), ISO fallback.
    """
    s = F.trim(c.cast("string"))

    date_only = F.coalesce(*[F.try_to_timestamp(s, F.lit(p)) for p in _DATE_ONLY_PATTERNS])
    date_only_utc = F.to_utc_timestamp(date_only + F.expr("INTERVAL 12 HOURS"), tz)

    dt_local = F.coalesce(*[F.try_to_timestamp(s, F.lit(p)) for p in _DATETIME_PATTERNS])
    dt_utc = F.to_utc_timestamp(dt_local, tz)

    # ISO fallback: offset-aware strings are parsed as instants (Spark
    # converts to session time UTC); naive ISO strings are local wall time.
    iso = F.try_to_timestamp(s)
    iso_utc = F.when(s.rlike(_OFFSET_RE), iso).otherwise(F.to_utc_timestamp(iso, tz))

    return F.when(s.rlike(_SERIAL_RE), parse_serial_date_expr(s, tz)).otherwise(
        F.coalesce(date_only_utc, dt_utc, iso_utc)
    )
