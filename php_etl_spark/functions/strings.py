"""String helpers with reference-exact semantics.

The reference's string library is /root/reference/sdk/lib/str.php;
two functions there have edge-case behavior that Spark's
``substring_index`` does not reproduce, so they are built from
``instr``/``substr`` with explicit guards. All of this stays in
Catalyst expression land (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# PHP FILTER_VALIDATE_EMAIL approximation used to gate user-detail
# inserts (/root/reference/sdk/migrate_assure_users.php:195).
EMAIL_RE = r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+$"


def str_before(col: Column | str, sep: str) -> Column:
    """Substring before the first occurrence of ``sep``.

    Reference parity (/root/reference/sdk/lib/str.php:11-17): PHP's
    ``strpos`` returns 0 for a match at the start, which the reference
    treats as falsy — so a separator at position 0 yields ``''`` just
    like a missing separator. ``instr`` is 1-based: miss → 0, match at
    start → 1; both map to the empty string.
    """
    c = F.col(col) if isinstance(col, str) else col
    pos = F.instr(c, sep)
    return F.when(pos <= 1, F.lit("")).otherwise(F.substring(c, 1, pos - 1))


def str_after(col: Column | str, sep: str) -> Column:
    """Substring after the first occurrence of ``sep``; ``''`` when the
    separator is absent (/root/reference/sdk/lib/str.php:25-31).
    Unlike ``str_before``, a match at position 0 is handled normally.
    """
    c = F.col(col) if isinstance(col, str) else col
    pos = F.instr(c, sep)
    return F.when(pos == 0, F.lit("")).otherwise(
        c.substr(pos + len(sep), F.length(c))
    )


def dedup_key(col: Column | str) -> Column:
    """Normalized uniqueness key for first-wins dedup.

    Reference parity (/root/reference/sdk/src/ETLTask.php:50-52):
    string values are compared trimmed ("SQL considers
    'A MODIFIER   ' === 'A MODIFIER'") while numeric values are
    compared raw. ``try_cast`` to double is the ``is_numeric`` test.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return F.when(s.try_cast("double").isNotNull(), s).otherwise(F.trim(s))


def email_valid(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(EMAIL_RE)
