"""Predicate helpers (SURVEY.md §2.3).

The reference accepts raw WHERE fragments pushed to the scan
(/root/reference/sdk/etl.php:141) and a conjunction mini-language of
``"col op value"`` terms (SQLTable::exists,
/root/reference/sdk/src/SQLTable.php:52-79). Both become Catalyst
expressions here, so they push down to the parquet/JDBC scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TERM = re.compile(
    r"^\s*(?P<col>[A-Za-z_][A-Za-z0-9_.]*)\s*"
    r"(?P<op><>|!=|>=|<=|=|>|<|like|not like|in)\s*"
    r"(?P<value>.+?)\s*$",
    re.IGNORECASE,
)

_OPS = {
    "=": lambda c, v: c == v,
    "<>": lambda c, v: c != v,
    "!=": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
}


def _coerce(value: str):
    v = value.strip()
    if (v.startswith("'") and v.endswith("'")) or (
        v.startswith('"') and v.endswith('"')
    ):
        return v[1:-1]
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    if v.lower() == "null":
        return None
    return v


def parse_predicate(term: str) -> Column:
    """``"col op value"`` → Column (SQLTable::exists term parser
    parity, /root/reference/sdk/src/SQLTable.php:60-64; the reference
    splits on whitespace into exactly col/op/value)."""
    m = _TERM.match(term)
    if not m:
        # fall back to full Spark SQL expression (the reference's raw
        # `query` WHERE fragment path, sdk/etl.php:141)
        return F.expr(term)
    col, op, raw = m.group("col"), m.group("op").lower(), m.group("value")
    c = F.col(col)
    value = _coerce(raw)
    if op in _OPS:
        if value is None:
            return c.isNull() if op == "=" else c.isNotNull()
        return _OPS[op](c, F.lit(value))
    if op == "like":
        return c.like(str(value))
    if op == "not like":
        return ~c.like(str(value))
    if op == "in":
        items = [_coerce(x) for x in str(raw).strip("()").split(",")]
        return c.isin(items)
    raise ValueError(f"unsupported operator in predicate: {term!r}")


def parse_conjunction(*terms: str) -> Column:
    """AND-join a list of terms, as SQLTable::exists does
    (/root/reference/sdk/src/SQLTable.php:67)."""
    if not terms:
        return F.lit(True)
    out = parse_predicate(terms[0])
    for t in terms[1:]:
        out = out & parse_predicate(t)
    return out


def where(df: DataFrame, *terms: str) -> DataFrame:
    return df.filter(parse_conjunction(*terms))
