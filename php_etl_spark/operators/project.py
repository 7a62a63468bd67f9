"""Projection / column-mapping spec compiler (SURVEY.md §2.2).

The reference's config maps destination columns from source columns,
literals, or the ``NOW()`` marker, in two spellings
(/root/reference/sdk/etl.php:10-30,112-125 and
/root/reference/sdk/src/ETLTask.php:39-55,81-84):

- list form:   ``["dst <- [src]", "flag <- 1"]``
- mapping form: ``{"dst": "[src]", "flag": "1", "at": "NOW()"}``

Value forms: ``[col]`` → source column; ``NOW()`` → run timestamp;
anything else → literal. This module compiles a spec straight to
``Column`` expressions — the whole per-row loop of ETLTask::run
becomes one ``select``.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ARROW = re.compile(r"^\s*(?P<dst>.+?)\s*<-\s*(?P<src>.+?)\s*$")
_BRACKET = re.compile(r"^\[\s*(?P<col>[^\[\]]+?)\s*\]$")


def normalize_spec(spec: Mapping[str, str] | Iterable[str]) -> dict[str, str]:
    """Normalize both config spellings to a ``{dst: value}`` dict.

    List entries use the ``dst <- value`` arrow syntax
    (/root/reference/sdk/etl.php:18-26); a bare entry with no arrow
    maps a column to itself.
    """
    if isinstance(spec, Mapping):
        return {str(k).strip(): str(v).strip() for k, v in spec.items()}
    out: dict[str, str] = {}
    for item in spec:
        m = _ARROW.match(item)
        if m:
            out[m.group("dst")] = m.group("src")
        else:
            token = item.strip()
            b = _BRACKET.match(token)
            col = b.group("col") if b else token
            out[col] = f"[{col}]"
    return out


def value_expr(value: str) -> Column:
    """One mapping value → Column (ETLTask::getPropertyValue parity,
    /root/reference/sdk/src/ETLTask.php:81-84)."""
    b = _BRACKET.match(value)
    if b:
        return F.col(b.group("col"))
    if value.upper() == "NOW()":
        # per-query-constant vs PHP's per-task constant — same
        # observable effect for one batch run
        return F.current_timestamp()
    # literal: ints/floats kept numeric, else string
    try:
        return F.lit(int(value))
    except ValueError:
        pass
    try:
        return F.lit(float(value))
    except ValueError:
        pass
    return F.lit(value)


def compile_mapping(spec: Mapping[str, str] | Iterable[str]) -> list[Column]:
    normalized = normalize_spec(spec)
    return [value_expr(v).alias(dst) for dst, v in normalized.items()]


def apply_mapping(df: DataFrame, spec: Mapping[str, str] | Iterable[str]) -> DataFrame:
    """Apply a mapping spec as a single select (projection pushdown:
    only ``[col]`` sources are read from the scan)."""
    return df.select(*compile_mapping(spec))


def source_columns(spec: Mapping[str, str] | Iterable[str]) -> list[str]:
    """The source columns a spec reads — the reference extracts these
    to build its SELECT list (/root/reference/sdk/etl.php:114-125)."""
    cols = []
    for v in normalize_spec(spec).values():
        b = _BRACKET.match(v)
        if b:
            cols.append(b.group("col"))
    return cols
