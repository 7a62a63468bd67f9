"""Exact (decimal) aggregation helpers.

Floating-point sums depend on accumulation order, which differs
between engines, partitionings, and runs — a problem both for
cross-engine verification and for reproducible pipelines at scale
(a 100 TB sum re-partitioned differently should not drift). The fix:
cast inputs to a decimal of their natural scale (the synthetic money
columns carry 2 decimal places), aggregate exactly — decimal addition
is associative — and cast the final result back to double. The result
is bit-identical for any partitioning and any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scales are kept tight so chained decimal products never exceed
# precision 38 (where engines would start rounding, and rounding
# rules differ): (12,2) * (5,2) * (5,2) → (24,6), exact everywhere.
MONEY = "decimal(12,2)"  # prices, balances, event values
RATE = "decimal(4,2)"  # discounts, taxes (0.00-1.00)


def dec(col: Column | str, scale: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(scale)


def dsum(col: Column | str, scale: str = MONEY) -> Column:
    """Order-insensitive exact sum, returned as double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: str = MONEY) -> Column:
    """Exact-sum average: double(exact decimal sum) / count.

    Spark's avg(decimal) widens scale and DuckDB's returns double;
    computing sum/count explicitly gives an expression both engines
    evaluate identically.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def round_milli(x):
    """Half-AWAY-FROM-ZERO rounding of ``x * 1000`` for Python-side
    (pandas/numpy) operators — the same tie rule Spark's ``round`` and
    DuckDB's ``round`` apply, which ``np.round`` does NOT (banker's).
    Load-bearing for oracle parity in every exact-stateful operator
    (EWMA, Holt, streaming EWMA); keep ONE definition so no copy ever
    drifts back to ``np.round``. Accepts a numpy array (returns int64
    array) or a float scalar (returns int)."""
    import numpy as np

    p = x * 1000.0
    if isinstance(p, np.ndarray):
        return (np.sign(p) * np.floor(np.abs(p) + 0.5)).astype("int64")
    import math

    return int(math.copysign(math.floor(abs(p) + 0.5), p))
