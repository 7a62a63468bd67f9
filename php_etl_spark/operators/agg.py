"""Aggregation / dedup operators (SURVEY.md §2.5).

The reference's only non-count aggregate is first-wins dedup on a
unique key with trim-normalized comparison
(/root/reference/sdk/src/ETLTask.php:34-53). PHP gets "first" for
free from cursor order; a distributed engine needs an explicit order,
so ``first_wins_dedup`` takes the ordering columns and runs a
``row_number() == 1`` window — deterministic under any partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from php_etl_spark.functions.strings import dedup_key


def first_wins_dedup(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    normalize: bool = True,
) -> DataFrame:
    """Keep the first row per unique key under an explicit order.

    ``normalize=True`` applies the reference's comparison rule: string
    keys are trimmed, numeric keys compared raw
    (/root/reference/sdk/src/ETLTask.php:50-52).
    """
    key_exprs = [
        (dedup_key(k) if normalize else F.col(k)).alias(f"__k_{k}") for k in keys
    ]
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*[e for e in key_exprs]).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exists(df: DataFrame) -> bool:
    """Driver-side existence check (ReadOnlyTable::exists,
    /root/reference/sdk/src/ReadOnlyTable.php:20-29) — early-exit via
    limit(1), not a full count."""
    return df.limit(1).count() > 0
