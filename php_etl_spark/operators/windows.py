"""Window-function operators (SURVEY.md §2.6 — capability
extensions; the reference has no OVER clauses, its closest analogue
being the 5-datapoint moving rate estimator at
/root/reference/sdk/lib/progress.php:424-446).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from php_etl_spark.functions.exact import dec


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
) -> DataFrame:
    """row_number()-filtered top-k; callers must make order_by a total
    order (include a unique tiebreak) for deterministic output."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rank_in_group")
    )


def moving_avg(
    df: DataFrame,
    value: str,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    window_rows: int = 5,
    out: str = "moving_avg",
) -> DataFrame:
    """Trailing N-row mean (mirrors the reference's 5-point rate
    window). Sum runs over decimal-cast values so the result does not
    depend on the accumulation order inside the frame."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.withColumn(
        out,
        (F.sum(dec(value)).over(w).cast("double") / F.count(value).over(w)),
    )
