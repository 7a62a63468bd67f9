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


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact φ-heavy-hitters (φ = 1/k): every value occurring in MORE
    than n/k of the rows, with its exact count — the canonical
    "find the skewed keys" pass that sizes salting, hot-key caches,
    and stop-shingle cutoffs before the expensive jobs run.

    Two-phase plan (Misra-Gries 1982 + the mergeable-summaries trim of
    Agarwal et al., PODS 2012):

    1. One scan, zero shuffles: each partition keeps a ≤ (k-1)-entry
       Misra-Gries summary (``mapInPandas``; per Arrow batch the exact
       ``value_counts`` merges into the dict, then the k-th largest
       count is subtracted from every entry and non-positives drop —
       the mergeable-summaries compaction, vectorized instead of
       row-at-a-time decrements). Any value with global count > n/k
       must exceed n_p/k in at least one partition (pigeonhole), and
       an MG summary never evicts a value while its residual count is
       positive — so the union of partition survivors is a guaranteed
       SUPERSET of the true heavy hitters, at most (k-1)·partitions
       candidates total.
    2. The candidate set broadcasts into a semi-join, survivors get an
       exact recount (one groupBy on candidate keys only — the shuffle
       carries just the skewed keys' rows), and a strict
       ``count·k > n`` filter trims the superset to exactly the true
       heavy hitters. Phase 1's order-dependence cancels: whatever
       superset it emits, phase 2's exact filter lands on the same
       final set, so results are partition-layout-independent and
       oracle-checkable.

    At 100 TB this is one pass + one candidate-only shuffle with O(k)
    executor memory — vs the naive full groupBy whose shuffle carries
    every distinct key.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    narrow = df.select(col)
    out_schema = narrow.schema

    def mg_partition(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k - 1:
                cut = sorted(counters.values(), reverse=True)[k - 1]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        if counters:
            yield pd.DataFrame({col: list(counters.keys())})

    candidates = narrow.mapInPandas(mg_partition, schema=out_schema).distinct()
    total = narrow.agg(F.count("*").alias("n_total"))
    return (
        narrow.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_rows") * k > F.col("n_total"))
        .select(col, "n_rows", "n_total")
    )
