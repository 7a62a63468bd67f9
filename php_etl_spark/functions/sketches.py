"""Count-min sketch: a mergeable heavy-hitter frequency sketch.

The exact path (``text_top_tokens``) already bounds its shuffle by
|vocab|; a count-min sketch bounds it by a CONSTANT (depth × width
counters) regardless of vocabulary size — the structure you want when
the key space itself is too large to shuffle (URLs, n-grams, IPs at
100 TB). Rows hash into ``depth`` independent buckets; counts are
plain sums, so the sketch builds with ONE map-side-combined aggregate
and merges across batches/partitions by element-wise addition —
algebraic, like Spark's own HLL sketch aggregate.

Estimates are upper bounds: est(x) = min over rows of counter[h_i(x)]
>= true(x), with overestimate bounded by collisions (ε ≈ e/width per
unit of total mass, probability 1-δ with δ ≈ e^-depth). Deterministic
given the seeded xxhash64 family — property tests assert the
one-sided error and merge invariance (tests/test_functions.py).

No counterpart in the reference (its closest tool is a full GROUP BY,
sdk/lib/db.php:213-230 result iteration); this is pure scale surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the (row, bucket, cnt) counter table — depth·width rows
    max, one aggregate pass. Each input row lands in exactly one
    bucket per sketch row via seeded xxhash64."""
    rows = df.select(
        F.col(col).alias("__v"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: F.struct(
                    i.alias("row"),
                    F.pmod(F.xxhash64(F.col(col), i), F.lit(width)).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("rb"),
    )
    return (
        rows.groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (depth, width): element-
    wise counter addition — the algebraic property that lets each
    partition/batch sketch independently."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, items: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query the sketch for each item: min over the depth
    counters. The sketch is depth·width rows — broadcast it; the item
    side never shuffles."""
    probes = items.select(
        F.col(col).alias("item"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: F.struct(
                    i.alias("row"),
                    F.pmod(F.xxhash64(F.col(col), i), F.lit(width)).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("rb"),
    ).select("item", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
