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


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Portable Bloom filter as (word, bits) rows: ``m_bits`` bits in
    32-bit words, ``k_hashes`` positions per key from disjoint md5 hex
    slices. The build is an order-independent BIT_OR per word, so the
    filter is identical on any engine/partitioning and merges across
    shards by the same BIT_OR. 32-bit words because engines disagree
    on ``1 << 63`` (DuckDB raises); the word table has m_bits/32 rows
    — constant broadcastable state."""
    spark = df.sparkSession
    idx = spark.range(k_hashes).select(F.col("id").cast("int").alias("i"))
    pos = df.select(F.col(key_col).alias("key")).crossJoin(
        F.broadcast(idx)
    ).select(
        F.expr(
            "cast(conv(substring(md5(cast(key as string)),"
            f" 1 + 8 * i, 8), 16, 10) as bigint) % {m_bits}"
        ).alias("pos"),
    )
    return (
        pos.select(
            F.expr("pos div 32").alias("word"),
            F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Append a ``bloom_hit`` 0/1 column: 1 iff every one of the key's
    ``k_hashes`` bits is set. Zero false negatives by construction, so
    ``bloom_hit = 0`` rows can be emitted/dropped WITHOUT the exact
    check — the shuffle-free prefilter for 100 TB anti/semi joins.

    The word table collapses to a ONE-ROW map<word,bits> that rides a
    broadcast cross join; the probe is then a pure per-row expression
    (md5 slices -> map lookup -> bit test, folded over k via forall)
    — ``df`` itself is never shuffled, re-keyed, or re-joined."""
    bm = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))
        ).alias("_bloom")
    )
    hit = F.expr(
        "case when forall(sequence(0, {kmax}), i -> ("
        "  coalesce(_bloom[cast(cast(conv(substring(md5(cast({key} as string)),"
        "    1 + 8 * cast(i as int), 8), 16, 10) as bigint) % {m} div 32"
        "    as bigint)], 0L)"
        "  & shiftleft(1L, cast(cast(conv(substring(md5(cast({key} as string)),"
        "    1 + 8 * cast(i as int), 8), 16, 10) as bigint) % {m} % 32 as int))"
        ") != 0) then 1 else 0 end".format(
            kmax=k_hashes - 1, key=key_col, m=m_bits
        )
    )
    return (
        df.crossJoin(F.broadcast(bm))
        .withColumn("bloom_hit", hit)
        .drop("_bloom")
    )
