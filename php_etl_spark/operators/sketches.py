"""KMV (k-minimum-values) distinct-count sketch.

The repo's HLL rollups (agg_hll_sketch / agg_hll_partial_union) cover
mergeable distinct COUNTING, but HLL sketches only union — they cannot
estimate an INTERSECTION (overlap of two audiences, contamination
between two corpora). KMV can: the k smallest hash values of a set are
a uniform bottom-k sample of its hash space, so

  - distinct estimate:   (k-1) * M / kth_min          (Beyer et al. 2007)
  - union:               merge two sketches, keep k smallest
  - intersection:        Jaccard from the merged sketch x union estimate

Everything here is DETERMINISTIC — the hash is the repo's overflow-safe
multiplicative hash (SQL-expressible, identical in Spark and DuckDB),
so the sketch CONTENT carries an exact cross-engine oracle, not just a
tolerance test. Scale shape: the bottom-k per stratum reuses
``cap_per_stratum`` (salted local rank + bounded global rank — never a
one-task-per-stratum sort), and a sketch is k rows per stratum —
kilobytes, mergeable, broadcastable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# same constants as llm.similarity.kmeans_seed_rank: reduce FIRST so
# the product never leaves BIGINT in either engine
_P_REDUCE = 1000003
_A = 2654435761
_M = 999999937


def mult_hash(col: Column) -> Column:
    return F.pmod(F.pmod(col, F.lit(_P_REDUCE)) * F.lit(_A), F.lit(_M))


def kmv_sketch(
    df: DataFrame, stratum_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """(stratum, hv, rk): the k smallest DISTINCT hash values per
    stratum with their rank. Integer value columns only (the hash is
    integer arithmetic end-to-end for oracle parity)."""
    from php_etl_spark.llm.sampling import cap_per_stratum

    d = (
        df.select(F.col(stratum_col).alias("stratum"),
                  mult_hash(F.col(value_col)).alias("hv"))
        .distinct()
    )
    capped = cap_per_stratum(
        d, "stratum", F.col("hv"), k=k, tiebreak_col="hv"
    )
    w = Window.partitionBy("stratum").orderBy("hv")
    return capped.withColumn("rk", F.row_number().over(w))


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """(stratum, n_kmv, est_distinct): the classic bottom-k estimator;
    a stratum with fewer than k distinct values is reported exactly
    (its sketch holds the whole set)."""
    return sketch.groupBy("stratum").agg(
        F.count("*").alias("n_kmv"),
        F.max(F.when(F.col("rk") == k, F.col("hv"))).alias("kth"),
    ).select(
        "stratum",
        "n_kmv",
        F.when(F.col("n_kmv") < k, F.col("n_kmv"))
        .otherwise(
            F.round(F.lit(float(k - 1)) * F.lit(float(_M)) / F.col("kth"))
        )
        .cast("long")
        .alias("est_distinct"),
    )


def kmv_intersection_estimate(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 64
) -> DataFrame:
    """Two-set overlap estimate — what HLL cannot do: take the k
    smallest of the merged hash sets (a bottom-k sample of A∪B); the
    fraction of those present in BOTH sketches estimates Jaccard, and
    |A∩B| ≈ J · |A∪B|. Callers pass single-stratum sketches; both
    inputs are k-row frames, so every step is sketch-sized (the
    counts pulled to the driver are two scalars)."""
    a = sketch_a.select(F.col("hv").alias("hv_a")).distinct()
    b = sketch_b.select(F.col("hv").alias("hv_b")).distinct()
    uni = (
        a.select(F.col("hv_a").alias("hv"))
        .unionAll(b.select(F.col("hv_b").alias("hv")))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )
    both = (
        a.join(b, F.col("hv_a") == F.col("hv_b"))
        .select(F.col("hv_a").alias("hv"))
        .distinct()
    )
    n_shared = both.join(uni, "hv").count()
    n_uni = uni.count()
    jacc = n_shared / n_uni if n_uni else 0.0
    spark = sketch_a.sparkSession
    return spark.createDataFrame(
        [(n_shared, n_uni, float(jacc))],
        "n_shared_in_unionk long, n_unionk long, jaccard_est double",
    )
