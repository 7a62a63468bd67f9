"""Layout-maintenance operators: small-file compaction and Z-order
clustering (sources/maintenance.py)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from php_etl_spark.catalog import Catalog
from php_etl_spark.sources.maintenance import (
    compact,
    dir_file_stats,
    zorder_sql,
    zorder_value,
    zorder_write,
)

SF = "/root/testdata/sf0.001"


def test_compact_reduces_files_and_preserves_rows(spark):
    path = tempfile.mkdtemp(prefix="cmp_") + "/t"
    ev = Catalog(spark, SF).events.select("event_id", "event_type")
    ev.repartition(32).write.parquet(path)
    before_rows = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    n_before, _ = dir_file_stats(path)
    assert n_before == 32
    stats = compact(spark, path, target_file_bytes=64 << 20)
    assert not stats["skipped"]
    assert stats["files_after"] < stats["files_before"]
    after_rows = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    assert before_rows == after_rows, "compaction must not change data"


def test_compact_skips_when_already_packed(spark):
    path = tempfile.mkdtemp(prefix="cmp_") + "/t"
    Catalog(spark, SF).nation.repartition(1).write.parquet(path)
    stats = compact(spark, path, target_file_bytes=64 << 20)
    assert stats["skipped"] and stats["files_after"] == stats["files_before"]


def test_zorder_value_matches_sql_and_interleaves(spark):
    df = spark.range(256).select(
        (F.col("id") % 16).alias("a"), (F.col("id") / 16).cast("long").alias("b")
    )
    got = df.select(
        "a", "b", zorder_value([F.col("a"), F.col("b")], bits=4).alias("z")
    )
    via_sql = df.selectExpr(
        "a", "b", f"{zorder_sql(['a', 'b'], bits=4)} AS z"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, via_sql.collect())
    )
    byab = {(r.a, r.b): r.z for r in got.collect()}
    # classic Morton facts: (1,0)->1, (0,1)->2, (1,1)->3, (2,2)->12
    assert byab[(1, 0)] == 1 and byab[(0, 1)] == 2
    assert byab[(1, 1)] == 3 and byab[(2, 2)] == 12


def test_zorder_write_files_cover_narrow_ranges(spark):
    path = tempfile.mkdtemp(prefix="zw_") + "/t"
    ev = Catalog(spark, SF).events.select(
        "event_id",
        (F.col("user_id") % 64).alias("a"),
        (F.col("event_id") % 64).alias("b"),
    )
    zorder_write(ev, path, [F.col("a"), F.col("b")], n_files=8, bits=6)
    back = spark.read.parquet(path).withColumn(
        "f", F.input_file_name()
    )
    assert back.count() == ev.count()
    spans = back.groupBy("f").agg(
        F.min("a").alias("alo"), F.max("a").alias("ahi"),
        F.min("b").alias("blo"), F.max("b").alias("bhi"),
    ).collect()
    assert len(spans) >= 4
    # z-clustering: most files span well under the full 0..63 domain in
    # BOTH dimensions (a random layout spans ~the whole domain in each)
    narrow = [
        s for s in spans if (s.ahi - s.alo) <= 48 and (s.bhi - s.blo) <= 48
    ]
    assert len(narrow) >= len(spans) // 2, [
        (s.ahi - s.alo, s.bhi - s.blo) for s in spans
    ]


def test_parquet_bloom_filter_written_in_footers(spark, tmp_path):
    """The bloom-filter write option must actually land in the file (a
    silently-ignored option would still pass the data-parity oracle).
    This pyarrow build doesn't expose bloom offsets in column
    metadata, so assert the observable: an identical write with the
    filter enabled carries the serialized bloom bytes (~12 KiB at
    ndv=10000) the plain write doesn't."""
    import glob
    import os

    path_plain = str(tmp_path / "plain")
    path_bloom = str(tmp_path / "bloom")
    df = spark.range(10000).selectExpr("id AS k", "id % 97 AS v")
    df.coalesce(1).write.parquet(path_plain)
    (
        df.coalesce(1)
        .write.option("parquet.bloom.filter.enabled#k", "true")
        .option("parquet.bloom.filter.expected.ndv#k", "10000")
        .parquet(path_bloom)
    )
    size = lambda d: sum(  # noqa: E731
        os.path.getsize(f) for f in glob.glob(d + "/*.parquet")
    )
    delta = size(path_bloom) - size(path_plain)
    assert delta >= 2048, f"bloom bytes missing (delta={delta})"
    back = spark.read.parquet(path_bloom).filter("k = 42").collect()
    assert [r.k for r in back] == [42]


def test_repair_table_fixes_only_divergent_buckets(spark, tmp_path):
    """Corrupt a slice of the replica: repair detects the divergent
    buckets, rewrites only their rows, and the result equals the
    source exactly; an already-synced replica repairs as a no-op."""
    from php_etl_spark.sources.maintenance import repair_table

    src = spark.range(2000).selectExpr("id AS k", "id * 3 AS v")
    path = str(tmp_path / "replica")
    src.write.parquet(path)
    stats0 = repair_table(spark, src, path, "k", n_buckets=32)
    assert stats0["buckets_divergent"] == 0 and stats0["rows_rewritten"] == 0

    # corrupt two specific keys: one dropped, one mutated — only
    # their hash buckets may be touched by the repair
    broken = (
        spark.read.parquet(path)
        .filter("k != 77")
        .withColumn("v", F.expr("CASE WHEN k = 500 THEN v + 1 ELSE v END"))
    )
    broken.write.mode("overwrite").parquet(str(tmp_path / "b"))
    spark.read.parquet(str(tmp_path / "b")).write.mode("overwrite").parquet(path)

    stats = repair_table(spark, src, path, "k", n_buckets=32)
    assert 0 < stats["buckets_divergent"] <= 2
    # bucket-scoped: ~2/32 of the table moves, never a full copy
    assert stats["rows_rewritten"] <= 2000 * 4 // 32
    got = sorted((r.k, r.v) for r in spark.read.parquet(path).collect())
    assert got == [(i, 3 * i) for i in range(2000)]


def test_compact_partitioned_touches_only_fragmented_partitions(spark, tmp_path):
    from php_etl_spark.sources.maintenance import (
        compact_partitioned,
        dir_file_stats,
    )

    path = str(tmp_path / "t")
    df = spark.range(4000).selectExpr("id AS k", "CAST(id % 2 AS STRING) AS p")
    # p=0 fragmented (16 files), p=1 already packed (1 file)
    df.filter("p = '0'").repartition(16).write.partitionBy("p").mode(
        "append"
    ).parquet(path)
    df.filter("p = '1'").coalesce(1).write.partitionBy("p").mode(
        "append"
    ).parquet(path)
    import os

    before_p1 = sorted(os.listdir(os.path.join(path, "p=1")))
    actions = compact_partitioned(spark, path, target_file_bytes=64 << 20)
    assert actions["p=0"]["skipped"] is False
    assert actions["p=0"]["files_after"] < actions["p=0"]["files"]
    assert actions["p=1"]["skipped"] is True
    # untouched partition keeps its exact files (no rewrite side effects)
    assert sorted(os.listdir(os.path.join(path, "p=1"))) == before_p1
    back = spark.read.parquet(path)
    assert back.count() == 4000
