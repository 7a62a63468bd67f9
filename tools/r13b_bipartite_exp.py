"""Round-13 follow-up experiment: graph_bipartite_copurchase — current
windowed self-join (subtree computed once per join side) vs grouped
in-row pair streaming (collect_set absorbs the DISTINCT, posexplode
streams pairs). Interleaved head-to-head, min-of-N, noop sink.
Read-only measurement; also asserts result equality before timing."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bench import force
from php_etl_spark.catalog import cached as _cat
from php_etl_spark.llm.dedup import _pairs_in_group
from php_etl_spark.session import get_spark


def old_shape(spark, sf_dir):
    li = _cat(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey").distinct()
    n_items = F.count("*").over(Window.partitionBy("l_orderkey"))
    li = li.withColumn("n_items", n_items).filter(
        F.col("n_items") <= 64
    ).drop("n_items")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


def new_shape(spark, sf_dir):
    li = _cat(spark, sf_dir).lineitem
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ms"))
        .filter(F.size("ms").between(2, 64))
    )
    return (
        _pairs_in_group(baskets)
        .groupBy(F.col("a").alias("part_a"), F.col("b").alias("part_b"))
        .agg(F.count("*").cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


def main():
    sf = "/root/testdata/sf0.1"
    spark = get_spark("r13b-bipartite-exp")
    spark.sparkContext.setLogLevel("ERROR")

    # equality check at sf0.01 and sf0.1 (exact frame compare)
    for chk in ("/root/testdata/sf0.01", sf):
        o = old_shape(spark, chk)
        n = new_shape(spark, chk)
        diff = o.exceptAll(n).count() + n.exceptAll(o).count()
        print(f"equality {chk}: diff_rows={diff}", flush=True)
        assert diff == 0, chk

    # warm both shapes
    force(old_shape(spark, "/root/testdata/sf0.001"))
    force(new_shape(spark, "/root/testdata/sf0.001"))

    runs = 5
    old_best = new_best = float("inf")
    old_all, new_all = [], []
    for _ in range(runs):
        t0 = time.time()
        force(old_shape(spark, sf))
        old_all.append(time.time() - t0)
        old_best = min(old_best, old_all[-1])
        t0 = time.time()
        force(new_shape(spark, sf))
        new_all.append(time.time() - t0)
        new_best = min(new_best, new_all[-1])
    print(f"old: min={old_best:.3f} all={[round(x,3) for x in old_all]}")
    print(f"new: min={new_best:.3f} all={[round(x,3) for x in new_all]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
