"""Round-13 scratch experiments: decompose where headline-query time
goes at sf0.1 (single-row-group inputs -> 1-task scans). Not part of
the engine; read-only measurements, noop sink per guide §1.4."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import force
from php_etl_spark.session import get_spark


def t(label, df, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        force(df)
        best = min(best, time.time() - t0)
    print(f"{label}: {best:.3f}")
    return best


def main():
    sf = "/root/testdata/sf0.1"
    spark = get_spark("r13-exp")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")

    # fixed overhead floor: 1-row scan
    region = spark.read.parquet(f"{sf}/region.parquet")
    t("region noop (job floor)", region)

    # full lineitem scan, all columns
    t("lineitem scan all cols", li)

    # scan of the 7 Q1 columns only
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate"]
    t("lineitem scan 7 cols", li.select(cols))

    # Q1 as written (decimal aggregation)
    def dec(c, typ):
        return F.col(c).cast(typ)

    disc_price = dec("l_extendedprice", "decimal(12,2)") * (
        F.lit(1) - dec("l_discount", "decimal(4,2)"))
    charge = disc_price * (F.lit(1) + dec("l_tax", "decimal(4,2)"))
    q1 = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", "decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice", "decimal(12,2)")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.avg(dec("l_quantity", "decimal(12,2)")).alias("avg_qty"),
            F.avg(dec("l_extendedprice", "decimal(12,2)")).alias("avg_price"),
            F.avg(dec("l_discount", "decimal(4,2)")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
    t("Q1 decimal agg (as written)", q1)

    # Q1 with a round-robin repartition before the agg (pays a full
    # shuffle of the filtered rows, buys 32-way partial agg)
    q1r = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .repartition(32)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", "decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice", "decimal(12,2)")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.avg(dec("l_quantity", "decimal(12,2)")).alias("avg_qty"),
            F.avg(dec("l_extendedprice", "decimal(12,2)")).alias("avg_price"),
            F.avg(dec("l_discount", "decimal(4,2)")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
    t("Q1 decimal agg + repartition(32)", q1r)

    # Q1 with long-cents arithmetic (scan-side), decimal only at the end
    qc = (F.round(F.col("l_quantity") * 100).cast("long"))
    pc = (F.round(F.col("l_extendedprice") * 100).cast("long"))
    dc = (F.round(F.col("l_discount") * 100).cast("long"))
    tc = (F.round(F.col("l_tax") * 100).cast("long"))
    q1l = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .select(
            "l_returnflag", "l_linestatus",
            qc.alias("qc"), pc.alias("pc"),
            (pc * (100 - dc)).alias("dpc"),
            (pc * (100 - dc) * (100 + tc)).alias("chc"),
            dc.alias("dcc"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum("qc") / 100.0).alias("sum_qty"),
            (F.sum("pc") / 100.0).alias("sum_base_price"),
            (F.sum("dpc") / 10000.0).alias("sum_disc_price"),
            (F.sum("chc") / 1000000.0).alias("sum_charge"),
            (F.sum("qc") / 100.0 / F.count("qc")).alias("avg_qty"),
            (F.sum("pc") / 100.0 / F.count("pc")).alias("avg_price"),
            (F.sum("dcc") / 100.0 / F.count("dcc")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
    t("Q1 long-cents agg", q1l)


if __name__ == "__main__":
    main()
