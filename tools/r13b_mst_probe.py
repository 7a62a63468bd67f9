"""Round-13 follow-up probe: decompose graph_mst_boruvka's engine time
at sf0.01 — rounds, and per-round phase split (label join + argmin
window, forest accumulate, quotient contraction, component relabel).
Read-only measurement."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from php_etl_spark.catalog import cached as _cat
from php_etl_spark.llm.dedup import duplicate_clusters
from php_etl_spark.materialize import materialize, unmaterialize
from php_etl_spark.session import get_spark


def main():
    sf = "/root/testdata/sf0.01"
    spark = get_spark("r13b-mst-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = open("/tmp/mst_probe.txt", "w")

    cat = _cat(spark, sf)
    items = cat.lineitem.select(
        F.col("l_orderkey").alias("b"), F.col("l_partkey").alias("i")
    ).distinct()
    a = items.alias("a")
    c = items.alias("c")
    edges_w = (
        a.join(c, (F.col("a.b") == F.col("c.b")) & (F.col("a.i") < F.col("c.i")))
        .groupBy(F.col("a.i").alias("u"), F.col("c.i").alias("v"))
        .agg((F.lit(1000000) / F.count("*")).cast("long").alias("w"))
    )

    t0 = time.time()
    edges = materialize(edges_w.select("u", "v", "w"))
    print(f"edges_mat: {time.time()-t0:.2f}s rows={edges.count()}", file=out, flush=True)
    mst = None
    t0 = time.time()
    comp = materialize(
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("cluster"))
    )
    print(f"comp0_mat: {time.time()-t0:.2f}s nodes={comp.count()}", file=out, flush=True)

    for rnd in range(12):
        r0 = time.time()
        lab = (
            edges.join(
                comp.select(F.col("node").alias("u"), F.col("cluster").alias("cu")), "u"
            )
            .join(
                comp.select(F.col("node").alias("v"), F.col("cluster").alias("cv")), "v"
            )
            .filter(F.col("cu") != F.col("cv"))
        )
        both = lab.select("u", "v", "w", "cu", "cv", F.col("cu").alias("comp")).union(
            lab.select("u", "v", "w", "cu", "cv", F.col("cv").alias("comp"))
        )
        cand = materialize(
            both.withColumn(
                "rk",
                F.row_number().over(Window.partitionBy("comp").orderBy("w", "u", "v")),
            )
            .filter(F.col("rk") == 1)
            .select("u", "v", "w", "cu", "cv")
            .distinct()
        )
        t_cand = time.time() - r0
        if cand.isEmpty():
            unmaterialize(cand)
            print(f"round {rnd}: cand empty, stop ({t_cand:.2f}s)", file=out, flush=True)
            break
        n_cand = cand.count()
        r1 = time.time()
        new_mst = materialize(
            cand.select("u", "v", "w")
            if mst is None
            else mst.union(cand.select("u", "v", "w")).distinct()
        )
        if mst is not None:
            unmaterialize(mst)
        mst = new_mst
        t_mst = time.time() - r1
        r2 = time.time()
        cc = duplicate_clusters(
            cand.select(F.col("cu").alias("doc_a"), F.col("cv").alias("doc_b"))
        )
        new_comp = materialize(
            comp.join(
                cc.select(F.col("doc").alias("cluster"), F.col("cluster").alias("merged")),
                "cluster",
                "left",
            ).select("node", F.coalesce("merged", "cluster").alias("cluster"))
        )
        t_cc = time.time() - r2
        unmaterialize(comp)
        unmaterialize(cand)
        comp = new_comp
        print(
            f"round {rnd}: cand={n_cand} cand_phase={t_cand:.2f}s "
            f"mst_acc={t_mst:.2f}s contraction+relabel={t_cc:.2f}s "
            f"total={time.time()-r0:.2f}s",
            file=out, flush=True,
        )
    out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
