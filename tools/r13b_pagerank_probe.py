"""Round-13 follow-up probe: decompose graph_pagerank_exact wall time
into setup (edges materialize, nodes_deg materialize, count) and the
six iteration jobs, on a quiet box. Read-only measurement (guide §1);
not part of the engine.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import force
from php_etl_spark.catalog import cached as _cat
from php_etl_spark.materialize import materialize
from php_etl_spark.session import get_spark


def main():
    sf = "/root/testdata/sf0.1"
    spark = get_spark("r13b-pagerank-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # warm code paths at the smallest SF
    from php_etl_spark import queries as Q
    force(Q.QUERIES["graph_pagerank_exact"](spark, "/root/testdata/sf0.001"))

    for trial in range(2):
        c = _cat(spark, sf)
        t0 = time.time()
        edges_raw = (
            c.orders.join(
                c.lineitem, c.lineitem["l_orderkey"] == c.orders["o_orderkey"]
            )
            .select(
                F.col("o_custkey").alias("src"),
                (F.col("l_suppkey") + 1000000).alias("dst"),
            )
            .distinct()
        )
        edges = materialize(edges_raw.select("src", "dst"))
        t1 = time.time()
        out_deg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count("*").alias("out_deg")
        )
        nodes_deg = materialize(
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
            .join(out_deg, "node", "left")
        )
        t2 = time.time()
        n = nodes_deg.count()
        t3 = time.time()
        scale = 10**9
        base = 15 * scale // 100
        state = nodes_deg.select(
            "node", "out_deg", F.lit(scale).cast("long").alias("rank")
        )
        round_secs = []
        for _ in range(6):
            r0 = time.time()
            dangling = state.filter(F.col("out_deg").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0).cast("long")).alias("dangling")
            )
            msgs = (
                edges.join(
                    state.filter(F.col("out_deg").isNotNull()),
                    edges["src"] == state["node"],
                )
                .select(
                    F.col("dst").alias("node"),
                    F.lit(None).cast("long").alias("out_deg"),
                    F.expr("rank div out_deg").alias("c"),
                )
            )
            seed = nodes_deg.select(
                "node", "out_deg", F.lit(0).cast("long").alias("c")
            )
            state = materialize(
                seed.unionByName(msgs)
                .groupBy("node")
                .agg(
                    F.max("out_deg").alias("out_deg"),
                    F.sum("c").alias("in_mass"),
                )
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    "out_deg",
                    (
                        F.lit(base).cast("long")
                        + F.expr(f"(85 * (in_mass + dangling div {n}L)) div 100")
                    ).cast("long").alias("rank"),
                )
            )
            round_secs.append(time.time() - r0)
        t4 = time.time()
        force(
            state.select("node", F.col("rank").alias("rank_fp"))
            .orderBy(F.col("rank_fp").desc(), "node")
            .limit(20)
        )
        t5 = time.time()
        print(
            f"trial {trial}: edges_mat={t1-t0:.3f} nodes_deg_mat={t2-t1:.3f} "
            f"count={t3-t2:.3f} rounds={[round(s,3) for s in round_secs]} "
            f"rounds_total={t4-t3:.3f} final_topk={t5-t4:.3f} total={t5-t0:.3f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
