"""Round-14 experiment: pagerank_exact shape variants, interleaved
head-to-head (guide §1). Variants:

  v0  current operator (per-round materialize, union+distinct+join setup)
  v1  fused setup: nodes_deg from ONE exploded aggregate (no join)
  v2  v1 + batch K rounds per materialize (ReusedExchange dedupes the
      shared state subtree) + no materialize on the final round

Each variant must produce the identical top-20 (node, rank_fp) rows —
checked by collect() comparison every trial. Read-only measurement;
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

SCALE = 10**9
BASE = 15 * SCALE // 100
ITERS = 6


def edge_frame(spark, sf):
    c = _cat(spark, sf)
    return (
        c.orders.join(
            c.lineitem, c.lineitem["l_orderkey"] == c.orders["o_orderkey"]
        )
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1000000).alias("dst"),
        )
        .distinct()
    )


def setup_v0(edges_raw):
    edges = materialize(edges_raw.select("src", "dst"))
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    nodes_deg = materialize(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .join(out_deg, "node", "left")
    )
    return edges, nodes_deg


def setup_v1(edges_raw):
    edges = materialize(edges_raw.select("src", "dst"))
    # one exploded aggregate: node list + out-degree in a single
    # exchange; out_deg NULL (dangling) when the node never appears
    # as src — identical to the union+distinct+left-join frame
    both = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("node"), F.lit(1).alias("is_src")),
                F.struct(F.col("dst").alias("node"), F.lit(0).alias("is_src")),
            )
        ).alias("ns")
    ).select("ns.node", "ns.is_src")
    nodes_deg = materialize(
        both.groupBy("node").agg(
            F.when(F.sum("is_src") > 0, F.sum("is_src"))
            .cast("long")
            .alias("out_deg")
        )
    )
    return edges, nodes_deg


def one_round(edges, nodes_deg, state, n):
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
    seed = nodes_deg.select("node", "out_deg", F.lit(0).cast("long").alias("c"))
    return (
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
                F.lit(BASE).cast("long")
                + F.expr(f"(85 * (in_mass + dangling div {n}L)) div 100")
            ).cast("long").alias("rank"),
        )
    )


def run_variant(spark, sf, setup, batch, skip_last):
    edges_raw = edge_frame(spark, sf)
    edges, nodes_deg = setup(edges_raw)
    n = nodes_deg.count()
    state = nodes_deg.select(
        "node", "out_deg", F.lit(SCALE).cast("long").alias("rank")
    )
    for i in range(ITERS):
        state = one_round(edges, nodes_deg, state, n)
        last = i == ITERS - 1
        if last and skip_last:
            continue
        if (i + 1) % batch == 0 or last:
            state = materialize(state)
    return (
        state.select("node", F.col("rank").alias("rank_fp"))
        .orderBy(F.col("rank_fp").desc(), "node")
        .limit(20)
    )


def one_round_dangcol(edges, state, n, last):
    """state carries (node, out_deg, rank, dang): dang = Σ rank over
    THIS state's dangling nodes, same value on every row. The round
    needs no dangling broadcast: dprev rides the seed rows (max()
    recovers it, exactly like out_deg). The NEW state's dang is
    attached via a 1-row aggregate over the round's own output —
    whose subtree shares the groupBy exchange (ReusedExchange) —
    and the final round skips it (nobody consumes it)."""
    msgs = (
        edges.join(
            state.filter(F.col("out_deg").isNotNull()),
            edges["src"] == state["node"],
        )
        .select(
            F.col("dst").alias("node"),
            F.lit(None).cast("long").alias("out_deg"),
            F.expr("rank div out_deg").alias("c"),
            F.lit(None).cast("long").alias("dprev"),
        )
    )
    seed = state.select(
        "node", "out_deg", F.lit(0).cast("long").alias("c"),
        F.col("dang").alias("dprev"),
    )
    ranked = (
        seed.unionByName(msgs)
        .groupBy("node")
        .agg(
            F.max("out_deg").alias("out_deg"),
            F.sum("c").alias("in_mass"),
            F.max("dprev").alias("dprev"),
        )
        .select(
            "node",
            "out_deg",
            (
                F.lit(BASE).cast("long")
                + F.expr(f"(85 * (in_mass + dprev div {n}L)) div 100")
            ).cast("long").alias("rank"),
        )
    )
    if last:
        return ranked.select("node", "out_deg", "rank")
    nxt = ranked.filter(F.col("out_deg").isNull()).agg(
        F.coalesce(F.sum("rank"), F.lit(0).cast("long")).alias("dang")
    )
    return ranked.crossJoin(F.broadcast(nxt))


def run_dangcol(spark, sf, skip_last):
    edges_raw = edge_frame(spark, sf)
    edges, nodes_deg = setup_v1(edges_raw)
    n = nodes_deg.count()
    n_dang = nodes_deg.filter(F.col("out_deg").isNull()).count()
    state = nodes_deg.select(
        "node", "out_deg", F.lit(SCALE).cast("long").alias("rank"),
        F.lit(n_dang * SCALE).cast("long").alias("dang"),
    )
    for i in range(ITERS):
        last = i == ITERS - 1
        state = one_round_dangcol(edges, state, n, last)
        if not (last and skip_last):
            state = materialize(state)
    return (
        state.select("node", F.col("rank").alias("rank_fp"))
        .orderBy(F.col("rank_fp").desc(), "node")
        .limit(20)
    )


VARIANTS = {
    "v0_current": dict(setup=setup_v0, batch=1, skip_last=False),
    "v1_skiplast": dict(setup=setup_v1, batch=1, skip_last=True),
    "v3_dangcol": dict(dangcol=True, skip_last=True),
}


def run_variant2(spark, sf, **kw):
    if kw.get("dangcol"):
        return run_dangcol(spark, sf, kw["skip_last"])
    return run_variant(spark, sf, **kw)


def main():
    sf = "/root/testdata/sf0.1"
    spark = get_spark("r14-pagerank-exp")
    spark.sparkContext.setLogLevel("ERROR")

    # warm
    for name, kw in VARIANTS.items():
        run_variant2(spark, "/root/testdata/sf0.001", **kw).collect()

    ref = None
    best: dict[str, float] = {k: float("inf") for k in VARIANTS}
    for trial in range(3):
        for name, kw in VARIANTS.items():
            t0 = time.time()
            out = run_variant2(spark, sf, **kw)
            force(out)
            dt = time.time() - t0
            best[name] = min(best[name], dt)
            rows = out.collect()
            if ref is None:
                ref = rows
            assert rows == ref, f"{name} diverges from v0!"
            print(f"trial {trial} {name:12s} {dt:6.3f}s", flush=True)
    print("\nmin-of-3:")
    for name, sec in best.items():
        print(f"  {name:12s} {sec:6.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
