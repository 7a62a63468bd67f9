"""r14 ANN-LSH parameter sweep (judge r13 directive #7): measure the
recall/selectivity curve of ``ann_topk_lsh`` over (n_tables, n_planes)
on the scale probe's planted-cluster corpus, to retune the probe's
parameterization from the measured curve (target: candidate work
<= 30% of brute force at recall@10 >= 0.95).

Candidate fraction and recall are DETERMINISTIC (hash-derived corpus,
integer projections) — box load cannot move them, only the wall times.

    python tools/r14_ann_sweep.py [--rows 250000] [--configs 8x4,12x6,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from php_etl_spark.session import get_spark  # noqa: E402
from php_etl_spark.llm.similarity import (  # noqa: E402
    ann_topk_lsh,
    brute_force_topk,
    hyperplane_coefficients,
    lsh_buckets,
)


def planted_corpus(spark, n: int, dim: int = 16, n_clusters: int = 32):
    """Same construction as tools/scale_probe.py ann_probe: 32 planted
    clusters, hash-derived centers, ±0.1 per-vector noise, no RNG."""
    cid = F.pmod(F.col("id"), F.lit(n_clusters))
    comps = [
        (
            (F.pmod(F.xxhash64(cid, F.lit(j)), F.lit(2001)) - 1000).cast("double")
            / 1000.0
            + (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(201)) - 100).cast(
                "double"
            )
            / 1000.0
        )
        for j in range(dim)
    ]
    return (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), F.array(*comps).alias("embedding"))
        .localCheckpoint(eager=True)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=250_000)
    ap.add_argument(
        "--configs",
        default="8x4,8x6,12x6,16x6,8x8,12x8,16x8,24x8",
        help="comma list of TABLESxPLANES",
    )
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("r14-ann-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    n, dim, k = args.rows, 16, args.k

    corpus = planted_corpus(spark, n, dim)
    q_step = max(1, n // 40) | 1
    queries = corpus.filter(F.col("vec_id") % F.lit(q_step) == 13)
    n_q = queries.count()
    print(f"corpus {n:,} vectors, {n_q} queries", flush=True)

    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(corpus, queries, k=k).collect()
    }
    assert len(brute) == n_q * k

    results = []
    for cfg in args.configs.split(","):
        t, p = (int(x) for x in cfg.split("x"))
        t0 = time.time()
        coefs = hyperplane_coefficients(spark, t, p, dim)
        cb_sizes = (
            lsh_buckets(corpus, coefs)
            .groupBy("tbl", "bucket")
            .agg(F.count("*").alias("sz"))
        )
        qb = lsh_buckets(queries, coefs).withColumnRenamed("vid", "query_id")
        cand = qb.join(cb_sizes, ["tbl", "bucket"]).agg(F.sum("sz")).first()[0]
        frac = cand / (n_q * n)
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_topk_lsh(
                corpus, queries, n_planes=p, n_tables=t, k=k, dim=dim
            ).collect()
        }
        starved = len(got) != n_q * k
        recall = len(brute & got) / len(brute)
        dt = time.time() - t0
        row = {
            "tables": t,
            "planes": p,
            "cand_frac": round(frac, 4),
            "recall": round(recall, 4),
            "starved": starved,
            "rows_returned": len(got),
            "sec": round(dt, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print("SWEEP " + json.dumps({"rows": n, "n_q": n_q, "k": k,
                                 "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
