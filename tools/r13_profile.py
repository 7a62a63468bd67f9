"""Round-13 optimization profiler: for each named query (default: the
bench HEADLINE set), capture ``explain("formatted")`` to
``plans/r13/<name>_<tag>.txt`` and time the computation with the noop
sink (min of N runs, guide §1.4), labelling jobs (§1.5). Also prints a
per-query plan census: Exchange count, join strategies, Python-eval
nodes — the shape signals §2-§4 say to look at first.

Usage::

    python tools/r13_profile.py --tag before [--runs 3] [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--outdir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"))
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from bench import HEADLINE, force
    from php_etl_spark import queries as Q
    from php_etl_spark.session import get_spark

    spark = get_spark("r13-profile")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.outdir, exist_ok=True)

    names = args.names or list(HEADLINE)

    # warm code paths once at the smallest SF (JIT/codegen, not engine)
    warm = "/root/testdata/sf0.001"
    if os.path.exists(warm):
        for name in names:
            try:
                force(Q.QUERIES[name](spark, warm))
            except Exception:
                pass

    census = {}
    for name in names:
        df = Q.QUERIES[name](spark, args.sf)
        if not args.no_plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.outdir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        else:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        best = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"r13:{name}")
            t0 = time.time()
            force(Q.QUERIES[name](spark, args.sf))
            best = min(best, time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        census[name] = {
            "sec": round(best, 3),
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
            "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
            "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
            "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
            "py": len(re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)),
            "sorts": len(re.findall(r"\bSort\b", plan)),
        }
        print(json.dumps({name: census[name]}), flush=True)

    total = round(sum(v["sec"] for v in census.values()), 3)
    print(json.dumps({"total_sec": total, "n": len(census)}))
    # merge into any prior census for this tag so partial re-profiles
    # don't drop earlier entries
    census_path = os.path.join(args.outdir, f"census_{args.tag}.json")
    merged = {}
    if os.path.exists(census_path):
        try:
            with open(census_path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    merged.update(census)
    with open(census_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
