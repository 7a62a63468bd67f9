"""Round-13: split each headline query's bench time into DataFrame
construction (driver: catalog schema reads + plan building) vs
execution (force via noop sink). Read-only measurement."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, force
from php_etl_spark import queries as Q
from php_etl_spark.session import get_spark


def main():
    os.environ.setdefault("SPARK_GRAFT_STREAM_PARTITIONS", "8")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r13-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(HEADLINE)
    warm = "/root/testdata/sf0.001"
    if os.path.exists(warm):
        for name in names:
            try:
                force(Q.QUERIES[name](spark, warm))
            except Exception:
                pass
    out = {}
    for name in names:
        cons = float("inf")
        run = float("inf")
        for _ in range(3):
            t0 = time.time()
            df = Q.QUERIES[name](spark, sf)
            t1 = time.time()
            force(df)
            t2 = time.time()
            cons = min(cons, t1 - t0)
            run = min(run, t2 - t1)
        out[name] = {"construct": round(cons, 3), "execute": round(run, 3)}
        print(json.dumps({name: out[name]}), flush=True)
    tot_c = round(sum(v["construct"] for v in out.values()), 3)
    tot_e = round(sum(v["execute"] for v in out.values()), 3)
    print(json.dumps({"total_construct": tot_c, "total_execute": tot_e}))


if __name__ == "__main__":
    main()
