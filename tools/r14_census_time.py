"""r14: time the dupscan-census tail (judge r13 directive #6) — the
~50 registry keys plans/r13/dupscan_census.json left unpinned with
>=4 rescans of one table. Measures min-of-N wall seconds per key at
sf0.01 (noop-forced, full computation) so the pin work is driven by
measured seconds, not scan counts.

    python tools/r14_census_time.py [--sf DIR] [--trials 3] [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--census", default="plans/r13/dupscan_census.json")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from bench import force
    from php_etl_spark.queries import QUERIES
    from php_etl_spark.session import get_spark

    names = args.names or sorted(json.load(open(args.census)))
    names = [n for n in names if n in QUERIES]
    spark = get_spark("r14-census-time")
    spark.sparkContext.setLogLevel("ERROR")

    # warm on the smallest SF so JIT/codegen doesn't charge the first key
    warm = "/root/testdata/sf0.001"
    for n in names:
        try:
            force(QUERIES[n](spark, warm))
        except Exception as exc:  # noqa: BLE001
            print(f"WARM-FAIL {n}: {exc}", flush=True)

    out: dict[str, float] = {}
    for n in names:
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.time()
            force(QUERIES[n](spark, args.sf))
            best = min(best, time.time() - t0)
        out[n] = round(best, 3)
        print(f"{n:40s} {best:7.3f}", flush=True)

    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    print("CENSUS_TIMES " + json.dumps({"sf": args.sf, "trials": args.trials,
                                        "times": ranked}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
