"""Registry-wide physical-plan sweep: compile EVERY non-effectful
query's physical plan and flag the degenerate shapes that kill a
100 TB run regardless of correctness:

  - CartesianProduct anywhere (an unconditioned cross join of two
    multi-row sides; 1-row broadcast scalars compile to
    BroadcastNestedLoopJoin, which is allowed)
  - a parquet scan with zero pruned columns when the query reads a
    known-wide table (lineitem/orders read with 16/9 columns)

This is the breadth complement to tools/explain_audit.py (deep
assertions on selected keys): every registered key gets at least the
never-cartesian guarantee. Plans are compiled, not executed — the
whole registry sweeps in a few minutes at sf0.001.

Usage::

    python tools/plan_sweep.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Effectful queries run sinks/streams/pipelines when their function
# body executes — compiling them here would run real jobs. Same
# exclusion list as tests/test_registry.py.
_EFFECTFUL = ("sink_", "stream_", "pipeline_", "bulk_", "upsert", "delete_", "jdbc")

# Queries where a CartesianProduct of BOUNDED sides is the intended
# plan (document WHY when adding here).
_CARTESIAN_OK: set[str] = set()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from php_etl_spark.queries import QUERIES
    from php_etl_spark.session import get_spark

    spark = get_spark("plan-sweep", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    names = args.names or [
        n for n in QUERIES if not any(p in n for p in _EFFECTFUL)
    ]
    bad = 0
    wide_scan = re.compile(r"ReadSchema: struct<([^>]*)>")
    for name in names:
        try:
            df = QUERIES[name](spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — report, continue
            bad += 1
            print(f"FAIL  {name}: plan build raised {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:120]}")
            continue
        if "CartesianProduct" in plan and name not in _CARTESIAN_OK:
            bad += 1
            print(f"FAIL  {name}: CartesianProduct in physical plan")
        widths = [s.count(":") for s in wide_scan.findall(plan)]
        if widths and max(widths) >= 16:
            bad += 1
            print(f"FAIL  {name}: unpruned wide scan ({max(widths)} columns)")
    print(f"\n{'OK' if not bad else f'{bad} plan violations'} "
          f"({len(names)} plans swept)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
