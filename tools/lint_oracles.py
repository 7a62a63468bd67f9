"""Oracle result-type lint: execute every registered oracle in DuckDB
and FAIL on result columns whose type the driver's value hasher
canonicalizes differently from Spark's:

  - HUGEINT  — DuckDB's uncast SUM(BIGINT). Spark sums to BIGINT, so
    identical values hash differently (the exact bug behind the three
    r03 correctness reds: agg_max_concurrent, agg_priority_counts_q12,
    split_train_holdout). House style: CAST(SUM(...) AS BIGINT).
  - DECIMAL  — only when the Spark side isn't decimal-typed too; an
    oracle must state the width explicitly. Flagged for review.

It also audits for VACUOUS oracles (judge r7 directive #2): an oracle
whose result is 0 rows at the driver's compare scale (sf0.01) proves
only that both engines return empty — the hash compare certifies
nothing about the operator. Empty results are reported as WARN (or
FAIL with --strict-empty) unless the key is listed in EMPTY_OK with a
reason (some audits — constraint violations, risky groups — are
CORRECTLY empty on clean synthetic data and are pytest-covered with
seeded dirt instead).

DuckDB-only (no Spark session), so the whole registry lints in
seconds. Usage::

    python tools/lint_oracles.py [--sf DIR] [--strict-empty] [name ...]

Exit 0 iff no oracle produces a flagged column type (and, with
--strict-empty, no unlisted oracle returns 0 rows at --empty-sf).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Types whose Spark/DuckDB hash canonicalization diverges. DECIMAL is
# allowed when explicitly cast (DuckDB reports the cast's type, so an
# explicit CAST(... AS DECIMAL(14,2)) still shows here — those are
# fine IF the Spark side is decimal of the same scale; keep them out
# of oracles unless both sides agree, and list exceptions below).
FLAGGED = ("HUGEINT",)

# key -> columns deliberately decimal-typed on BOTH sides.
ALLOW: dict[str, set[str]] = {}

# Keys whose oracle is LEGITIMATELY empty at sf0.01: each must carry a
# reason and independent (pytest, seeded-dirt) coverage of the non-empty
# path. Anything else returning 0 rows is a vacuous hash compare.
EMPTY_OK: dict[str, str] = {}


def double_floordiv_sites(sql: str) -> list[str]:
    """Heuristic for the double-floordiv hazard (r7 sf0.001 sweep
    finding): DuckDB's ``//`` does NOT floor DOUBLE operands and a
    later CAST to BIGINT rounds-to-nearest, silently diverging from
    Spark's truncating ``div``. A SUM whose argument produces DOUBLE
    (contains floor()/ln() with no integer cast inside) and is later
    floor-divided must be CAST AS BIGINT *before* the division.
    Returns snippets of suspicious SUM arguments."""
    import re as _re

    out = []
    for m in _re.finditer(r"SUM\s*\(", sql):
        i, depth = m.end(), 1
        while i < len(sql) and depth:
            depth += sql[i] == "("
            depth -= sql[i] == ")"
            i += 1
        arg = sql[m.end():i - 1]
        if (
            "floor" in arg.lower()
            and "AS BIGINT" not in arg
            and "AS INT" not in arg
        ):
            before = sql[max(0, m.start() - 60):m.start()]
            after = sql[i:i + 80]
            # flagged when the double SUM feeds a floor-division and
            # is not itself cast to an integer type first
            if "//" in after and "AS BIGINT" not in after.split("//")[0]:
                out.append(" ".join(arg[:60].split()))
            elif "CAST" not in before and "//" in after:
                out.append(" ".join(arg[:60].split()))
    return out


def flagged_columns(con, sql: str) -> list[tuple[str, str]]:
    """(column, duckdb_logical_type) pairs whose type the driver hasher
    canonicalizes differently from Spark. Raises if the SQL does not
    plan. Uses DESCRIBE — the DBAPI cursor.description path reports the
    generic "NUMBER" for every numeric and never matches."""
    cols = con.execute(f"DESCRIBE (SELECT * FROM ({sql}))").fetchall()
    return [
        (row[0], str(row[1]).upper())
        for row in cols
        if any(f in str(row[1]).upper() for f in FLAGGED)
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--empty-sf",
        default="/root/testdata/sf0.01",
        help="scale dir for the vacuous-oracle (0-row) audit — the "
        "driver compares at sf0.01, so that is where empty matters",
    )
    ap.add_argument(
        "--strict-empty",
        action="store_true",
        help="treat unlisted 0-row oracles as FAIL instead of WARN",
    )
    ap.add_argument("--skip-empty", action="store_true",
                    help="type lint only (skip executing each oracle)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from php_etl_spark.queries import ORACLES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    con_empty = None
    if not args.skip_empty and os.path.isdir(args.empty_sf):
        con_empty = duckdb.connect()
        for t in TABLES:
            p = os.path.join(args.empty_sf, f"{t}.parquet")
            con_empty.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    names = args.names or list(ORACLES)
    bad = 0
    warned = 0
    for name in names:
        sql = ORACLES.get(name)
        if sql is None:
            continue
        try:
            hits = flagged_columns(con, sql)
        except Exception as exc:  # noqa: BLE001 — lint must report all
            bad += 1
            print(f"FAIL  {name}: oracle does not execute: "
                  f"{str(exc).splitlines()[0][:120]}")
            continue
        for col, type_name in hits:
            if col not in ALLOW.get(name, set()):
                bad += 1
                print(
                    f"FAIL  {name}: column `{col}` is {type_name} — "
                    f"cast it (CAST(... AS BIGINT)) so the driver hash "
                    f"canonicalization matches Spark"
                )
        for snippet in double_floordiv_sites(sql):
            bad += 1
            print(
                f"FAIL  {name}: DOUBLE-typed SUM feeds a // division "
                f"(`SUM({snippet}...`) — DuckDB's // does not floor "
                f"doubles and CAST rounds; CAST the SUM AS BIGINT "
                f"before dividing (r7 ml_eval_suite_shared_scan bug)"
            )
        if con_empty is not None and name not in EMPTY_OK:
            try:
                n = con_empty.execute(
                    f"SELECT COUNT(*) FROM ({sql})"
                ).fetchone()[0]
            except Exception as exc:  # noqa: BLE001 — report, keep going
                bad += 1
                print(f"FAIL  {name}: oracle errors at {args.empty_sf}: "
                      f"{str(exc).splitlines()[0][:120]}")
                continue
            if n == 0:
                tag = "FAIL" if args.strict_empty else "WARN"
                if args.strict_empty:
                    bad += 1
                else:
                    warned += 1
                print(
                    f"{tag}  {name}: oracle returns 0 rows at sf0.01 — "
                    f"the hash compare is vacuous; seed data inside the "
                    f"plan or list the key in EMPTY_OK with a reason"
                )
    summary = "OK" if not bad else f"{bad} oracle violations"
    if warned:
        summary += f", {warned} empty-result warnings"
    print(f"\n{summary} ({len(names)} oracles linted)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
