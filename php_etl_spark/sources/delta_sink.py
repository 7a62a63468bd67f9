"""Delta Lake transactional sink (SURVEY.md §2.1 S9/S10, §2.12 O5 —
the production path for upsert/delete at 100 TB).

On plain parquet, upsert is a staged rewrite (writers.py) — correct,
atomic via directory swap, but rewrite cost ∝ table (or partition)
size. A transactional table format fixes the asymptotics: ``MERGE
INTO`` rewrites only the *files* containing matched keys, the commit
is an atomic log append, concurrent readers keep snapshot isolation,
and failed writes leave no torn state — the properties the reference
approximates with per-record BEGIN/COMMIT
(/root/reference/sdk/migrate_employeur.php:196-219).

Gated behind ``delta_available()``: the ``delta-spark`` package and
its JVM jars are not in this container, so tests skip and the parquet
path remains the default; on a cluster with Delta on the classpath
(``spark.sql.extensions = io.delta.sql.DeltaSparkSessionExtension``)
a ``{"type": "parquet", "format": "delta"}`` connection routes here
unchanged.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _require_delta():
    if not delta_available():
        raise RuntimeError(
            "connection requests format='delta' but the delta-spark "
            "package is not installed; install delta-spark and add "
            "io.delta.sql.DeltaSparkSessionExtension to "
            "spark.sql.extensions, or drop the format override to use "
            "the staged-rewrite parquet path"
        )


def _delta_table(spark: SparkSession, path: str):
    from delta.tables import DeltaTable

    return DeltaTable.forPath(spark, path)


def append(df: DataFrame, path: str) -> str:
    _require_delta()
    df.write.format("delta").mode("append").save(path)
    return path


def overwrite(df: DataFrame, path: str) -> str:
    _require_delta()
    df.write.format("delta").mode("overwrite").save(path)
    return path


def upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
) -> str:
    """J7/S9 as a real ``MERGE INTO``: matched rows update, unmatched
    insert; only files containing matched keys rewrite, the commit is
    one atomic log entry."""
    _require_delta()
    if not os.path.exists(path):
        updates.write.format("delta").save(path)
        return path
    cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
    (
        _delta_table(spark, path)
        .alias("t")
        .merge(updates.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    return path


def delete_reinsert(
    spark: SparkSession,
    replacement: DataFrame,
    path: str,
    keys: Sequence[str],
) -> str:
    """J8/S10: delete every row whose key appears in the replacement
    set, insert the replacements — same MERGE, with matched rows
    DELETEd then the full replacement appended (two actions in the
    same table version history; Delta's log keeps readers on the
    pre-refresh snapshot until both commit)."""
    _require_delta()
    if not os.path.exists(path):
        replacement.write.format("delta").save(path)
        return path
    cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
    (
        _delta_table(spark, path)
        .alias("t")
        .merge(replacement.select(*keys).distinct().alias("s"), cond)
        .whenMatchedDelete()
        .execute()
    )
    replacement.write.format("delta").mode("append").save(path)
    return path


def read(spark: SparkSession, path: str) -> DataFrame:
    _require_delta()
    return spark.read.format("delta").load(path)
