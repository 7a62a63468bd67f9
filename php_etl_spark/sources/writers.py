"""Sinks (SURVEY.md §2.1 S7-S10): append, upsert (merge),
delete-then-reinsert, and failure quarantine.

The reference writes with batched multi-VALUES INSERTs
(/root/reference/sdk/lib/db.php:250-274), per-key UPDATEs
(/root/reference/sdk/migrate_assures.php:47-67), and DELETE+reinsert
refreshes (/root/reference/sdk/migrate_assures.php:205-236). On plain
parquet there is no transactional MERGE, so upsert/delete are staged
rewrites with an atomic directory swap; on Delta/Iceberg these map to
``MERGE INTO`` / ``replaceWhere`` — the production path at 100 TB,
where only touched files rewrite. The relational semantics
(merge = updates ⟕ existing; refresh = anti ∪ new) are engine
functions so both storage paths share one definition.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _sink_path(conn: dict[str, Any], table: str) -> str:
    return os.path.join(conn.get("path", "."), table)


def append(df: DataFrame, conn: dict[str, Any], table: str) -> str:
    """S8 batched append. One partition-parallel write — the multi-
    VALUES INSERT batching is Spark's native write granularity. A
    ``{"type": "jdbc"}`` connection routes to the batched JDBC insert
    (db_insert_many parity, /root/reference/sdk/lib/db.php:250-274)."""
    if conn.get("type") == "jdbc":
        from php_etl_spark.sources import jdbc as _jdbc

        _jdbc.jdbc_append(df, conn, table)
        return table
    path = _sink_path(conn, table)
    df.write.mode("append").parquet(path)
    return path


def overwrite(df: DataFrame, conn: dict[str, Any], table: str) -> str:
    if conn.get("type") == "jdbc":
        from php_etl_spark.sources import jdbc as _jdbc

        _jdbc.jdbc_overwrite(df, conn, table)
        return table
    path = _sink_path(conn, table)
    df.write.mode("overwrite").parquet(path)
    return path


def merge_frames(
    existing: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Upsert semantics (J7): matched rows take the update's values,
    unmatched existing rows survive, unmatched updates insert
    (/root/reference/sdk/migrate_assures.php:165-203). Updates must be
    unique per key (enforce upstream with first_wins_dedup)."""
    survivors = existing.join(updates.select(*keys), on=list(keys), how="left_anti")
    return survivors.unionByName(updates)


def refresh_frames(
    existing: DataFrame, replacement: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Delete-then-reinsert (J8): drop every existing row whose key
    appears in the replacement set, then insert the replacement rows
    (/root/reference/sdk/migrate_assures.php:205-236)."""
    kept = existing.join(replacement.select(*keys).distinct(), on=list(keys), how="left_anti")
    return kept.unionByName(replacement)


def _staged_rewrite(result: DataFrame, path: str) -> str:
    """Write to a staging dir then atomically swap — the plain-parquet
    stand-in for a transactional commit (O5; the reference wraps each
    record in BEGIN/COMMIT, /root/reference/sdk/migrate_employeur.php:196-219)."""
    staging = f"{path}.staging-{uuid.uuid4().hex[:8]}"
    result.write.mode("overwrite").parquet(staging)
    backup = f"{path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, backup)
    os.rename(staging, path)
    if os.path.exists(backup):
        shutil.rmtree(backup)
    return path


def upsert(
    spark: SparkSession,
    updates: DataFrame,
    conn: dict[str, Any],
    table: str,
    keys: Sequence[str],
) -> str:
    if conn.get("type") == "jdbc":
        from php_etl_spark.sources import jdbc as _jdbc

        _jdbc.jdbc_upsert(spark, updates, conn, table, keys)
        return table
    path = _sink_path(conn, table)
    if not os.path.exists(path):
        updates.write.mode("overwrite").parquet(path)
        return path
    existing = spark.read.parquet(path)
    # materialize inputs before the swap invalidates the scan path
    result = merge_frames(existing, updates, keys).localCheckpoint(eager=True)
    return _staged_rewrite(result, path)


def delete_reinsert(
    spark: SparkSession,
    replacement: DataFrame,
    conn: dict[str, Any],
    table: str,
    keys: Sequence[str],
) -> str:
    if conn.get("type") == "jdbc":
        from php_etl_spark.sources import jdbc as _jdbc

        _jdbc.jdbc_delete_reinsert(spark, replacement, conn, table, keys)
        return table
    path = _sink_path(conn, table)
    if not os.path.exists(path):
        replacement.write.mode("overwrite").parquet(path)
        return path
    existing = spark.read.parquet(path)
    result = refresh_frames(existing, replacement, keys).localCheckpoint(eager=True)
    return _staged_rewrite(result, path)


def split_quarantine(
    df: DataFrame, valid: Column, quarantine_path: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """O4 failure quarantine: split rows by a validity predicate; bad
    rows go to a side output for a later bounded retry pass
    (/root/reference/sdk/migrate_employeur.php:191-228). Returns
    (good, bad); writes bad to ``quarantine_path`` when given."""
    good = df.filter(valid)
    bad = df.filter(~F.coalesce(valid, F.lit(False)))
    if quarantine_path:
        bad.write.mode("append").parquet(quarantine_path)
    return good, bad
