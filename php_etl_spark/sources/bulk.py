"""Bulk extract / import / pre-run backup (SURVEY.md §2.1 S6, §2.12 O8).

The reference's bulk path is shell orchestration
(/root/reference/sdk/shell/import.sh:33-56): mysqldump the source
tables on the remote host over ssh, sftp the dump down, replay it
into the local database, mariadb-dump a timestamped pre-run backup
(import.sh:74-80), then run the migrations. One process, one byte
stream, one .sql file.

Spark-first, the same capabilities decompose into engine operations:

- **extract** — a *partitioned* JDBC read straight into parquet
  staging: N executor tasks each pull a key-range slice concurrently,
  so extraction bandwidth scales with the cluster instead of one
  mysqldump pipe. Bounds for the range split are probed with a 1-row
  MIN/MAX pushdown query (driver-side, O(1) — configuration, not
  data).
- **import** — the staged parquet replayed into the destination with
  the batched JDBC writer (prepared-statement batches per partition,
  db.php:250-274 parity at cluster parallelism).
- **backup** — destination tables snapshotted to a timestamped
  parquet directory before the run; restore is the same import.

Staging as parquet (not .sql text) is the point: it is splittable,
column-pruned, and readable by every downstream table spec without a
database round-trip.
"""

from __future__ import annotations

import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from php_etl_spark.sources.jdbc import (
    _qid,
    _tid,
    jdbc_append,
    jdbc_overwrite,
    read_jdbc_table,
)


def _probe_bounds(
    spark: SparkSession, conn: dict[str, Any], table: str, column: str
) -> tuple[int | None, int | None]:
    """1-row MIN/MAX pushdown for the partition-range split."""
    probe = (
        spark.read.format("jdbc")
        .option("url", conn["url"])
        .option(
            "dbtable",
            # ANSI-quoted column (Spark's writer creates case-preserved
            # quoted columns); MySQL needs ANSI_QUOTES via
            # sessionInitStatement for this probe
            f"(SELECT MIN({_qid(column)}) AS lo, MAX({_qid(column)}) AS hi "
            f"FROM {_tid(table)}) b",
        )
    )
    for k, v in conn.get("options", {}).items():
        probe = probe.option(k, str(v))
    row = probe.load().first()
    # positional access: the database case-folds the unquoted aliases
    if row is None or row[0] is None:
        return None, None
    return int(row[0]), int(row[1])


def extract_table(
    spark: SparkSession,
    conn: dict[str, Any],
    table: str,
    staging_dir: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
) -> str:
    """Extract one source table into parquet staging. With
    ``partition_column`` (a numeric key) the read is split into
    ``num_partitions`` concurrent range slices; without it, a single
    connection streams the table (the mysqldump shape — correct for
    small dims, wrong for facts)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", conn["url"])
        .option("dbtable", table)
        .option("fetchsize", str(conn.get("fetchsize", 10_000)))
    )
    for k, v in conn.get("options", {}).items():
        reader = reader.option(k, str(v))
    if partition_column:
        lo, hi = _probe_bounds(spark, conn, table, partition_column)
        if lo is not None:
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("lowerBound", str(lo))
                .option("upperBound", str(max(hi, lo + 1)))
                .option("numPartitions", str(num_partitions))
            )
    out = os.path.join(staging_dir, table)
    reader.load().write.mode("overwrite").parquet(out)
    return out


def bulk_extract(
    spark: SparkSession,
    conn: dict[str, Any],
    tables: dict[str, str | None],
    staging_dir: str,
    num_partitions: int = 8,
) -> dict[str, str]:
    """S6: extract ``tables`` (name → partition column, or None for a
    single-stream read) into a parquet staging area. Returns
    table → staged path. The staged directory then serves as a
    ``{"type": "parquet", "path": staging_dir}`` source connection for
    the pipeline spec — the migrations read staging, exactly as the
    reference's migrations read the replayed local database."""
    return {
        t: extract_table(spark, conn, t, staging_dir, pcol, num_partitions)
        for t, pcol in tables.items()
    }


def bulk_import(
    spark: SparkSession,
    staging_dir: str,
    conn: dict[str, Any],
    tables: list[str],
    overwrite: bool = False,
) -> dict[str, int]:
    """Replay staged parquet into a JDBC destination (the
    ``mariadb < dump.sql`` leg) with the batched parallel writer.
    Returns table → rows loaded."""
    out: dict[str, int] = {}
    for t in tables:
        df = spark.read.parquet(os.path.join(staging_dir, t))
        (jdbc_overwrite if overwrite else jdbc_append)(df, conn, t)
        out[t] = df.count()
    return out


def backup_destination(
    spark: SparkSession,
    conn: dict[str, Any],
    tables: list[str],
    backup_root: str,
    stamp: int | None = None,
) -> str:
    """O8 pre-run backup (import.sh:74-80): snapshot destination
    tables into ``<backup_root>/<epoch>/<table>`` parquet before a
    migration touches them. Works for JDBC and parquet destinations."""
    stamp = int(time.time()) if stamp is None else stamp
    dest = os.path.join(backup_root, str(stamp))
    for t in tables:
        if conn.get("type") == "jdbc":
            df = read_jdbc_table(spark, conn, t)
        else:
            df = spark.read.parquet(os.path.join(conn.get("path", "."), t))
        df.write.mode("overwrite").parquet(os.path.join(dest, t))
    return dest


def restore_destination(
    spark: SparkSession,
    conn: dict[str, Any],
    backup_dir: str,
    tables: list[str],
) -> None:
    """Restore a ``backup_destination`` snapshot (overwrite the
    destination tables with the backed-up contents)."""
    for t in tables:
        df = spark.read.parquet(os.path.join(backup_dir, t))
        if conn.get("type") == "jdbc":
            jdbc_overwrite(df, conn, t)
        else:
            df.write.mode("overwrite").parquet(
                os.path.join(conn.get("path", "."), t)
            )
