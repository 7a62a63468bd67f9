"""Table-layout maintenance: small-file compaction and multi-column
Z-order clustering — the OPTIMIZE family every long-lived table needs.

No single counterpart in the reference (its destinations are database
tables; the DBMS compacts for it — the capability matched here is the
operational half of the reference's bulk rewrite paths,
/root/reference/sdk/shell/import.sh:63-80). At 100 TB these are not
optional: a streaming or incremental-upsert table accretes thousands of
kilobyte files per partition (each an open/seek/footer-parse at scan
time and a NameNode/object-store list entry), and an unclustered layout
makes every selective scan read every file. Both operators follow the
public Delta/Iceberg OPTIMIZE design: rewrite data files only, commit
via atomic swap, never change row contents.
"""

from __future__ import annotations

import math
import os
from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from php_etl_spark.sources.writers import _staged_rewrite


def dir_file_stats(path: str) -> tuple[int, int]:
    """(data-file count, total bytes) for a table directory.

    Local-filesystem walk — the test-scale stand-in for the
    FileSystem.listFiles() enumeration a cluster driver does during
    planning; the two numbers are the same ones Spark's
    InMemoryFileIndex already collects for every scan."""
    n = b = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith((".", "_")):
                continue
            if f.endswith((".parquet", ".orc", ".csv", ".json")):
                n += 1
                b += os.path.getsize(os.path.join(root, f))
    return n, b


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    keep_backup: bool = False,
) -> dict[str, Any]:
    """Bin-pack a parquet table into ~target-size files (Delta
    OPTIMIZE semantics): read, round-robin repartition to
    ceil(total/target) outputs, staged-rewrite with atomic swap (the
    table is never absent, crash restores the old layout). Row
    contents and schema are untouched — only the file layout changes.

    Skips (reports, rewrites nothing) when the table already has no
    more files than the target — compaction must be idempotent and
    cheap to schedule unconditionally."""
    files_before, total_bytes = dir_file_stats(path)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    if files_before <= n_out:
        return {
            "path": path,
            "files_before": files_before,
            "files_after": files_before,
            "bytes": total_bytes,
            "skipped": True,
        }
    df = spark.read.parquet(path)
    _staged_rewrite(df.repartition(n_out), path, keep_backup=keep_backup)
    files_after, bytes_after = dir_file_stats(path)
    return {
        "path": path,
        "files_before": files_before,
        "files_after": files_after,
        "bytes": bytes_after,
        "skipped": False,
    }


def zorder_value(cols: list[Column], bits: int = 8) -> Column:
    """Morton (Z-order) interleave of the low ``bits`` bits of each
    column — the space-filling curve behind Delta's OPTIMIZE ZORDER BY
    and Iceberg's sort-order z-ordering. Pure long bit arithmetic
    (shift/and/add of disjoint bit positions), so it runs inside
    whole-stage codegen AND is expressible verbatim in any SQL dialect
    for oracle parity. Callers bucket real columns into [0, 2^bits)
    first (e.g. ``col % 256``)."""
    k = len(cols)
    terms: list[Column] = []
    for j, c in enumerate(cols):
        v = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * k + j))
    out = terms[0]
    for t in terms[1:]:
        out = out + t  # disjoint bit positions: + is |
    return out


def zorder_sql(exprs: list[str], bits: int = 8) -> str:
    """The identical interleave as ANSI SQL text (for oracles and
    pushdown into external engines)."""
    k = len(exprs)
    terms = []
    for j, e in enumerate(exprs):
        for i in range(bits):
            # fully parenthesized: SQL '+' binds tighter than '<<'
            terms.append(f"(((({e}) >> {i}) & 1) << {i * k + j})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[Column],
    n_files: int = 8,
    bits: int = 8,
) -> str:
    """Cluster a table on the Z-order curve of several columns and
    write ``n_files`` range-partitioned, internally sorted files.
    Because z-neighbors are neighbors in EVERY interleaved dimension,
    each output file covers a narrow min/max range of each clustering
    column — parquet footer stats then prune files for predicates on
    ANY of them, where single-column range clustering (see
    sink_range_clustered) only prunes its one sort key. The curve
    value is dropped before the write: data files are byte-identical
    in schema to the input, the clustering lives purely in row
    placement."""
    z = zorder_value(cols, bits)
    clustered = (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    return _staged_rewrite(clustered, path)


def repair_table(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    key_col: str,
    n_buckets: int = 64,
) -> dict[str, Any]:
    """Anti-entropy repair of a parquet replica against its source of
    truth (the Merkle-ish sync every replicated table eventually
    needs, and the scale-correct form of the reference's
    drop-and-reimport repair, /root/reference/sdk/shell/import.sh:
    63-73): both sides reduce to per-bucket (count, order-insensitive
    checksum) tables — n_buckets rows each, joined full-outer to find
    divergent buckets — and ONLY rows in divergent buckets are
    rewritten (bucket-scoped delete-and-reinsert through the staged
    atomic swap). A 100 TB replica with one corrupt bucket moves
    1/n_buckets of the data; comparing costs two aggregate scans and
    a kilobyte join.

    Checksums are sums of a 64-bit row hash (xxhash64 over all
    columns) — associative, so bucket checksums are partition-order-
    independent and mergeable. Returns {buckets_checked,
    buckets_divergent, rows_rewritten}."""
    from php_etl_spark.sources.writers import _staged_rewrite

    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    row_h = F.xxhash64(*[F.col(c) for c in source.columns])

    def digest(df: DataFrame) -> DataFrame:
        return df.groupBy(bucket.alias("__b")).agg(
            F.count("*").alias("__n"),
            F.sum(row_h.cast("decimal(38,0)")).alias("__sum"),
        )

    target = spark.read.parquet(target_path).select(*source.columns)
    diff = (
        digest(source)
        .withColumnsRenamed({"__n": "__sn", "__sum": "__ss"})
        .join(
            digest(target).withColumnsRenamed(
                {"__n": "__tn", "__sum": "__ts"}
            ),
            "__b",
            "full_outer",
        )
        .filter(
            ~(
                F.col("__sn").eqNullSafe(F.col("__tn"))
                & F.col("__ss").eqNullSafe(F.col("__ts"))
            )
        )
        .select("__b")
    )
    bad = [r["__b"] for r in diff.collect()]  # bucket ids: layout-sized
    if not bad:
        return {
            "buckets_checked": n_buckets,
            "buckets_divergent": 0,
            "rows_rewritten": 0,
        }
    bad_set = set(bad)
    keep = target.filter(~bucket.isin(*bad_set))
    replacement = source.filter(bucket.isin(*bad_set))
    from php_etl_spark.materialize import materialize

    n_rewritten = replacement.count()
    repaired = materialize(keep.unionByName(replacement))
    _staged_rewrite(repaired, target_path)
    return {
        "buckets_checked": n_buckets,
        "buckets_divergent": len(bad),
        "rows_rewritten": n_rewritten,
    }


def compact_partitioned(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    min_files: int = 4,
) -> dict[str, Any]:
    """Partition-scoped OPTIMIZE for a hive-partitioned table: walk
    the partition directories, bin-pack ONLY those whose file count
    exceeds both ``min_files`` and their byte-justified target — each
    partition rewrites through its own staged swap while every other
    partition's files are untouched (and concurrently readable). This
    is how compaction actually runs at 100 TB: the streaming-append
    table has a few hot partitions accreting small files per trigger;
    rewriting the whole table per maintenance cycle would dwarf the
    ingest itself. Returns per-partition actions."""
    actions: dict[str, Any] = {}
    for entry in sorted(os.listdir(path)):
        pdir = os.path.join(path, entry)
        if not os.path.isdir(pdir) or "=" not in entry:
            continue
        n_files, total = dir_file_stats(pdir)
        n_out = max(1, math.ceil(total / target_file_bytes))
        if n_files < min_files or n_files <= n_out:
            actions[entry] = {"files": n_files, "skipped": True}
            continue
        df = spark.read.parquet(pdir)
        _staged_rewrite(df.repartition(n_out), pdir)
        after, _ = dir_file_stats(pdir)
        actions[entry] = {
            "files": n_files,
            "files_after": after,
            "skipped": False,
        }
    return actions


def row_group_stats(
    spark: SparkSession, path: str, columns: Sequence[str]
) -> DataFrame:
    """Parquet metadata TABLE: per-row-group row counts and column
    min/max statistics, read from the footers on EXECUTORS — the
    Iceberg `files`-metadata-table idea for plain parquet dirs. The
    driver only lists file paths (layout-sized); a mapInPandas batch
    job opens each footer with pyarrow where the file lives. This is
    the introspection query behind data-skipping debugging ('why
    didn't that file prune?') and layout audits (zorder/range
    clustering quality), at the cost of a footer read per file —
    never a data read."""
    import pandas as pd  # noqa: F401 — mapInPandas contract

    files = sorted(
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    cols = list(columns)
    paths_df = spark.createDataFrame(
        [(p,) for p in files], "file_path string"
    ).repartition(min(len(files), 32) or 1)

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for b in batches:
            out = []
            for p in b["file_path"]:
                md = pq.ParquetFile(p).metadata
                name_to_idx = {
                    md.row_group(0).column(i).path_in_schema: i
                    for i in range(md.num_columns)
                }
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    row = {
                        "file_path": p,
                        "row_group": rg,
                        "n_rows": g.num_rows,
                    }
                    for c in cols:
                        st = g.column(name_to_idx[c]).statistics
                        row[f"min_{c}"] = None if st is None else st.min
                        row[f"max_{c}"] = None if st is None else st.max
                    out.append(row)
            yield pd.DataFrame(
                out,
                columns=["file_path", "row_group", "n_rows"]
                + [f"{m}_{c}" for c in cols for m in ("min", "max")],
            )

    schema = "file_path string, row_group int, n_rows long, " + ", ".join(
        f"min_{c} long, max_{c} long" for c in cols
    )
    return paths_df.mapInPandas(read_footers, schema)
