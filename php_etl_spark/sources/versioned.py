"""Versioned table publish: object-store-safe commits via a manifest
pointer instead of directory renames.

``_staged_rewrite`` (writers.py) swaps directories with ``os.rename``
— atomic on POSIX, impossible on S3/GCS-style object stores where a
"directory rename" is a non-atomic copy storm. The production answer
is the one every table format (Delta/Iceberg/Hudi) uses: data files
are immutable, and a commit is ONE small pointer write. This module
is that shape in its minimal form, for plain parquet:

  table_dir/
    _versions/v00000001-<uuid>/   immutable parquet snapshot
    _versions/v00000002-<uuid>/
    _CURRENT                      JSON pointer {version, dir, ...}

A publish writes a brand-new snapshot directory (its name is
unguessable, so concurrent writers never collide on data paths), then
replaces ``_CURRENT`` — a single-object atomic operation both on
POSIX (``os.replace``) and on object stores (single-key PUT). A crash
mid-publish leaves an orphan snapshot and an untouched pointer:
readers are never broken, and ``vacuum`` reclaims orphans later.
Rollback is a pointer rewrite — no data movement, mirroring the
reference's pre-run backup/restore trait
(/root/reference/sdk/shell/import.sh:74-80) without copying data.

Reference semantics parity: upsert/refresh publish the same
``merge_frames``/``refresh_frames`` relations the staged-rewrite path
uses (/root/reference/sdk/migrate_assures.php:165-236); only the
commit mechanism differs.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from php_etl_spark.materialize import materialize

_POINTER = "_CURRENT"
_VERSIONS = "_versions"


def _pointer_path(table_dir: str) -> str:
    return os.path.join(table_dir, _POINTER)


def read_pointer(table_dir: str) -> dict[str, Any] | None:
    """Current commit record, or None for a never-published table."""
    try:
        with open(_pointer_path(table_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _write_pointer(table_dir: str, record: dict[str, Any]) -> None:
    """Single-object atomic pointer replace (os.replace locally; on an
    object store this maps to one PUT of the pointer key)."""
    tmp = _pointer_path(table_dir) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(record, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _pointer_path(table_dir))


def _json_stat(v: Any) -> Any:
    """A min/max value in pointer-JSON form. Numeric/string/bool pass
    through; dates/timestamps serialize to their ISO string (which
    compares in the same order, so pruning bounds still work)."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    iso = getattr(v, "isoformat", None)
    if iso is not None:
        return iso()
    return str(v)


def _collect_file_stats(
    snap_dir: str, df: DataFrame, stats_cols: Sequence[str]
) -> dict[str, dict[str, Any]]:
    """Per-data-file min/max/rowcount for the tracked columns, in ONE
    Spark job over the just-written snapshot (group by
    input_file_name). The collected result is LAYOUT-sized (one row
    per file), never data-sized — the same manifest statistics Delta
    and Iceberg record at commit time."""
    snap = df.sparkSession.read.parquet(snap_dir)
    aggs = [F.count("*").alias("__rows")]
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    rows = snap.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect()
    stats: dict[str, dict[str, Any]] = {}
    for r in rows:
        fname = os.path.basename(r["__f"])
        entry: dict[str, Any] = {"rows": r["__rows"]}
        for c in stats_cols:
            entry[c] = [
                _json_stat(r[f"__min_{c}"]),
                _json_stat(r[f"__max_{c}"]),
            ]
        stats[fname] = entry
    return stats


def publish(
    df: DataFrame,
    table_dir: str,
    stats_cols: Sequence[str] | None = None,
) -> dict[str, Any]:
    """Commit ``df`` as the table's next version. The snapshot write
    is partition-parallel; the commit itself is one pointer write.
    Returns the new commit record.

    Concurrency contract: SINGLE WRITER. The commit is a read-pointer/
    write-pointer sequence with no compare-and-swap, so two concurrent
    publishers would both read version N and the last pointer PUT wins
    silently. A multi-writer deployment uses ``publish_concurrent``
    (create-if-absent per-version commit markers, the Delta _delta_log
    protocol); readers are safe either way (the pointer swap is
    atomic and snapshots are immutable).

    Version numbers are allocated past the commit high-water mark
    (``max_committed``), never reused — publish-after-rollback gets a
    FRESH number, so the per-version ``history`` map stays unambiguous
    and a crashed publish retried later cannot collide with an
    abandoned partial snapshot at the same version."""
    current = read_pointer(table_dir)
    prev_max = (
        current.get("max_committed", current["version"]) if current else 0
    )
    version = prev_max + 1
    snap_rel = os.path.join(_VERSIONS, f"v{version:08d}-{uuid.uuid4().hex[:8]}")
    snap_dir = os.path.join(table_dir, snap_rel)
    df.write.mode("overwrite").parquet(snap_dir)
    # exact snapshot dir per committed version: rollback resolves from
    # this, never by globbing version prefixes (which a crashed publish
    # could shadow with a half-written orphan)
    history = dict(current.get("history", {})) if current else {}
    history[str(version)] = snap_rel
    stats = (
        _collect_file_stats(snap_dir, df, stats_cols) if stats_cols else None
    )
    record = {
        "version": version,
        "dir": snap_rel,
        "previous": current["dir"] if current else None,
        # high-water mark of committed versions: lets vacuum tell a
        # rolled-back-but-committed snapshot (keep) from the orphan of
        # a crashed publish (reclaim). Monotone — a rollback lowers
        # ``version`` but never this.
        "max_committed": max(version, prev_max),
        "history": history,
    }
    if stats is not None:
        record["stats_cols"] = list(stats_cols)
        record["stats"] = stats
    _write_pointer(table_dir, record)
    return record


def read_current(spark: SparkSession, table_dir: str) -> DataFrame:
    """Resolve the pointer and read the current snapshot."""
    current = read_pointer(table_dir)
    if current is None:
        raise FileNotFoundError(f"no published version at {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, current["dir"]))


def upsert(
    spark: SparkSession,
    updates: DataFrame,
    table_dir: str,
    keys: Sequence[str],
) -> dict[str, Any]:
    """Merge-publish: current ⟕ updates → next version. The previous
    snapshot stays on disk untouched, so a reader holding the old
    pointer keeps a consistent view (snapshot isolation by
    construction)."""
    from php_etl_spark.sources.writers import merge_frames

    if read_pointer(table_dir) is None:
        return publish(materialize(updates), table_dir)
    merged = merge_frames(read_current(spark, table_dir), updates, keys)
    return publish(materialize(merged), table_dir)


def delete_reinsert(
    spark: SparkSession,
    replacement: DataFrame,
    table_dir: str,
    keys: Sequence[str],
) -> dict[str, Any]:
    """Refresh-publish (delete-then-reinsert as a new version)."""
    from php_etl_spark.sources.writers import refresh_frames

    if read_pointer(table_dir) is None:
        return publish(materialize(replacement), table_dir)
    refreshed = refresh_frames(read_current(spark, table_dir), replacement, keys)
    return publish(materialize(refreshed), table_dir)


def _resolve_version(table_dir: str, to_version: int) -> str:
    """Resolve a committed version to its exact snapshot dir via the
    pointer's per-version ``history`` map (the dir each commit wrote),
    NOT a directory glob: a crashed publish leaves a half-written
    orphan whose name shares the version prefix, and a glob could pick
    it. Pointers written before the history map fall back to the glob
    but error on ambiguity."""
    current = read_pointer(table_dir)
    history = current.get("history", {}) if current else {}
    target = history.get(str(to_version))
    if target is None:
        prefix = f"v{to_version:08d}-"
        matches = [
            name
            for name in sorted(os.listdir(os.path.join(table_dir, _VERSIONS)))
            if name.startswith(prefix)
        ]
        if len(matches) > 1:
            raise RuntimeError(
                f"ambiguous version resolution: {len(matches)} snapshots "
                f"match {prefix}* and the pointer has no commit history "
                f"for version {to_version}: {matches}"
            )
        target = os.path.join(_VERSIONS, matches[0]) if matches else None
    elif not os.path.isdir(os.path.join(table_dir, target)):
        target = None  # committed but vacuumed
    if target is None:
        raise FileNotFoundError(
            f"version {to_version} not found under {table_dir}/{_VERSIONS} "
            "(vacuumed?)"
        )
    return target


def read_version(
    spark: SparkSession, table_dir: str, version: int
) -> DataFrame:
    """Time travel: read a historical committed snapshot without
    moving the pointer — the Delta/Iceberg ``VERSION AS OF`` shape.
    Snapshots are immutable, so a historical read is just a parquet
    scan of that version's dir; concurrent publishes never disturb
    it. Fails (like any table format) once vacuum reclaimed it."""
    target = _resolve_version(table_dir, version)
    return spark.read.parquet(os.path.join(table_dir, target))


def rollback(table_dir: str, to_version: int) -> dict[str, Any]:
    """Point the table back at an existing snapshot — a pointer write,
    zero data movement. Fails if the snapshot was vacuumed. Resolution
    via ``_resolve_version`` (exact per-version history, glob only for
    legacy pointers)."""
    target = _resolve_version(table_dir, to_version)
    current = read_pointer(table_dir)
    history = current.get("history", {}) if current else {}
    record = {
        "version": to_version,
        "dir": target,
        "previous": current["dir"] if current else None,
        "rollback_of": current["version"] if current else None,
        "max_committed": max(
            to_version,
            current.get("max_committed", current["version"]) if current else 0,
        ),
        "history": history,
    }
    _write_pointer(table_dir, record)
    return record


def vacuum(table_dir: str, keep: int = 2) -> list[str]:
    """Delete snapshot directories older than the ``keep`` most recent
    — EXCEPT the one the pointer references (always kept, whatever its
    age; a rolled-back table must not lose its live data). Also
    reclaims orphans from crashed publishes. Returns removed dirs."""
    import shutil

    versions_dir = os.path.join(table_dir, _VERSIONS)
    if not os.path.isdir(versions_dir):
        return []
    current = read_pointer(table_dir)
    live = os.path.basename(current["dir"]) if current else None
    max_committed = (
        current.get("max_committed", current["version"]) if current else 0
    )
    snaps = sorted(os.listdir(versions_dir))  # name order == version order
    # a snapshot numbered past the commit high-water mark is the
    # orphan of a crashed publish — never "recent", always reclaimable
    committed = [s for s in snaps if int(s[1:9]) <= max_committed]
    keep_set = set(committed[-keep:]) if keep > 0 else set()
    if live:
        keep_set.add(live)
    removed = []
    for name in snaps:
        if name not in keep_set:
            shutil.rmtree(os.path.join(versions_dir, name), ignore_errors=True)
            removed.append(name)
    return removed


def pruned_files(
    table_dir: str,
    col: str,
    lo: Any = None,
    hi: Any = None,
) -> tuple[list[str], int]:
    """(files overlapping [lo, hi] on ``col``, total file count) for
    the current version, from pointer statistics alone — no data read,
    no Spark job. A file is skipped iff its [min, max] cannot contain
    a matching row; files whose stats are missing are conservatively
    kept, and an all-null file (min = max = null) is safely skipped
    because a range predicate never matches null."""
    current = read_pointer(table_dir)
    if current is None:
        raise FileNotFoundError(f"no published version at {table_dir}")
    stats = current.get("stats")
    if not stats or col not in current.get("stats_cols", []):
        raise ValueError(
            f"no file statistics for column {col!r} at {table_dir} "
            "(publish with stats_cols=[...])"
        )
    keep: list[str] = []
    for fname, entry in stats.items():
        mn, mx = entry[col]
        if mn is None and mx is None:
            continue  # all-null file: a range predicate matches nothing
        if lo is not None and mx is not None and mx < lo:
            continue
        if hi is not None and mn is not None and mn > hi:
            continue
        keep.append(fname)
    return keep, len(stats)


def read_pruned(
    spark: SparkSession,
    table_dir: str,
    col: str,
    lo: Any = None,
    hi: Any = None,
) -> DataFrame:
    """Read the current version with FILE-LEVEL pruning for a closed
    range predicate on a stats-tracked column — the manifest-stats
    scan every table format does before parquet row-group stats even
    come into play. At 100 TB the difference is opening thousands of
    files vs the handful whose min/max overlap the range (clustered
    writes — repartitionByRange or zorder_write — are what make the
    ranges narrow). The predicate is RE-APPLIED to the surviving
    files, so the result is exactly the filtered table regardless of
    how coarse the stats are."""
    keep, _total = pruned_files(table_dir, col, lo, hi)
    current = read_pointer(table_dir)
    base = os.path.join(table_dir, current["dir"])
    df = (
        spark.read.parquet(*[os.path.join(base, f) for f in keep])
        if keep
        else spark.read.parquet(base).where(F.lit(False))
    )
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(col) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(col) <= F.lit(hi))
    return df.filter(pred)


# --- multi-writer commits -------------------------------------------------

_COMMITS = "_commits"


def _marker_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _COMMITS, f"v{version:08d}.json")


def _read_markers(table_dir: str) -> dict[int, dict[str, Any]]:
    cdir = os.path.join(table_dir, _COMMITS)
    out: dict[int, dict[str, Any]] = {}
    if not os.path.isdir(cdir):
        return out
    for name in os.listdir(cdir):
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(cdir, name)) as f:
                rec = json.load(f)
            out[int(rec["version"])] = rec
        except (OSError, ValueError, KeyError):
            continue  # half-written marker from a crash: ignore
    return out


def publish_concurrent(
    df: DataFrame,
    table_dir: str,
    stats_cols: Sequence[str] | None = None,
) -> dict[str, Any]:
    """Multi-writer publish — the Delta-_delta_log shape that
    ``publish()``'s single-writer contract points at: a commit is a
    CREATE-IF-ABSENT version marker (``_commits/vN.json``), so two
    writers racing for version N get exactly one winner (O_CREAT|O_EXCL
    locally; If-None-Match/precondition PUT on an object store) and the
    loser retries at N+1 with its already-written snapshot — data files
    are never rewritten on a version conflict, only the kilobyte marker
    allocation repeats.

    The ``_CURRENT`` pointer becomes a cache: after winning a marker,
    each writer folds ALL markers into a pointer record (version = max
    committed marker). Two racing pointer writes converge because both
    compute the same merged state; readers of a stale pointer still see
    a fully committed version. Serializes COMMITS, not read-modify-write
    transactions — upsert-vs-upsert conflict detection (Delta's OCC
    validation) is deliberately out of scope.

    The snapshot dir is uuid-only (no version prefix): the version is
    unknown until the marker wins, and nothing about the data files
    changes when the allocation retries."""
    os.makedirs(os.path.join(table_dir, _COMMITS), exist_ok=True)
    snap_rel = os.path.join(_VERSIONS, f"s-{uuid.uuid4().hex}")
    snap_dir = os.path.join(table_dir, snap_rel)
    df.write.mode("overwrite").parquet(snap_dir)
    stats = (
        _collect_file_stats(snap_dir, df, stats_cols) if stats_cols else None
    )
    current = read_pointer(table_dir)
    floor_v = current.get("max_committed", current["version"]) if current else 0
    while True:
        markers = _read_markers(table_dir)
        version = max([floor_v, *markers.keys()]) + 1
        marker = {"version": version, "dir": snap_rel}
        if stats is not None:
            marker["stats_cols"] = list(stats_cols)
            marker["stats"] = stats
        try:
            fd = os.open(
                _marker_path(table_dir, version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            # lost the race for this number — OR the number is squatted
            # by a crashed writer's half-written marker (unreadable, so
            # _read_markers skips it and would hand out the same number
            # forever). Either way: that version is burned, move past it.
            floor_v = version
            continue
        with os.fdopen(fd, "w") as f:
            json.dump(marker, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        break
    # fold every committed marker into the pointer; racing writers
    # compute the same merged state, so last-write-wins converges
    markers = _read_markers(table_dir)
    history = dict(current.get("history", {})) if current else {}
    history.update({str(v): m["dir"] for v, m in sorted(markers.items())})
    maxv = max(markers)
    top = markers[maxv]
    record: dict[str, Any] = {
        "version": maxv,
        "dir": top["dir"],
        "previous": history.get(str(maxv - 1)),
        "max_committed": maxv,
        "history": history,
    }
    if "stats" in top:
        record["stats_cols"] = top["stats_cols"]
        record["stats"] = top["stats"]
    _write_pointer(table_dir, record)
    return {**record, "committed_version": version}
