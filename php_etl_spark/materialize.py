"""Cluster-safe plan materialization.

Iterative/branching operators (connected components, shingle tables
consumed by several branches, pre-swap sink frames) need to cut
lineage and pin a result. ``localCheckpoint`` is the fast choice in
``local[*]`` but stores blocks only on executors — an executor loss
mid-job loses them, so at cluster scale the job dies instead of
recomputing. This helper picks the strategy from config so the same
operator code is correct in both worlds:

- ``local`` (default): ``localCheckpoint(eager=True)`` — single-JVM
  test mode, no fault tolerance needed.
- ``persist``: ``persist(MEMORY_AND_DISK)`` + eager count — blocks
  recompute from lineage on executor loss; the default to run on a
  cluster.
- ``checkpoint``: reliable checkpoint to
  ``spark.sparkContext.getCheckpointDir()`` (set via
  ``spark.php_etl.checkpoint_dir``) — survives executor loss without
  any recompute; for very deep lineage (iterative clustering).

Select with the runtime conf ``spark.php_etl.materialize`` or env
``SPARK_GRAFT_MATERIALIZE``.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame

CONF_KEY = "spark.php_etl.materialize"
CHECKPOINT_DIR_KEY = "spark.php_etl.checkpoint_dir"
_VALID = ("local", "persist", "checkpoint")


def _mode(df: DataFrame) -> str:
    try:
        mode = df.sparkSession.conf.get(
            CONF_KEY, os.environ.get("SPARK_GRAFT_MATERIALIZE", "local")
        )
    except Exception:  # noqa: BLE001 — conf unreadable, fall back
        mode = "local"
    if mode not in _VALID:
        raise ValueError(f"{CONF_KEY} must be one of {_VALID}, got {mode!r}")
    return mode


def materialize(df: DataFrame) -> DataFrame:
    """Pin ``df``'s result and truncate its lineage, with the
    fault-tolerance strategy picked by config (see module docstring)."""
    mode = _mode(df)
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode == "persist":
        # persist() pins BLOCKS but keeps the full logical plan;
        # operators that reference each round's result several times
        # (star-contraction reads the edge set ~4x per round) grow the
        # plan exponentially and OOM the ANALYZER long before any data
        # does. Rebuilding the frame over the RDD truncates the SQL
        # lineage (the plan becomes a LogicalRDD scan), and persisting
        # the REBUILT frame pins its blocks so the JVM→Python→JVM row
        # round-trip at the RDD boundary happens exactly once, in the
        # eager count below — not on every downstream action (r4 had it
        # per-evaluation: the persist sat on the source frame, so each
        # action re-serialized every row from the persisted blocks).
        # On executor loss, lost blocks recompute from the full lineage
        # including the round-trip — same guarantee, slower rebuild;
        # for very deep lineage use mode "checkpoint" instead.
        rebuilt = df.sparkSession.createDataFrame(df.rdd, df.schema)
        out = rebuilt.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()  # eager: populate before callers branch
        out._php_etl_persisted_source = out  # for unmaterialize()
        return out
    spark = df.sparkSession
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        ckdir = None
        try:
            ckdir = spark.conf.get(CHECKPOINT_DIR_KEY, None)
        except Exception:  # noqa: BLE001
            ckdir = None
        sc.setCheckpointDir(ckdir or os.path.join(os.getcwd(), ".spark-checkpoints"))
    return df.checkpoint(eager=True)


def unmaterialize(df: DataFrame) -> None:
    """Release a persisted materialization (no-op for the other
    modes — localCheckpoint/checkpoint blocks age out with the
    session/dir)."""
    try:
        src = getattr(df, "_php_etl_persisted_source", None)
        if src is not None:
            src.unpersist()
        df.unpersist()
    except Exception:  # noqa: BLE001 — never fail a pipeline on cleanup
        pass
