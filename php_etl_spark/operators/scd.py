"""Slowly-changing-dimension maintenance (SCD Type 2).

The reference's update path overwrites attribute values in place
(db_update, /root/reference/sdk/lib/db.php:285-296 — SCD Type 1,
history lost). Type 2 keeps every version with a validity interval:
when a tracked attribute changes, the current row is closed
(``valid_to`` = change timestamp) and a new current version opens.
This is the standard dimension shape feeding point-in-time joins
(``asof_join`` pairs with it for fact enrichment).

Scale shape: one equi-join of current rows against the update batch
plus two unions — cost ∝ |updates| + |dimension|, one shuffle on the
business key, no windows over history. At 100 TB the dimension is
the small side; the expensive part (fact enrichment) stays in
asof/range joins downstream.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_tracked_differs(tracked: Sequence[str]) -> Column:
    """NULL-safe 'any attribute changed' predicate between the current
    row (``cur_<c>``) and the incoming row (``upd_<c>``)."""
    return reduce(
        lambda a, b: a | b,
        [~F.col(f"cur_{c}").eqNullSafe(F.col(f"upd_{c}")) for c in tracked],
    )


def scd2_merge(
    existing: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply an update batch to a Type-2 dimension.

    ``existing``: (keys…, tracked…, valid_from, valid_to) — history
    rows have ``valid_to`` set, current rows have it NULL.
    ``updates``: (keys…, tracked…, ts_col) — at most one row per key
    (pre-dedup a raw feed with e.g. first-wins on the latest ts).

    Emits the merged dimension:
      - history rows unchanged;
      - current rows with no update, or an update equal on every
        tracked column (NULL-safe): unchanged;
      - current rows whose update differs: CLOSED (valid_to = update
        ts) plus a NEW current version carrying the updated values;
      - keys never seen before: new current rows.
    """
    hist = existing.filter(F.col(valid_to).isNotNull())
    cur = existing.filter(F.col(valid_to).isNull())

    other = [c for c in existing.columns if c not in keys]
    cur_p = cur.select(
        *keys, *[F.col(c).alias(f"cur_{c}") for c in other]
    )
    upd_p = updates.select(
        *keys,
        *[F.col(c).alias(f"upd_{c}") for c in tracked],
        F.col(ts_col).alias("upd_ts"),
    )
    paired = cur_p.join(upd_p, list(keys), "full_outer")

    differs = _any_tracked_differs(tracked)
    has_cur = F.col(f"cur_{valid_from}").isNotNull()
    has_upd = F.col("upd_ts").isNotNull()

    # current rows kept as-is: no update, or update equal everywhere
    kept = paired.filter(has_cur & (~has_upd | ~differs)).select(
        *keys, *[F.col(f"cur_{c}").alias(c) for c in other]
    )
    # current rows closed by a differing update
    closed = paired.filter(has_cur & has_upd & differs).select(
        *keys,
        *[
            F.col("upd_ts").alias(c)
            if c == valid_to
            else F.col(f"cur_{c}").alias(c)
            for c in other
        ],
    )
    # opened versions: differing update on an existing key, or a key
    # with no current row at all (brand new, or key whose versions are
    # all closed — re-activation)
    opened = paired.filter(has_upd & (~has_cur | differs)).select(
        *keys,
        *[
            (
                F.col(f"upd_{c}")
                if c in tracked
                else F.col("upd_ts")
                if c == valid_from
                else F.lit(None).cast(existing.schema[c].dataType)
            ).alias(c)
            for c in other
        ],
    )
    return hist.unionByName(kept).unionByName(closed).unionByName(opened)


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a change-data-capture feed to a snapshot: latest change
    per key wins (ordered by ``seq_cols`` — make them a total order:
    LSN, or commit-ts + change-id), ``D`` deletes the key, anything
    else (insert/update) upserts the change's payload. The Spark-
    native equivalent of replaying the reference's per-record
    insert/update/delete loop (db_insert_many + db_update + delete,
    /root/reference/sdk/lib/db.php:250-296) as ONE set operation.

    ``changes`` must carry the base schema plus ``op_col`` and
    ``seq_cols``; the result has exactly the base schema. Scale shape:
    the latest-wins window shuffles only the CHANGE FEED (a day's
    changes, not the 100 TB snapshot); the snapshot is touched by one
    left-anti join on the key — partition-scoped rewrite downstream
    (see writers.upsert) keeps the sink cost ∝ touched partitions."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    payload = [c for c in base.columns]
    survivors = base.join(
        latest.select(*[F.col(k) for k in keys]), on=list(keys), how="left_anti"
    )
    upserts = latest.filter(F.col(op_col) != "D").select(*payload)
    return survivors.unionByName(upserts)
