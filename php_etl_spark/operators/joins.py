"""Join operators (SURVEY.md §2.4).

The reference's joins are either SQL inner joins
(/root/reference/sdk/migrate_conjoint.php:76-84) or — dominantly —
per-row ``SELECT ... WHERE key=? LIMIT 1`` probes against another
table (/root/reference/sdk/migrate_assures.php:19-36), i.e. O(N)
network round trips. Every one of those becomes a set-oriented join
here; small dimension sides get an explicit broadcast hint so the
probe pattern costs one shuffle-free pass at any scale.

Extensions the reference lacks (as-of, range) are composed from
built-in ops — no RDDs, no Python row loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lookup_join(
    driver: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """The J2 per-row probe as one broadcast hash join.

    ``how='inner'`` reproduces the miss-skip path
    (/root/reference/sdk/migrate_conjoint.php:124-127), ``how='left'``
    the keep-on-miss path (/root/reference/sdk/migrate_assure_users.php:217-231).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return driver.join(d, on=on, how=how)


def semi_join(df: DataFrame, other: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Existence probe (J4): keep rows whose key exists in ``other``
    (registrant_exists, /root/reference/sdk/migrate_employeur.php:27-40)."""
    return df.join(other, on=on, how="left_semi")


def anti_join(df: DataFrame, other: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Dedup-against-destination (J5): keep rows whose unique key does
    NOT exist in the destination (ETLTask,
    /root/reference/sdk/src/ETLTask.php:43-53)."""
    return df.join(other, on=on, how="left_anti")


def fanout_join(
    parent: DataFrame, child: DataFrame, on: str | Sequence[str]
) -> DataFrame:
    """1:N re-association (J6) preserving child multiplicity
    (carriere fan-out, /root/reference/sdk/migrate_assures.php:90-96,217-227)."""
    return parent.join(child, on=on, how="inner")


def range_join(
    fact: DataFrame,
    ranges: DataFrame,
    value: str | Column,
    lo: str | Column,
    hi: str | Column,
    how: str = "inner",
) -> DataFrame:
    """Band join: fact.value ∈ [ranges.lo, ranges.hi).

    Capability extension (no theta joins in the reference). The small
    ranges side is broadcast — a nested-loop broadcast join, which is
    the right physical plan for a fact×tiny-dim interval probe.
    """
    v = F.col(value) if isinstance(value, str) else value
    lo_c = F.col(lo) if isinstance(lo, str) else lo
    hi_c = F.col(hi) if isinstance(hi, str) else hi
    return fact.join(F.broadcast(ranges), (v >= lo_c) & (v < hi_c), how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the temporally matching right
    row within the same key group —

    - ``backward`` (default): latest right with ``right_ts <= left_ts``
    - ``forward``: earliest right with ``right_ts >= left_ts``
    - ``nearest``: whichever of the two is closer (tie → backward)

    ``tolerance`` (pandas.merge_asof parity) bounds the match: a
    carried value farther than ``tolerance`` from the left timestamp
    comes back NULL instead — seconds for timestamp columns, plain
    units for numeric ones (both compare via the double cast).

    Implemented as union + sort + value carry inside a window — one
    shuffle on the key, no per-row probes, no range explosion. This is
    the scalable pattern for "most recent prior event" joins (the
    naive formulation is a non-equi join that Catalyst would execute
    as a broadcast nested loop).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction}")
    on_cols = [on] if isinstance(on, str) else list(on)

    l_tag = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_proj = (
        right.select(
            *on_cols,
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(c + suffix) for c in right_values],
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__rts", F.col("__ts"))
    )
    merged = l_tag.unionByName(r_proj, allowMissingColumns=True)

    # backward: right rows sort BEFORE left at equal ts (ties match, per
    # "<="); forward: right rows sort AFTER left at equal ts (per ">=")
    wb = (
        Window.partitionBy(*on_cols)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on_cols)
        .orderBy(F.col("__ts").asc(), F.col("__side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = merged
    if direction in ("backward", "nearest"):
        carried = carried.select(
            "*",
            F.last("__rts", ignorenulls=True).over(wb).alias("__bts"),
            *[
                F.last(F.col(c + suffix), ignorenulls=True)
                .over(wb)
                .alias(c + "__b")
                for c in right_values
            ],
        )
    if direction in ("forward", "nearest"):
        carried = carried.select(
            "*",
            F.first("__rts", ignorenulls=True).over(wf).alias("__fts"),
            *[
                F.first(F.col(c + suffix), ignorenulls=True)
                .over(wf)
                .alias(c + "__f")
                for c in right_values
            ],
        )
    out = carried.filter(F.col("__side") == 1)
    b_gap = F.col("__ts").cast("double") - F.col("__bts").cast("double")
    f_gap = F.col("__fts").cast("double") - F.col("__ts").cast("double")
    b_ok = F.lit(True) if tolerance is None else b_gap <= F.lit(float(tolerance))
    f_ok = F.lit(True) if tolerance is None else f_gap <= F.lit(float(tolerance))
    if direction == "nearest":
        # prefer the side that exists; on both, the closer ts, tie →
        # backward (matches pandas.merge_asof)
        take_b = F.col("__fts").isNull() | (
            F.col("__bts").isNotNull() & (b_gap <= f_gap)
        )
        picks = [
            (
                c,
                F.when(take_b & b_ok, F.col(c + "__b")).otherwise(
                    F.when(~take_b & f_ok, F.col(c + "__f"))
                ),
            )
            for c in right_values
        ]
    elif direction == "backward":
        picks = [(c, F.when(b_ok, F.col(c + "__b"))) for c in right_values]
    else:
        picks = [(c, F.when(f_ok, F.col(c + "__f"))) for c in right_values]
    for c, expr in picks:
        out = out.withColumn(c + suffix, expr)
    drop = ["__side", "__ts", "__rts", "__bts", "__fts"] + [
        c + s for c in right_values for s in ("__b", "__f")
    ]
    return out.drop(*[d for d in drop if d in out.columns])


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_cols: Sequence[str],
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join by explicit key salting: the hot keys of
    ``skewed`` are split across ``buckets`` sub-keys via a
    DETERMINISTIC per-row salt (hash of ``salt_cols`` — never a
    random(), which breaks retry/replay determinism), and the small
    side is replicated once per bucket, so one pathological key fans
    across ``buckets`` tasks instead of melting a single reducer.

    This is the manual fallback for engines/joins where AQE skew
    splitting can't help: aggregation-free pipelines with a hard
    downstream partitioner, or a skewed SHUFFLE side too large for
    broadcast. Replication cost is |small| × buckets rows — keep the
    salted side the big one. Same result set as a plain inner join
    (oracle-checked by join_salted_skew)."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    lhs = skewed.withColumn("__salt", salt.cast("int"))
    rhs = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(buckets)])),
    )
    return lhs.join(rhs, [key, "__salt"]).drop("__salt")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    max_dist: int = 1,
) -> DataFrame:
    """Record-linkage fuzzy join: (left_id, right_id, dist) for every
    cross pair within Levenshtein ``max_dist`` — WITHOUT the cross
    join. Blocking is by deletion signatures (SymSpell): a string's
    signature set is itself plus every single-character deletion; two
    strings within edit distance 1 provably share a signature
    (substitution → delete the differing position from both;
    insert/delete → the longer one's deletion IS the shorter), so
    recall is exact, and the candidate join is an equi-join on
    signature — cost ∝ Σ bucket², bounded because signatures are
    near-unique, never |L|×|R|.

    ``max_dist`` must be 1: the single-deletion neighborhood only
    guarantees completeness at distance 1 (greater distances need the
    k-deletion neighborhood — size ∝ len^k — or PassJoin segment
    blocking; levenshtein verification below stays exact either way).
    """
    if max_dist != 1:
        raise ValueError("deletion-signature blocking is exact only for max_dist=1")

    def sigs(col: Column) -> Column:
        drop_i = lambda i: F.concat(  # noqa: E731
            F.substr(col, F.lit(1), i - F.lit(1)),
            F.substr(col, i + F.lit(1), F.length(col) - i),
        )
        return F.array_union(
            F.array(col),
            F.transform(F.sequence(F.lit(1), F.length(col)), drop_i),
        )

    lsig = left.select(
        F.col(left_id).alias("__lid"), F.col(left_str).alias("__ls")
    ).select("__lid", "__ls", F.explode(sigs(F.col("__ls"))).alias("__sig"))
    rsig = right.select(
        F.col(right_id).alias("__rid"), F.col(right_str).alias("__rs")
    ).select("__rid", "__rs", F.explode(sigs(F.col("__rs"))).alias("__sig"))
    cands = (
        lsig.join(rsig, "__sig")
        .select("__lid", "__ls", "__rid", "__rs")
        .distinct()
    )
    return (
        cands.withColumn("dist", F.levenshtein("__ls", "__rs"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("__ls").alias(left_str),
            F.col("__rs").alias(right_str),
            "dist",
        )
    )


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_seconds: int = 604800,
) -> DataFrame:
    """Interval-containment join at scale: point ∈ [lo, hi], executed
    as an EQUI-join on a time-grid bin instead of a nested loop.

    ``range_join`` broadcasts a tiny interval side; when BOTH sides
    are big, the only scalable plan is binning: each interval explodes
    into the grid cells it covers (rows ∝ span/bin — pick bin ≈ median
    span so the factor is ~2), each point computes its one cell, the
    join runs hash-partitioned on the cell key, and the exact
    containment predicate filters within the bin. Join volume is
    candidates-per-cell, never |points|×|intervals|.
    """
    lo_s = F.unix_timestamp(F.col(lo_col))
    hi_s = F.unix_timestamp(F.col(hi_col))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(lo_s / bin_seconds).cast("long"),
                F.floor(hi_s / bin_seconds).cast("long"),
            )
        ),
    )
    p_s = F.unix_timestamp(F.col(point_col))
    pt = points.withColumn("__bin", F.floor(p_s / bin_seconds).cast("long"))
    joined = pt.join(iv, "__bin").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return joined.drop("__bin")
