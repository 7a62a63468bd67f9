"""Corpus composition for training-data pipelines: deterministic
stratified mixing and context-window budget packing.

No counterpart in the reference (batch row migration); these are the
operations a 100 TB pretraining corpus needs between dedup and
tokenization. Both are pure JVM column expressions — deterministic
across runs, partitionings and cluster sizes (hash-gated sampling,
not RNG), so a mix is reproducible from its config alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stratified_mix(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Down-sample each stratum to its target rate, deterministically:
    a document is kept iff ``(id * PRIME) mod 10000 < rate * 10000``.
    Hash-gated (no RNG, no state): the same config always selects the
    same documents, any subset of the corpus can be mixed
    independently, and re-runs are idempotent — the property the
    reference engineers by hand with key probes. One narrow filter, no
    shuffle, no sampleBy() RNG-seed dependence on partition layout."""
    gate = F.pmod(F.col(id_col) * F.lit(2654435761), F.lit(10_000))
    rate = F.lit(default_rate)
    for stratum, r in rates.items():
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.filter(gate < rate * 10_000)


def pack_by_budget(
    df: DataFrame,
    budget: int,
    cost_col: str = "n_chars",
    order_col: str = "doc_id",
    group_col: str | None = "source",
) -> DataFrame:
    """Assign documents to context-window bins: within each group (in
    a stable declared order) a document's bin is
    ``floor(running_cost_before_it / budget)`` — the streaming
    first-fit packing a sequence-builder uses to fill training
    contexts. One window aggregate per group; at scale the window
    partitions by ``group_col`` so no global sort is needed. Documents
    costing more than ``budget`` still land alone in their own bin
    (their predecessor-sum jumps by more than one budget)."""
    part = [group_col] if group_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(cost_col).over(w), F.lit(0))
    out_cols: list[Column | str] = [
        F.col(c) for c in df.columns
    ]
    return df.select(
        *out_cols,
        F.floor(cum_before / F.lit(budget)).cast("long").alias("bin"),
    )


def temperature_mix(
    df: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based corpus rebalancing (the multilingual sampling
    rule published with mBERT/XLM-R: stratum probability ∝ n^alpha,
    alpha<1 up-weights rare strata). Realized as per-stratum keep
    rates normalized so the RAREST stratum keeps everything:
    ``rate_s = (n_min / n_s)^(1-alpha)``, applied through the same
    deterministic hash gate as ``stratified_mix``.

    The rates derive from the data in the same plan: one tiny
    per-stratum count aggregate broadcast back onto the corpus — no
    driver round-trip, no config to drift out of date. For
    ``alpha=0.5`` the rate is ``sqrt(n_min/n_s)`` computed with a
    single correctly-rounded IEEE sqrt+divide, bit-identical in every
    engine (general alpha uses pow, whose last-bit rounding is
    engine-specific — fine for production, not for oracle hashing)."""
    counts = df.groupBy(F.col(stratum_col).alias("__s")).agg(
        F.count("*").alias("__n")
    )
    n_min = counts.agg(F.min("__n").alias("__n_min"))
    rates = counts.crossJoin(F.broadcast(n_min))
    ratio = F.col("__n_min").cast("double") / F.col("__n").cast("double")
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    rates = rates.select("__s", rate.alias("__rate"))
    gate = F.pmod(F.col(id_col) * F.lit(2654435761), F.lit(10_000))
    return (
        df.join(F.broadcast(rates), df[stratum_col] == F.col("__s"))
        .filter(gate < F.floor(F.col("__rate") * 10_000))
        .drop("__s", "__rate")
    )


def weighted_sample(
    df: DataFrame,
    weight_threshold: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Importance-weighted deterministic sampling: keep a row iff
    ``hash_gate < weight_threshold`` where the caller supplies the
    per-row threshold on the 0..10000 gate scale (e.g. quality-score
    ∝ keep probability — the FineWeb/DCLM-style quality-weighted
    selection). Same hash gate as stratified_mix: reproducible,
    partition-independent, pushes down as a plain filter."""
    gate = F.pmod(F.col(id_col) * F.lit(2654435761), F.lit(10_000))
    return df.filter(gate < weight_threshold)


def select_by_budget(
    df: DataFrame,
    budget: int,
    score_col: str = "n_chars",
    cost_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Best-docs-under-budget selection: keep rows in (score DESC,
    id ASC) order while the running cost stays within ``budget`` —
    the corpus-curation step "take the highest-quality documents up
    to N tokens".

    Distributed in three bounded steps (the naive form is ONE global
    window = a single-partition sort of the whole corpus):
    1. per-score totals (shuffle on |distinct scores| keys),
    2. running total over the score histogram — a window over the
       tiny histogram, not the corpus,
    3. whole buckets above the cutoff pass; only the single boundary
       bucket gets a per-row window (partitioned BY THE SCORE, so its
       partition is one bucket, not the corpus).
    Equivalent by construction to the global-window definition the
    oracle states."""
    w_hist = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hist = (
        df.groupBy(F.col(score_col).alias("score"))
        .agg(F.sum(cost_col).alias("bucket_cost"))
        .withColumn("run_total", F.sum("bucket_cost").over(w_hist))
    ).withColumn("prev_total", F.col("run_total") - F.col("bucket_cost"))
    scored = df.join(
        F.broadcast(hist), df[score_col] == hist["score"]
    )
    whole = scored.filter(F.col("run_total") <= budget).select(df["*"])
    w_bucket = Window.partitionBy("score").orderBy(F.col(id_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    boundary = (
        scored.filter(
            (F.col("run_total") > budget) & (F.col("prev_total") < budget)
        )
        .withColumn("in_bucket_run", F.sum(cost_col).over(w_bucket))
        .filter(F.col("prev_total") + F.col("in_bucket_run") <= budget)
        .select(df["*"])
    )
    return whole.unionByName(boundary)


def cap_per_stratum(
    df: DataFrame,
    stratum_col: str,
    rank_col: Column,
    k: int,
    tiebreak_col: str = "doc_id",
    salt_partitions: int = 64,
) -> DataFrame:
    """Keep the k smallest-ranked rows per stratum, WITHOUT a
    one-task-per-stratum window: a rank window partitioned only by the
    stratum serializes each stratum into a single task (10 sources x
    billions of docs -> 10 tasks). Two exact phases instead:

    1. local rank within (stratum, salt) where salt derives from the
       rank value itself — parallelism = strata x salt_partitions. Any
       row in the global top-k of its stratum is also in the top-k of
       its salt subgroup (subset ordering), so filtering local rank
       <= k keeps a GUARANTEED superset, at most salt_partitions * k
       rows per stratum.
    2. exact global rank over that bounded survivor set (a window over
       <= salt_partitions * k rows per stratum — trivial at any corpus
       size), filter <= k.

    Result is identical to the single-window formulation — same rows,
    same ranks — which is what lets the oracle stay the naive
    ROW_NUMBER formulation."""
    d = df.withColumn("__r", rank_col).withColumn(
        "__salt", F.pmod(F.col("__r"), F.lit(salt_partitions))
    )
    w_local = Window.partitionBy(stratum_col, "__salt").orderBy(
        "__r", tiebreak_col
    )
    survivors = d.withColumn("__lr", F.row_number().over(w_local)).filter(
        F.col("__lr") <= k
    )
    w_global = Window.partitionBy(stratum_col).orderBy("__r", tiebreak_col)
    return (
        survivors.withColumn("__gr", F.row_number().over(w_global))
        .filter(F.col("__gr") <= k)
        .drop("__r", "__salt", "__lr", "__gr")
    )


def hex_bucket(col: Column, n_buckets: int, *, salt: str = "") -> Column:
    """Deterministic, SQL-portable hash bucket of any value: mix three
    hex digits of md5 with small primes. Weaker mixing than xxhash64
    but expressible identically in every SQL dialect (md5/substr/ascii)
    — which is what lets sketches built on it carry EXACT cross-engine
    oracles. All products stay far below 2^31, so no dialect-dependent
    integer-overflow behavior."""
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    mixed = (
        F.ascii(F.substring(h, 1, 1)) * 17161
        + F.ascii(F.substring(h, 3, 1)) * 131
        + F.ascii(F.substring(h, 5, 1))
    )
    return mixed % n_buckets


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR-style importance weights (public method: Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every raw-corpus document by the log-likelihood ratio of a
    hashed-unigram model of the TARGET corpus against one of the raw
    corpus; resampling raw docs by this weight shifts the pretraining
    mix toward the target domain without a trained classifier.

    Scale shape: both corpora collapse to n_buckets-row count tables
    (one shuffle each, map-side combined); the LLR table is
    bucket-sized and BROADCAST to the per-doc join — no corpus-sized
    side ever moves. Per-bucket LLRs are quantized to integer
    nano-units (the ln() runs on exact integer counts, so both engines
    produce the identical double, and floor() makes it a BIGINT), so a
    document's weight is an exact integer dot product — bit-stable
    across engines and partitionings."""
    from php_etl_spark.llm.text import tokens

    b_of = lambda c: hex_bucket(c, n_buckets)  # noqa: E731
    raw_tok = raw.select(
        id_col, F.explode(tokens(text_col)).alias("t")
    ).withColumn("b", b_of(F.col("t")))
    tgt_tok = target.select(
        F.explode(tokens(text_col)).alias("t")
    ).select(b_of(F.col("t")).alias("b"))
    from php_etl_spark.materialize import materialize

    # per-doc counts first, MATERIALIZED: four consumers hang off the
    # token stream (bucket totals, grand totals, the per-doc join) and
    # Spark re-runs an un-pinned explode once per consumer — pinning
    # the (doc, bucket) table caps tokenization at one pass over each
    # corpus. The pinned tables are count tables (≤ docs × n_buckets
    # and n_buckets rows), never the token stream itself.
    tc = materialize(tgt_tok.groupBy("b").agg(F.count("*").alias("c_t")))
    per_doc = materialize(
        raw_tok.groupBy(id_col, "b").agg(F.count("*").alias("cnt"))
    )
    qc = per_doc.groupBy("b").agg(F.sum("cnt").alias("c_q"))
    spark = raw.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("b"))
    tot = tc.agg(F.sum("c_t").alias("ptot")).crossJoin(
        qc.agg(F.sum("c_q").alias("qtot"))
    )
    B = F.lit(n_buckets)
    ct = F.coalesce(F.col("c_t"), F.lit(0))
    cq = F.coalesce(F.col("c_q"), F.lit(0))
    llr = (
        spine.join(tc, "b", "left")
        .join(qc, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.floor(
                F.log(
                    ((ct + 1.0) * (F.col("qtot") + B))
                    / ((cq + 1.0) * (F.col("ptot") + B))
                )
                * 1000000000
            ).alias("w"),
        )
    )
    return (
        per_doc.join(F.broadcast(llr), "b")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("w")).alias("dsir_weight_nano"),
        )
    )


def shard_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    epoch: int = 0,
) -> DataFrame:
    """Deterministic training-shard assignment + per-epoch pseudo-
    random order, with NO window and NO RNG: ``shard`` is a stable
    hash bucket of the id (data placement never moves between epochs),
    ``shuffle_key`` mixes the id with the epoch salt — sorting a shard
    by (shuffle_key, id) is the epoch's shuffle order. A loader
    re-derives the exact order from (id, epoch) alone: resumable,
    partition-layout-independent, and verifiable by any SQL engine.
    Writing is one hash-partitioned sort — the plan a rand()-ordered
    global sort can't match (nondeterministic under retry, and a
    single total order)."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#e{epoch}")))
    key = (
        F.ascii(F.substring(h, 1, 1)) * 1000000
        + F.ascii(F.substring(h, 3, 1)) * 10000
        + F.ascii(F.substring(h, 5, 1)) * 100
        + F.ascii(F.substring(h, 7, 1))
    )
    return df.withColumn(
        "shard", hex_bucket(F.col(id_col), n_shards)
    ).withColumn("shuffle_key", key.cast("bigint"))
