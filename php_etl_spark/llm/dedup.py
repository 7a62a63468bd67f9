"""Document deduplication at scale: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design notes (the 100 TB story):

- Exact dedup is a hash-groupBy — one shuffle on a 16-byte key.
- Pairwise Jaccard is quadratic; it is only ever computed on
  *candidate pairs*. Candidates come from an inverted shingle index
  (small corpora) or MinHash-LSH band buckets (the subquadratic path:
  cost ∝ documents × bands, pairs only within buckets).
- All hashing is xxhash64 (JVM, codegen) — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from php_etl_spark.llm.text import normalized_hash, word_shingles


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on the normalized-text hash: one row per distinct
    content, keeping the smallest id (deterministic winner) and the
    duplicate count."""
    return (
        df.select(F.col(id_col), normalized_hash(text_col).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def _shingle_table(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # a small parquet file scans as ONE partition; the shingle
    # transform is CPU-bound (interpreted higher-order functions), so
    # spread rows across cores before computing it
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard over an inverted shingle index: explode
    shingles, self-join on shingle (only co-occurring docs meet),
    count intersections, join sizes. Output: (doc_a, doc_b, jaccard)
    with doc_a < doc_b and jaccard >= threshold.

    At large N, feed this only LSH candidates (minhash_lsh_pairs) —
    the inverted index alone blows up on common shingles.
    """
    sh = _shingle_table(df, text_col, id_col, n).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature_cols(n_hashes: int) -> list[str]:
    return [f"mh_{i}" for i in range(n_hashes)]


# Carter-Wegman hash family h_i(x) = (a_i*x + b_i) mod p over the
# Mersenne prime 2^31-1: products stay under 2^62 (no ANSI-mode
# overflow) and the mod makes each h_i non-monotone in x (an affine
# map without the mod would give 32 perfectly-correlated minima).
# Salts are a fixed deterministic sequence (LCG, seed 42).
_MERSENNE_P = (1 << 31) - 1


def _salts(n: int) -> list[tuple[int, int]]:
    state, out = 42, []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % (_MERSENNE_P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE_P
        out.append((a, b))
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 32,
) -> DataFrame:
    """MinHash signatures: for hash family i, sig_i(doc) =
    min over shingles of xxhash64(shingle, salt_i). One explode + one
    groupBy — shuffle ∝ total shingle count, independent of pair
    count."""
    # one string hash per shingle, then n_hashes cheap long ops —
    # instead of n_hashes string hashes per shingle
    sh = _shingle_table(df, text_col, id_col, n).withColumn(
        "base", F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE_P))
    )
    salts = _salts(n_hashes)
    hashes = [
        F.min(
            F.pmod(F.col("base") * F.lit(a) + F.lit(b), F.lit(_MERSENNE_P))
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(salts)
    ]
    return sh.groupBy("doc").agg(*hashes)


def lsh_candidates(
    signatures: DataFrame, n_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """Band the signature (rows per (doc, band) = docs × bands) and
    self-join per band bucket: two docs are candidates iff they agree
    on EVERY row of at least one band — the classic S-curve knob
    (bands=8, rows=4 → ~(j^4) per-band match prob)."""
    rows_per_band = n_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket"))
        )
    banded = signatures.select(
        "doc", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Subquadratic near-dup pipeline: MinHash → LSH banding →
    candidate pairs → exact Jaccard verification on candidates only.
    This is the shape that survives 100 TB; the exact all-pairs join
    does not."""
    # shingle ONCE: the materialized (doc, shingle-array) table feeds
    # both the signature branch and the verification branch (without
    # it, each branch re-tokenizes the corpus). localCheckpoint keeps
    # it on the executors; at cluster scale this is a persist() or a
    # checkpoint to reliable storage.
    par = df.sparkSession.sparkContext.defaultParallelism
    sets_df = (
        df.repartition(par, id_col)
        .select(F.col(id_col).alias("doc"), word_shingles(text_col, n).alias("sh"))
        .localCheckpoint(eager=True)
    )
    sh = sets_df.select("doc", F.explode("sh").alias("shingle")).withColumn(
        "base", F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE_P))
    )
    salts = _salts(n_hashes)
    sigs = sh.groupBy("doc").agg(
        *[
            F.min(
                F.pmod(F.col("base") * F.lit(a) + F.lit(b), F.lit(_MERSENNE_P))
            ).alias(f"mh_{i}")
            for i, (a, b) in enumerate(salts)
        ]
    )
    cands = lsh_candidates(sigs, n_hashes, bands)
    sa = sets_df.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sets_df.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document: explode tokens, hash each with
    xxhash64, let every bit vote ±1, take the sign vector as the
    fingerprint. One explode + one groupBy with 64 conditional sums —
    all JVM codegen, shuffle ∝ token count."""
    from php_etl_spark.llm.text import tokens

    par = df.sparkSession.sparkContext.defaultParallelism
    tok = df.repartition(par, id_col).select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("t")
    ).withColumn("h", F.xxhash64("t"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    voted = tok.groupBy("doc").agg(*votes)
    packed = F.lit(0).cast("long")
    for i in range(64):
        packed = packed.bitwiseOR(
            F.when(F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return voted.select("doc", packed.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distance: int = 3,
) -> DataFrame:
    """Hamming-near pairs via banded SimHash: split 64 bits into
    max_distance+1 bands — any pair within the distance budget must
    agree exactly on ≥1 band (pigeonhole), so candidates come from
    band-bucket joins, then exact popcount(xor) verification."""
    st = simhash_table(df, text_col, id_col)
    n_bands = max_distance + 1
    width = 64 // n_bands
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("bucket"),
        )
        for b in range(n_bands)
    ]
    banded = st.select(
        "doc", "simhash", F.explode(F.array(*bands)).alias("bb")
    ).select("doc", "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.select("doc_a", "doc_b", dist.alias("hamming")).filter(
        F.col("hamming") <= max_distance
    )


def duplicate_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over the duplicate-pair graph — the step
    that turns pairwise near-dup hits into keep/drop decisions (one
    representative per component). Iterative min-label propagation:
    each round every node adopts the smallest label in its
    neighborhood; rounds ∝ component diameter (near-dup components
    are shallow — a handful of rounds in practice). Each round is one
    join + one aggregate, shuffling ∝ edges; localCheckpoint truncates
    the growing lineage so round N doesn't replay rounds 1..N-1.

    Input: (doc_a, doc_b) pairs. Output: (doc, cluster) where cluster
    is the component's minimum doc id (so ``doc == cluster`` marks the
    canonical keeper).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .filter(F.col("u.label") != F.col("l.label"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc"), F.col("label").alias("cluster"))
