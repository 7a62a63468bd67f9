"""Text-analysis operators over a document table.

All pure Catalyst expressions (whole-stage codegen; no Python in the
row path): normalization, tokenization, shingling, quality stats,
n-gram language scoring, and canonical fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small marker-word sets for the language-id heuristic. Real
# deployments plug in fastText/CLD3 via a pandas UDF; the heuristic
# keeps the operator deterministic and dependency-free.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "fr": ["le", "la", "et", "des", "une"],
    "de": ["der", "die", "und", "nicht", "ein"],
    "es": ["el", "los", "y", "una", "que"],
}

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def normalize(col: Column | str) -> Column:
    """Canonical text form: lowercase, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (empty-safe)."""
    return F.filter(F.split(normalize(col), " "), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles — the dedup unit for Jaccard /
    MinHash. Built from sequence+transform+slice (no explode needed at
    the caller; arrays stay columnar).

    The token array is bound to a lambda variable (via the outer
    single-element transform) so tokenization runs ONCE per row — a
    subexpression referenced inside a higher-order-function lambda is
    otherwise re-evaluated per element, turning shingling O(tokens²).
    """

    def grams_of(xs: Column) -> Column:
        # sequence(1, 0) runs DESCENDING in Spark — guard short docs
        # with an explicit empty list instead
        idx = F.when(
            F.size(xs) >= n, F.sequence(F.lit(1), F.size(xs) - (n - 1))
        ).otherwise(F.expr("CAST(array() AS array<int>)"))
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(xs, i, n)))
        )

    return F.element_at(F.transform(F.array(tokens(col)), grams_of), 1)


def char_count(col: Column | str, char_class: str) -> Column:
    """Number of characters matching a regex class."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, char_class, ""))


def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score, the
    filter-stage signals of a pretraining data pipeline."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_char = F.length(F.col(text_col))
    punct = char_count(text_col, r"[.,!?;:]")
    digit = char_count(text_col, r"[0-9]")
    upper = char_count(text_col, r"[A-Z]")
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    avg_tok_len = F.when(
        n_tok > 0, F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x) / n_tok
    ).otherwise(F.lit(0.0))
    punct_ratio = punct / n_char
    digit_ratio = digit / n_char
    upper_ratio = upper / n_char
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    score = (
        stop_ratio
        + F.least(avg_tok_len / 10, F.lit(1.0))
        - digit_ratio
        - upper_ratio
        - punct_ratio
    )
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_char.alias("n_chars_measured"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        upper_ratio.alias("upper_ratio"),
        stop_ratio.alias("stopword_ratio"),
        avg_tok_len.alias("avg_token_len"),
        score.alias("quality_score"),
    )


def _isin_pred(markers: list[str]):
    # NB: a second lambda parameter would be interpreted by F.filter
    # as the array index — keep the predicate unary via a closure
    return lambda x: x.isin(markers)


def language_scores(col: Column | str) -> dict[str, Column]:
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, _isin_pred(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def language_id(col: Column | str) -> Column:
    """Argmax marker-hit language with deterministic tie order
    (declaration order of LANG_MARKERS; 'und' when nothing hits)."""
    scores = language_scores(col)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(scores)):
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 of the sorted distinct
    token set — whitespace/order/duplication-insensitive identity."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def normalized_hash(col: Column | str) -> Column:
    """md5 of the normalized text — the exact-dedup key."""
    return F.md5(normalize(col))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 300,
    stride: int = 200,
) -> DataFrame:
    """Split documents into overlapping character windows (chunk i
    covers [i*stride, i*stride+size)) — the chunking pre-pass for
    embedding/RAG pipelines. Pure columnar explode: output rows ∝
    total text volume / stride, no UDF. Token-budgeted chunking swaps
    the length expression for token_count; the shape is identical."""
    c = F.col(text_col)
    last = F.greatest(
        F.floor((F.length(c) - 1) / stride).cast("int"), F.lit(0)
    )
    starts = F.sequence(F.lit(0), last)
    return (
        df.select(F.col(id_col), c.alias("__t"), F.explode(starts).alias("chunk_idx"))
        .select(
            id_col,
            "chunk_idx",
            F.col("__t")
            .substr(F.col("chunk_idx") * stride + 1, F.lit(size))
            .alias("chunk"),
        )
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style repetition diagnostics per document — the signals a
    quality filter thresholds to drop boilerplate/spam:

    - ``n_lines`` / ``n_unique_lines``: duplicate-line fraction (pages
      full of repeated nav/footer lines score high)
    - ``top_word_ratio``: frequency of the most common token over all
      tokens (keyword-stuffed spam scores high)

    All JVM array ops (split + aggregate folds), narrow, no shuffle.
    """
    toks = tokens(text_col)
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    # mode frequency via sort + linear scan fold: sort the token array,
    # count the longest run. aggregate state: (prev, run, best)
    sorted_toks = F.array_sort(toks)
    top_run = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_toks = F.size(toks)
    return df.select(
        F.col("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(F.array_distinct(lines)).alias("n_unique_lines"),
        F.when(n_toks > 0, top_run / n_toks).otherwise(F.lit(0.0)).alias("top_word_ratio"),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_freq: int = 2,
) -> tuple[list[dict], DataFrame]:
    """Byte-pair-encoding merge training over the corpus — the
    tokenizer-construction loop (Sennrich et al. 2016), Spark-first.

    The corpus is first collapsed to its WORD-FREQUENCY table
    (vocab-sized, Zipf-bounded), so every merge round costs one pass
    over the vocabulary regardless of corpus size — the same move
    production BPE trainers make. Each round:

    1. adjacent symbol pairs come from a narrow ``zip_with`` of each
       word's symbol array with its own tail (columnar, no Python);
    2. the winning pair is the max-frequency pair (ties broken by
       lexicographic pair order, so training is DETERMINISTIC) —
       a 1-row ``limit(1).collect()``, the only driver traffic;
    3. the merge applies vocabulary-wide as a left-to-right
       ``aggregate`` fold over each symbol array (greedy non-
       overlapping replacement, standard BPE apply semantics);
    4. the state materializes (php_etl_spark.materialize) to truncate
       lineage, exactly like the k-means / PageRank loops.

    Stops early when no pair reaches ``min_freq``. Returns the merge
    table (rank, left, right, merged, freq) and the final symbolized
    vocabulary DataFrame ``(w, syms, f)``.
    """
    from php_etl_spark.materialize import materialize

    wf = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    state = wf.select(
        "w", "f", F.split("w", "").alias("syms")
    )
    state = materialize(state)

    def _pairs(frame: DataFrame) -> DataFrame:
        n = F.size("syms")
        zipped = F.zip_with(
            F.slice("syms", 1, F.greatest(n - 1, F.lit(0))),
            F.slice("syms", 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
        return (
            frame.select(F.explode(zipped).alias("p"), "f")
            .groupBy("p.a", "p.b")
            .agg(F.sum("f").alias("freq"))
        )

    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pairs(state)
            .orderBy(F.desc("freq"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["freq"] < min_freq:
            break
        a, b, freq = best[0]["a"], best[0]["b"], best[0]["freq"]
        merged = a + b
        merges.append(
            {"rank": rank, "left": a, "right": b,
             "merged": merged, "freq": int(freq)}
        )
        state = materialize(
            state.select("w", "f", merge_fold(a, b).alias("syms"))
        )
    return merges, state


def merge_fold(a: str, b: str) -> Column:
    """One BPE merge applied to a ``syms`` array column: the standard
    greedy left-to-right non-overlapping replacement of every adjacent
    (a, b) symbol pair with the concatenated symbol, as a columnar
    ``aggregate`` fold (no Python, no shuffle). Shared by the training
    loop above and ``bpe_apply_frozen``."""
    merged = a + b
    return F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_apply_frozen(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "w"
) -> DataFrame:
    """Tokenizer APPLICATION with a frozen merge table — the serving
    path of BPE (the trained vocab ships with the model; corpora are
    encoded against it, never re-trained). Each word splits to
    characters and replays the merge list in rank order through the
    same ``merge_fold`` the trainer uses. Pure narrow expressions:
    applying a vocabulary to a 100 TB corpus is one map stage over the
    distinct-word table. Returns (w, syms)."""
    state = words.select(
        F.col(word_col).alias("w"), F.split(word_col, "").alias("syms")
    )
    for a, b in merges:
        state = state.select("w", merge_fold(a, b).alias("syms"))
    return state
