"""In-engine training of a document-quality classifier: logistic
regression by full-batch gradient descent, expressed as DataFrame
aggregates.

The standard pretraining corpus filter is a tiny linear classifier
over cheap text features (the CCNet/fasttext recipe — public method).
Training it IN the engine means the 100 TB corpus never leaves Spark:

- the model is a handful of floats — it rides into each iteration as
  LITERALS compiled into one aggregate expression (whole-stage
  codegen, no UDF, no per-row Python);
- one iteration = one job: sum of per-row gradient contributions per
  feature (map-side combined), k+1 numbers to the driver — traffic is
  MODEL-sized, never data-sized (same contract as pagerank /
  k-means here);
- features standardize once up front from exact integer-cent moments
  so the conditioning (and thus convergence) doesn't depend on
  feature units.

Deterministic: fixed iteration count, zero initialization, no RNG,
float ops in a fixed expression shape — the same corpus and config
always yield the same weights on a given engine build. Iterative
float fixpoint ⇒ rows-only driver check; convergence and separation
properties are pytest-asserted (tests/test_llm.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def standardize(
    df: DataFrame, feature_cols: list[str]
) -> tuple[DataFrame, dict[str, tuple[float, float]]]:
    """Z-score features using exact integer-microunit moments (the
    engine's usual order-insensitive trick), returning the scaled
    frame and the (mean, std) per feature so a scorer can replay the
    exact transform on new data."""
    aggs = []
    for c in feature_cols:
        q = F.round(F.col(c) * 1_000_000).cast("decimal(38,0)")
        aggs.append(F.sum(q).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(q * q).cast("double").alias(f"q_{c}"))
    aggs.append(F.count("*").alias("n"))
    row = df.agg(*aggs).collect()[0]
    n = row["n"]
    stats: dict[str, tuple[float, float]] = {}
    out = df
    for c in feature_cols:
        mean = row[f"s_{c}"] / n / 1e6
        var = max(row[f"q_{c}"] / n / 1e12 - mean * mean, 1e-12)
        std = math.sqrt(var)
        stats[c] = (mean, std)
        out = out.withColumn(c, (F.col(c) - mean) / std)
    return out, stats


def _margin(feature_cols: list[str], w: list[float]) -> Column:
    """w·x + b as one literal-folded column expression."""
    z: Column = F.lit(w[-1])  # bias
    for c, wi in zip(feature_cols, w):
        z = z + F.lit(wi) * F.col(c)
    return z


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 25,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> dict:
    """Full-batch logistic regression. Returns {weights, bias, stats,
    losses} — weights in STANDARDIZED feature space; use ``scorer``
    to apply them to raw columns. One aggregate job per iteration;
    driver traffic is (k+2) doubles per round."""
    scaled, stats = standardize(df, feature_cols)
    scaled = scaled.select(
        *feature_cols, F.col(label_col).cast("double").alias("__y")
    )
    # pin: ~2·iterations scans hit this frame; without it every
    # iteration re-reads and re-standardizes the corpus
    from php_etl_spark.materialize import materialize

    scaled = materialize(scaled)
    n = scaled.count()
    k = len(feature_cols)
    w = [0.0] * (k + 1)
    losses: list[float] = []
    y = F.col("__y")
    for _ in range(iterations):
        z = _margin(feature_cols, w)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - y
        aggs = [F.sum(err * F.col(c)).alias(f"g_{c}") for c in feature_cols]
        aggs.append(F.sum(err).alias("g_bias"))
        # stable log-loss: softplus(-z) + (1-y)·z, summed
        loss = F.when(
            z > 0, F.log1p(F.exp(-z)) + (F.lit(1.0) - y) * z
        ).otherwise(F.log1p(F.exp(z)) - y * z)
        aggs.append(F.sum(loss).alias("loss"))
        row = scaled.agg(*aggs).collect()[0]
        losses.append(row["loss"] / n)
        for i, c in enumerate(feature_cols):
            w[i] -= lr * (row[f"g_{c}"] / n + l2 * w[i])
        w[-1] -= lr * (row["g_bias"] / n)
    return {
        "weights": dict(zip(feature_cols, w[:-1])),
        "bias": w[-1],
        "stats": stats,
        "losses": losses,
    }


def scorer(model: dict, feature_cols: list[str]) -> Column:
    """Probability column applying a trained model to RAW feature
    columns (standardization replayed from the stored stats) — a pure
    codegen expression, broadcastable into any scan."""
    z: Column = F.lit(model["bias"])
    for c in feature_cols:
        mean, std = model["stats"][c]
        z = z + F.lit(model["weights"][c]) * ((F.col(c) - mean) / std)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
