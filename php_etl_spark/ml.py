"""In-engine gradient-boosted decision stumps (logistic loss).

The distributed-GBDT execution contract (XGBoost/LightGBM, public
method) on DataFrames, completing the ml_gbdt_histogram /
ml_gbdt_split_gain pair with the full boosting LOOP:

- the model (a list of stumps) rides into each round as LITERALS
  compiled into the margin expression — whole-stage codegen, no UDF,
  no per-row state materialized anywhere;
- one round = one aggregate job building the per-(feature, bin)
  gradient/hessian histogram over the current margins (map-side
  combined), plus one scalar loss aggregate — driver traffic is
  HISTOGRAM-sized (|features|·|bins| rows), never data-sized: the
  same contract as pagerank / k-means / train_logreg here;
- the split search runs driver-side over the collected histogram
  (the all-reduce + argmax step every tree learner does centrally).

Features must already be integer bin ids (the ml_gbdt_histogram
contract — quantile binning via ml_quantile_binning-style cutpoints
upstream makes any numeric column conform). With logistic loss from
margin 0, round-1 gradients are ±1/2 and hessians 1/4, so the first
stump found here provably matches ml_gbdt_split_gain's oracle-checked
answer — pytest pins that cross-check.

Deterministic for a given engine build: fixed rounds, zero init, no
RNG, fixed expression shapes. Iterative float fixpoint ⇒ the query
surface is rows-only; loss decrease, accuracy, and the round-1
equivalence are pytest-asserted (tests/test_ml.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _margin(stumps: list[tuple[str, int, float, float]], lr: float) -> Column:
    """Σ lr·(x_f ≤ split ? wL : wR) as one literal-folded expression."""
    z: Column = F.lit(0.0)
    for feat, split, wl, wr in stumps:
        z = z + F.lit(lr) * F.when(
            F.col(feat) <= F.lit(split), F.lit(wl)
        ).otherwise(F.lit(wr))
    return z


def _best_split(
    hist: list, feature_cols: list[str], lam: float
) -> tuple[str, int, float, float, float]:
    """Driver-side split search over the collected histogram rows
    (feature, bin, g, h): returns (feature, split, wL, wR, gain)."""
    best = None
    for feat in feature_cols:
        rows = sorted(
            (r for r in hist if r["feature"] == feat), key=lambda r: r["bin"]
        )
        gt = sum(r["g"] for r in rows)
        ht = sum(r["h"] for r in rows)
        parent = gt * gt / (ht + lam)
        gl = hl = 0.0
        for r in rows[:-1]:
            gl += r["g"]
            hl += r["h"]
            gr, hr = gt - gl, ht - hl
            gain = gl * gl / (hl + lam) + gr * gr / (hr + lam) - parent
            cand = (gain, feat, r["bin"], -gl / (hl + lam), -gr / (hr + lam))
            if best is None or cand[0] > best[0]:
                best = cand
    gain, feat, split, wl, wr = best
    return feat, split, wl, wr, gain


def train_gbdt_stumps(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    rounds: int = 10,
    lr: float = 0.3,
    lam: float = 1.0,
) -> dict:
    """Boosted depth-1 trees. Returns {stumps: [(feature, split, wL,
    wR)], losses: [per-round mean log-loss], lr}. ``feature_cols``
    must be integer bin ids. Apply with ``margin_expr`` below."""
    cols = [F.col(c).cast("long").alias(c) for c in feature_cols]
    base = df.select(*cols, F.col(label_col).cast("double").alias("__y"))
    from php_etl_spark.materialize import materialize

    # 2 scans per round hit this frame; pin it once
    base = materialize(base)
    n = base.count()
    stack = ", ".join(f"'{c}', {c}" for c in feature_cols)
    y = F.col("__y")
    stumps: list[tuple[str, int, float, float]] = []
    losses: list[float] = []
    for _ in range(rounds):
        z = _margin(stumps, lr)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        g = (p - y).alias("__g")
        h = (p * (F.lit(1.0) - p)).alias("__h")
        # stable softplus log-loss on the CURRENT model (pre-update)
        loss = F.when(
            z > 0, F.log1p(F.exp(-z)) + (F.lit(1.0) - y) * z
        ).otherwise(F.log1p(F.exp(z)) - y * z)
        losses.append(base.agg(F.sum(loss)).collect()[0][0] / n)
        hist = (
            base.select(g, h, F.expr(
                f"stack({len(feature_cols)}, {stack}) AS (feature, bin)"
            ))
            .groupBy("feature", "bin")
            .agg(F.sum("__g").alias("g"), F.sum("__h").alias("h"))
            .collect()
        )
        feat, split, wl, wr, _gain = _best_split(hist, feature_cols, lam)
        stumps.append((feat, split, wl, wr))
    return {"stumps": stumps, "losses": losses, "lr": lr}


def margin_expr(model: dict) -> Column:
    """The trained model as a scoring expression over the binned
    feature columns (literal-folded; attach with ``withColumn``)."""
    return _margin(model["stumps"], model["lr"])
