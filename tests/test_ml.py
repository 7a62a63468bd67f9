"""ML-training utility operators (round 5): rank-sum AUC, k-fold
assignment, feature hashing, target encoding, quantile binning,
learning curve, negative sampling — shape/invariant tests plus a
differential AUC check against the naive row-rank definition."""

from __future__ import annotations

import pytest

from php_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_auc_rank_sum_matches_naive_definition(spark):
    """The grouped rank-sum AUC must equal the textbook definition
    AUC = P(score_pos > score_neg) + 0.5*P(tie), computed naively
    over all (pos, neg) pairs on a small deterministic sample."""
    import itertools

    rows = (
        QUERIES["ml_auc_rank"](spark, SF_DIR).collect()
    )
    assert len(rows) == 1
    got_ppm = rows[0]["auc_ppm"]

    # rebuild the same (y, score) pairs the query derives, naively
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    h = F.md5(F.concat_ws(":", F.col("l_orderkey"), F.col("l_linenumber")))
    scored = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        (
            F.round(F.col("l_discount") * 100).cast("long") * 10
            + F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 10
        ).alias("score"),
    ).collect()
    pos = [r["score"] for r in scored if r["y"] == 1]
    neg = [r["score"] for r in scored if r["y"] == 0]
    wins = ties = 0
    for p, n in itertools.product(pos, neg):
        if p > n:
            wins += 1
        elif p == n:
            ties += 1
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert got_ppm == round(want * 1e6), (got_ppm, want)


def test_learning_curve_subsets_nest(spark):
    rows = {r["frac_pct"]: r for r in QUERIES["ml_learning_curve"](spark, SF_DIR).collect()}
    assert sorted(rows) == [10, 25, 50, 100]
    for lo, hi in [(10, 25), (25, 50), (50, 100)]:
        assert rows[lo]["n_pos"] <= rows[hi]["n_pos"]
        assert rows[lo]["n_neg"] <= rows[hi]["n_neg"]
    for r in rows.values():
        assert 0 <= r["auc_ppm"] <= 1_000_000


def test_kfold_assignment_balanced_and_total(spark):
    rows = QUERIES["ml_kfold_assign"](spark, SF_DIR).collect()
    assert sorted(r["fold"] for r in rows) == [0, 1, 2, 3, 4]
    total = sum(r["n"] for r in rows)
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert total == n_orders
    sizes = [r["n"] for r in rows]
    # md5 folds should be near-uniform: no fold more than 2x another
    assert max(sizes) <= 2 * min(sizes), sizes


def test_feature_hashing_bounded_and_deterministic(spark):
    df = QUERIES["ml_feature_hashing"](spark, SF_DIR)
    rows = df.collect()
    assert rows, "expected hashed features"
    assert all(0 <= r["bucket"] < 32 for r in rows)
    # determinism under different partitioning
    again = {
        (r["doc_id"], r["bucket"]): r["weight"]
        for r in df.repartition(7).collect()
    }
    assert {(r["doc_id"], r["bucket"]): r["weight"] for r in rows} == again


def test_target_encoding_no_self_leak(spark):
    """A category where every row has y=1 except one y=0 row: that
    row's LOO encoding must be 1000 milli (all OTHERS are 1), and the
    y=1 rows must see (n_pos-1)/(n-1), never their own label."""
    from pyspark.sql import functions as F

    rows = QUERIES["ml_target_encoding"](spark, SF_DIR)
    # invariants on the real data: 0 <= enc <= 1000, and a row's
    # encoding computed from (sum_y - y)/(n - 1) never equals a value
    # outside that closed range
    bad = rows.filter(
        (F.col("loo_enc_milli") < 0) | (F.col("loo_enc_milli") > 1000)
    ).count()
    assert bad == 0
    # per-category: y=1 rows must have encoding <= y=0 rows' encoding
    # is FALSE in general; the correct invariant is that within one
    # category the two encodings differ by round(1000/(n-1)) when both
    # labels occur — spot-check one category
    seg = (
        rows.groupBy("c_mktsegment", "y")
        .agg(F.min("loo_enc_milli").alias("lo"), F.max("loo_enc_milli").alias("hi"))
        .collect()
    )
    per = {}
    for r in seg:
        per.setdefault(r["c_mktsegment"], {})[r["y"]] = (r["lo"], r["hi"])
    for cat, d in per.items():
        if 0 in d and 1 in d:
            # each label class has ONE encoding value per category
            assert d[0][0] == d[0][1] and d[1][0] == d[1][1], (cat, d)
            # excluding your own 1 lowers the mean: enc(y=1) < enc(y=0)
            assert d[1][0] <= d[0][0], (cat, d)


def test_quantile_binning_partitions_rows(spark):
    rows = QUERIES["ml_quantile_binning"](spark, SF_DIR).collect()
    assert [r["bin"] for r in rows] == [0, 1, 2, 3]
    total = sum(r["n"] for r in rows)
    n_li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    assert total == n_li
    # bins are ordered and contiguous in value space
    for a, b in zip(rows, rows[1:]):
        assert a["max_cents"] <= b["min_cents"]
    # equal-frequency: no bin is off by more than 2% of rows from 25%
    for r in rows:
        assert abs(r["n"] - n_li / 4) <= max(0.02 * n_li, 2), rows


def test_negative_sampling_excludes_positives(spark):
    from pyspark.sql import functions as F

    neg = QUERIES["ml_negative_sampling"](spark, SF_DIR)
    pos = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(F.col("l_suppkey").alias("suppkey"), F.col("l_partkey").alias("neg_partkey"))
        .distinct()
    )
    leaked = neg.join(pos, ["suppkey", "neg_partkey"], "left_semi").count()
    assert leaked == 0
    rows = neg.collect()
    assert rows
    assert all(r["k"] in (0, 1) for r in rows)


def test_hhi_bounds(spark):
    rows = QUERIES["agg_hhi_concentration"](spark, SF_DIR).collect()
    for r in rows:
        # 1/n <= HHI <= 1
        assert r["hhi_ppm"] <= 1_000_000
        assert r["hhi_ppm"] * r["n_firms"] >= 1_000_000 - r["n_firms"], r


def test_confusion_matrix_margins(spark):
    from collections import defaultdict

    rows = QUERIES["ml_confusion_matrix"](spark, SF_DIR).collect()
    by_actual = defaultdict(int)
    for r in rows:
        assert 0 <= r["recall_milli"] <= 1000
        assert 0 <= r["precision_milli"] <= 1000
        by_actual[r["actual"]] += r["n"]
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(by_actual.values()) == n_docs


def test_ip_cidr_matches_python_ipaddress(spark):
    """The integer div/mod CIDR math must agree with the stdlib's
    ipaddress module on every derived address."""
    import ipaddress

    rows = QUERIES["fn_ip_cidr"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        ip = ipaddress.IPv4Address(r["ip32"])
        assert str(ip) == r["ip_str"], (r["ip32"], r["ip_str"])
        assert ip.is_private == r["is_private"] or (
            # stdlib is_private also covers ranges we deliberately
            # exclude (loopback, link-local, 100.64/10, 192.0.0/24...)
            ip.is_private and not r["is_private"]
        ), r
        # RFC-1918 specifically must match exactly
        rfc1918 = any(
            ip in net
            for net in (
                ipaddress.ip_network("10.0.0.0/8"),
                ipaddress.ip_network("172.16.0.0/12"),
                ipaddress.ip_network("192.168.0.0/16"),
            )
        )
        assert rfc1918 == r["is_private"], (str(ip), r["is_private"])
        assert r["subnet24"] == r["ip32"] - r["ip32"] % 256


def test_uuid_deterministic_is_valid_and_stable(spark):
    import uuid as uuidlib

    df = QUERIES["fn_uuid_deterministic"](spark, SF_DIR)
    rows = {r["c_custkey"]: r["uuid3"] for r in df.collect()}
    assert rows
    for key, u in rows.items():
        parsed = uuidlib.UUID(u)  # raises on malformed
        assert parsed.version == 3, (key, u)
    # stable across re-computation and partitioning
    again = {r["c_custkey"]: r["uuid3"] for r in df.repartition(5).collect()}
    assert rows == again


def test_aspect_bucket_total_and_square_case(spark):
    rows = QUERIES["multimodal_aspect_bucket"](spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n_images"] for r in rows) == n_docs
    assert {r["bucket"] for r in rows} <= {"1:1", "4:3", "3:4", "16:9", "9:16"}


def test_novelty_rate_bounds_and_first_doc_fully_novel(spark):
    rows = QUERIES["docs_novelty_rate"](spark, SF_DIR).collect()
    assert rows
    by_doc = {r["doc_id"]: r for r in rows}
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert 0 <= r["novelty_milli"] <= 1000
    # the earliest doc with shingles owns all of its shingles
    first = min(by_doc)
    assert by_doc[first]["novelty_milli"] == 1000, by_doc[first]


def test_gbdt_stumps_loss_decreases_and_round1_matches_oracle(spark):
    """The boosting loop's round-1 stump must match the
    oracle-checked ml_gbdt_split_gain answer (margin 0 gives exactly
    the half-unit gradients that query uses), and the pre-round
    log-loss must strictly decrease across rounds."""
    rows = QUERIES["ml_gbdt_stumps"](spark, SF_DIR).collect()
    assert [r["round"] for r in rows] == [1, 2, 3, 4, 5]
    losses = [r["loss_before_milli"] for r in rows]
    assert all(a > b for a, b in zip(losses, losses[1:])), losses
    # round-0 loss is log(2) of the zero model
    assert losses[0] == 693

    best = {
        r["feature"]: r["split_bin"]
        for r in QUERIES["ml_gbdt_split_gain"](spark, SF_DIR).collect()
    }
    first = rows[0]
    # qty/disc naming differs between the two query surfaces
    feat_map = {"qty_bin": "qty", "disc_bin": "disc"}
    assert best[feat_map[first["feature"]]] == first["split_bin"], (
        first, best,
    )


def test_gbdt_stumps_matches_pure_python_reference(spark):
    """Same algorithm in pure Python over the collected rows must pick
    the identical stump sequence on well-separated gains."""
    import math

    from php_etl_spark.ml import train_gbdt_stumps

    data = [
        # feature f1 separates perfectly at <=2; f2 is noise
        (1, 7, 0.0), (2, 9, 0.0), (1, 9, 0.0), (2, 7, 0.0),
        (5, 7, 1.0), (6, 9, 1.0), (5, 9, 1.0), (6, 7, 1.0),
    ] * 4
    df = spark.createDataFrame(data, "f1 LONG, f2 LONG, y DOUBLE")
    model = train_gbdt_stumps(df, ["f1", "f2"], "y", rounds=3, lr=0.5)

    def py_train(rows, feats, rounds, lr, lam=1.0):
        margins = [0.0] * len(rows)
        stumps = []
        for _ in range(rounds):
            gh = {}
            for m, row in zip(margins, rows):
                p = 1.0 / (1.0 + math.exp(-m))
                g, h = p - row[-1], p * (1 - p)
                for fi, f in enumerate(feats):
                    key = (f, row[fi])
                    a, b = gh.get(key, (0.0, 0.0))
                    gh[key] = (a + g, b + h)
            best = None
            for fi, f in enumerate(feats):
                bins = sorted(b for (ff, b) in gh if ff == f)
                gt = sum(gh[(f, b)][0] for b in bins)
                ht = sum(gh[(f, b)][1] for b in bins)
                gl = hl = 0.0
                for b in bins[:-1]:
                    gl += gh[(f, b)][0]
                    hl += gh[(f, b)][1]
                    gr, hr = gt - gl, ht - hl
                    gain = (
                        gl * gl / (hl + lam) + gr * gr / (hr + lam)
                        - gt * gt / (ht + lam)
                    )
                    cand = (gain, f, b, -gl / (hl + lam), -gr / (hr + lam))
                    if best is None or cand[0] > best[0]:
                        best = cand
            _, f, split, wl, wr = best
            stumps.append((f, split))
            fi = feats.index(f)
            for i, row in enumerate(rows):
                margins[i] += lr * (wl if row[fi] <= split else wr)
        return stumps

    want = py_train(data, ["f1", "f2"], rounds=3, lr=0.5)
    got = [(f, s) for f, s, _wl, _wr in model["stumps"]]
    assert got == want, (got, want)
    # the separating feature must be chosen first, at the gap
    assert got[0] == ("f1", 2)
