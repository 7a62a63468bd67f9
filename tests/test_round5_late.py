"""Round-5 late batch: naive Bayes, readability, recursive EWMA,
bipartite co-purchase, incremental view maintenance, kNN vote,
portable MinHash signatures — differential + invariant tests."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

from php_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR


def test_ewma_recursive_matches_python_replay(spark):
    """The applyInPandas IIR pass must equal a per-user Python replay
    of y_i = 0.5*x_i + 0.5*y_{i-1} exactly (alpha=1/2 is exact in
    binary floating point step-by-step)."""
    got = {
        (r["user_id"], r["event_id"]): r["ewma_milli"]
        for r in QUERIES["ts_ewma_recursive"](spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    n = 0
    for uid, rows in by_user.items():
        rows.sort()
        acc = 0.0
        for i, (_, eid, v) in enumerate(rows):
            acc = v if i == 0 else 0.5 * v + 0.5 * acc
            p = acc * 1000.0
            want = int(math.copysign(math.floor(abs(p) + 0.5), p))
            assert got[(uid, eid)] == want
            n += 1
    assert n == len(got) and n > 0


def test_naive_bayes_learns_language(spark):
    """Trained and scored on the same corpus, NB must recover the
    language of most ASCII-tokenized docs (the synthetic langs have
    distinct vocabularies) and emit exactly one row per scored doc."""
    rows = QUERIES["ml_naive_bayes"](spark, SF_DIR).collect()
    assert len(rows) == len({r["doc_id"] for r in rows})
    scored = [r for r in rows]
    assert scored
    acc = sum(1 for r in scored if r["pred_lang"] == r["lang"]) / len(scored)
    # synthetic langs share most vocabulary: NB lands near the majority-
    # class prior (~0.44) but far above uniform chance (0.2), and the
    # likelihood term must produce non-majority predictions too
    assert acc > 0.3
    assert len({r["pred_lang"] for r in rows}) >= 3
    assert all(r["score_milli"] < 0 for r in rows)  # log-probs are negative


def test_readability_bands_and_exact_rational(spark):
    rows = QUERIES["text_readability"](spark, SF_DIR).collect()
    assert rows
    for r in rows[:50]:
        w, s, y = r["words"], r["sentences"], r["syllables"]
        assert w > 0 and s >= 1
        num = 206835 * s * w - 1015 * w * w - 84600 * y * s
        want = int(math.copysign(math.floor(abs(num / (s * w)) + 0.5), num))
        assert r["flesch_milli"] == want
        fm = r["flesch_milli"]
        band = (
            "very_easy" if fm >= 90000
            else "standard" if fm >= 60000
            else "difficult" if fm >= 30000
            else "very_difficult"
        )
        assert r["band"] == band


def test_copurchase_pairs_ordered_and_counted(spark):
    rows = QUERIES["graph_bipartite_copurchase"](spark, SF_DIR).collect()
    assert rows
    assert all(r["part_a"] < r["part_b"] and r["n_orders"] >= 2 for r in rows)
    # recount one pair directly against the raw table
    r0 = rows[0]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    orders_by_part = defaultdict(set)
    for r in li:
        orders_by_part[r["l_partkey"]].add(r["l_orderkey"])
    want = len(orders_by_part[r0["part_a"]] & orders_by_part[r0["part_b"]])
    assert r0["n_orders"] == want


def test_incremental_agg_equals_recompute(spark):
    got = {
        r["o_orderpriority"]: (r["n_orders"], r["total_cents"])
        for r in QUERIES["cdc_incremental_agg"](spark, SF_DIR).collect()
    }
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    want_n: Counter = Counter()
    want_c: Counter = Counter()
    for r in o:
        k = r["o_orderkey"]
        if k % 10 == 0 or (k % 10 != 0 and k % 7 != 0):
            want_n[r["o_orderpriority"]] += 1
            cents = math.floor(abs(r["o_totalprice"] * 100) + 0.5)
            want_c[r["o_orderpriority"]] += int(
                math.copysign(cents, r["o_totalprice"])
            )
    assert got == {p: (want_n[p], want_c[p]) for p in want_n}


def test_knn_classify_vote_shape(spark):
    rows = QUERIES["ml_knn_classify"](spark, SF_DIR).collect()
    ids = [r["query_id"] for r in rows]
    assert len(ids) == len(set(ids)) and ids
    assert all(q % 10 == 0 for q in ids)
    assert all(1 <= r["n_votes"] <= 5 for r in rows)
    assert all(0 <= r["pred_label"] <= 9 and 0 <= r["true_label"] <= 9 for r in rows)


def test_countmin_overestimates_and_hits_heavy_hitters(spark):
    """CM readout must satisfy est >= exact for every token (the
    one-sided error guarantee), and every top-10 estimate must sit
    within the sketch's additive bound eps*N (eps = e/w; with d=4 rows
    the bound holds with prob ~0.98 per query — deterministic for this
    fixed corpus, so asserting it also guards the bucket hashing: a
    broken modulo collapsing all tokens into one bucket would blow the
    bound immediately)."""
    rows = QUERIES["sketch_countmin_portable"](spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(r["cm_est"] >= r["exact_cnt"] for r in rows)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    n_stream = sum(
        len(re.findall(r"[a-z]+", d["text"].lower())) for d in docs
    )
    eps_n = math.e / 64 * n_stream
    for r in rows:
        assert r["cm_est"] - r["exact_cnt"] <= eps_n, (r, eps_n)


def test_gopher_rules_flag_consistency(spark):
    rows = QUERIES["docs_gopher_rules"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (
            r["ok_word_count"] and r["ok_mean_word_len"]
            and r["ok_alpha_fraction"] and r["ok_stopwords"]
        )
        assert r["ok_word_count"] == (20 <= r["words"] <= 100000)
        assert r["ok_stopwords"] == (r["stopwords"] >= 2)
    # the synthetic corpus spans the 20-word cutoff, so both outcomes occur
    assert {r["ok_word_count"] for r in rows} == {True, False}


def test_holt_linear_matches_python_replay(spark):
    """Level/trend/forecast must equal a per-user Python replay of the
    two coupled half-weight recurrences, to the exact milli integer."""
    got = {
        (r["user_id"], r["event_id"]): (
            r["level_milli"], r["trend_milli"], r["forecast_milli"]
        )
        for r in QUERIES["ts_holt_linear"](spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))

    def milli(x: float) -> int:
        return int(math.copysign(math.floor(abs(x * 1000.0) + 0.5), x))

    n = 0
    for uid, rows in by_user.items():
        rows.sort()
        lev = trend = 0.0
        for i, (_, eid, v) in enumerate(rows):
            if i == 0:
                lev, trend = v, 0.0
            else:
                new_l = 0.5 * v + 0.5 * (lev + trend)
                trend = 0.5 * (new_l - lev) + 0.5 * trend
                lev = new_l
            assert got[(uid, eid)] == (milli(lev), milli(trend), milli(lev + trend))
            n += 1
    assert n == len(got) and n > 0


def test_pr_curve_monotone_recall_and_endpoints(spark):
    rows = sorted(
        QUERIES["ml_pr_curve_points"](spark, SF_DIR).collect(),
        key=lambda r: -r["score"],
    )
    assert rows
    prev_tp = prev_fp = 0
    for r in rows:
        assert r["tp"] >= prev_tp and r["fp"] >= prev_fp  # cumulative sweep
        prev_tp, prev_fp = r["tp"], r["fp"]
        assert 0 <= r["precision_ppm"] <= 1_000_000
        assert 0 <= r["recall_ppm"] <= 1_000_000
    assert rows[-1]["recall_ppm"] == 1_000_000  # lowest threshold: all pos
    # lowest-threshold precision == corpus prevalence
    total = rows[-1]["tp"] + rows[-1]["fp"]
    want = int(math.floor(abs(1e6 * rows[-1]["tp"] / total) + 0.5))
    assert rows[-1]["precision_ppm"] == want


def test_stream_ewma_final_state_equals_batch(spark):
    """Single-batch availableNow replay of the streaming EWMA must
    equal the batch operator's final smoothed value per user."""
    stream = {
        r["user_id"]: (r["n_events"], r["ewma_milli"])
        for r in QUERIES["stream_ewma_state"](spark, SF_DIR).collect()
    }
    batch_rows = QUERIES["ts_ewma_recursive"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    last_event = {}
    counts: Counter = Counter()
    for r in ev:
        counts[r["user_id"]] += 1
        k = (r["ts"], r["event_id"])
        if r["user_id"] not in last_event or k > last_event[r["user_id"]]:
            last_event[r["user_id"]] = k
    last_eid = {uid: k[1] for uid, k in last_event.items()}
    final_milli = {
        r["user_id"]: r["ewma_milli"]
        for r in batch_rows
        if r["event_id"] == last_eid[r["user_id"]]
    }
    assert set(stream) == set(counts)
    for uid, (n, milli) in stream.items():
        assert n == counts[uid]
        assert milli == final_milli[uid]


def test_ndcg_mrr_bounds_and_query_count(spark):
    rows = QUERIES["ml_ndcg_mrr"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    with_rel = {x["l_orderkey"] for x in li if x["l_returnflag"] == "R"}
    assert r["n_queries"] == len(with_rel)
    assert 0 < r["mean_ndcg5_ppm"] <= 1_000_000
    assert 0 < r["mean_mrr_ppm"] <= 1_000_000


def test_rolling_zscore_bounded(spark):
    """|z| over an n-point window is bounded by sqrt(n-1) (one point
    carrying all the deviation), so milli values stay under
    1000*sqrt(9)."""
    rows = QUERIES["window_rolling_zscore"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 2 <= r["n"] <= 10
        assert abs(r["z_milli"]) <= 1000 * math.sqrt(r["n"] - 1) + 1


def test_winsorize_clip_bounds(spark):
    rows = QUERIES["agg_winsorize"](spark, SF_DIR).collect()
    assert len(rows) == 3  # returnflag groups
    for r in rows:
        assert r["p05_cents"] <= r["p95_cents"]
        assert (
            1000 * r["p05_cents"]
            <= r["winsor_mean_milli_cents"]
            <= 1000 * r["p95_cents"]
        )


def test_forecast_backtest_counts(spark):
    """Each user contributes exactly (n_events - 1) forecast/actual
    pairs, and MAE is nonnegative."""
    rows = {r["user_id"]: (r["n_evals"], r["mae_milli"]) for r in
            QUERIES["ts_forecast_backtest"](spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    counts: Counter = Counter(r["user_id"] for r in ev)
    expect = {u: n - 1 for u, n in counts.items() if n >= 2}
    assert {u: v[0] for u, v in rows.items()} == expect
    assert all(v[1] >= 0 for v in rows.values())


def test_minhash_signature_python_differential(spark):
    """Recompute one document's 16-slot signature with hashlib and
    assert min-stability (duplicated shingles cannot change it)."""
    sig = QUERIES["dedup_minhash_signature"](spark, SF_DIR)
    rows = sig.collect()
    per_doc = defaultdict(dict)
    for r in rows:
        per_doc[r["doc_id"]][r["j"]] = r["minhash"]
    assert all(len(v) == 16 for v in per_doc.values())
    doc_id = min(per_doc)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    text = next(r["text"] for r in docs if r["doc_id"] == doc_id)
    toks = [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]
    shingles = {
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    }
    assert shingles
    for j in range(16):
        want = min(
            int(hashlib.md5(f"{sh}:{j}".encode()).hexdigest()[:8], 16)
            for sh in shingles
        )
        assert per_doc[doc_id][j] == want
