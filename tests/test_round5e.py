"""Round-5 fifth batch: Misra-Gries heavy hitters, k-truss cohesion,
Haar wavelets, quantile normalization, Lorenz curve, Benjamini-
Hochberg FDR — differential replays against straight-line Python."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from php_etl_spark.operators.agg import heavy_hitters
from php_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR


def _bucket(orderkey: int) -> int:
    return ((orderkey * 2654435761) % 65536 + 1).bit_length() - 1


def test_heavy_hitters_matches_exact_counts(spark):
    rows = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey"
    ).collect()
    counts = Counter(_bucket(r["l_orderkey"]) for r in rows)
    n = sum(counts.values())
    want = {b: c for b, c in counts.items() if c * 20 > n}
    got = {
        r["bucket"]: r["n_rows"]
        for r in QUERIES["agg_heavy_hitters"](spark, SF_DIR).collect()
    }
    assert got == want
    assert want, "probe data should contain heavy hitters"


def test_heavy_hitters_partition_layout_independent(spark):
    """Phase 1's MG survivors vary with partitioning; the phase-2
    exact recount + filter must cancel that."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        (F.length(F.bin((F.col("l_orderkey") * 2654435761) % 65536 + 1)) - 1)
        .cast("long")
        .alias("bucket")
    )
    one = {
        (r["bucket"], r["n_rows"])
        for r in heavy_hitters(df.repartition(1), "bucket", k=20).collect()
    }
    many = {
        (r["bucket"], r["n_rows"])
        for r in heavy_hitters(df.repartition(13), "bucket", k=20).collect()
    }
    assert one == many and one


def _copurchase_edges(spark):
    baskets = defaultdict(set)
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for items in baskets.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                edges.add((s[i], s[j]))
    return edges


def _truss_fixpoint(edges: set, k: int):
    """Reference peel; returns (surviving edge -> support, depth)."""
    depth = 0
    while True:
        depth += 1
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        sup = {
            (u, v): len(adj[u] & adj[v]) for u, v in edges
        }
        kept = {e for e, s in sup.items() if s >= k - 2}
        if kept == edges:
            return {e: sup[e] for e in kept}, depth
        edges = kept


def test_k_truss_matches_reference_peel(spark):
    edges = _copurchase_edges(spark)
    want, depth = _truss_fixpoint(edges, k=10)
    assert depth <= 12, "oracle unrolls 16 rounds; depth must stay under"
    got = {
        (r["u"], r["v"]): r["support"]
        for r in QUERIES["graph_k_truss"](spark, SF_DIR).collect()
    }
    assert got == want
    assert want, "probe graph should retain a 10-truss"


def test_haar_wavelet_reconstructs(spark):
    """Unnormalized Haar is invertible: x₀ = (a+d)/2, x₁ = (a−d)/2.
    Reconstruct the first 32 hourly counts from the coefficients and
    compare with the directly-computed series."""
    rows = QUERIES["ts_haar_wavelet"](spark, SF_DIR).collect()
    l1 = {(r["event_type"], r["idx"]): (r["approx"], r["detail"])
          for r in rows if r["level"] == 1}
    l2 = {(r["event_type"], r["idx"]): (r["approx"], r["detail"])
          for r in rows if r["level"] == 2}
    # rebuild level-1 approximations from level 2, then the series
    hourly = defaultdict(Counter)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        hourly[r["event_type"]][r["ts"].replace(
            minute=0, second=0, microsecond=0
        )] += 1
    for et in {k[0] for k in l1}:
        series = [c for _, c in sorted(hourly[et].items())[:32]]
        assert len(series) == 32
        for j2 in range(8):
            a2, d2 = l2[(et, j2)]
            assert (a2 + d2) % 2 == 0
            a_even, a_odd = (a2 + d2) // 2, (a2 - d2) // 2
            for j, a_want in ((2 * j2, a_even), (2 * j2 + 1, a_odd)):
                a, d = l1[(et, j)]
                assert a == a_want
                assert series[2 * j] == (a + d) // 2
                assert series[2 * j + 1] == (a - d) // 2


def test_quantile_normalize_equalizes_distributions(spark):
    rows = QUERIES["ml_quantile_normalize"](spark, SF_DIR).collect()
    by_source = defaultdict(list)
    for r in rows:
        by_source[r["source"]].append((r["r"], r["ref_val"]))
    dists = {
        s: tuple(v for _, v in sorted(vals))
        for s, vals in by_source.items()
    }
    sizes = {len(v) for v in dists.values()}
    # equal-size groups (capped at 100 docs/source; sf0.001 ships 25
    # per source) must end with IDENTICAL normalized distributions —
    # the defining property of QN
    cap = max(sizes)
    full = [v for v in dists.values() if len(v) == cap]
    assert len(full) >= 2
    assert len({v for v in full}) == 1
    # and the reference value at each rank is the cross-group mean
    ranked = defaultdict(list)
    per_src = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect():
        per_src[r["source"]].append((r["doc_id"], r["n_chars"]))
    for s, docs in per_src.items():
        first = [nc for _, nc in sorted(docs)[:100]]
        for i, v in enumerate(sorted(first), start=1):
            ranked[i].append(v)
    want = {i: sum(vs) // len(vs) for i, vs in ranked.items()}
    got = {r["r"]: r["ref_val"] for r in rows}
    assert got == want
    assert sizes, "nonempty"


def test_lorenz_curve_matches_python_replay(spark):
    spend = defaultdict(int)
    for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect():
        spend[r["o_custkey"]] += round(r["o_totalprice"] * 100)
    ordered = sorted((c, k) for k, c in spend.items())
    n = len(ordered)
    base, extra = divmod(n, 10)
    deciles, pos = [], 0
    for i in range(1, 11):
        size = base + (1 if i <= extra else 0)
        deciles.append(ordered[pos:pos + size])
        pos += size
    total = sum(c for c, _ in ordered)
    cum = 0
    want = []
    for i, chunk in enumerate(deciles, start=1):
        dc = sum(c for c, _ in chunk)
        cum += dc
        want.append((i, len(chunk), dc, cum * 1000000 // total))
    got = sorted(
        (r["decile"], r["n_cust"], r["decile_cents"], r["cum_share_ppm"])
        for r in QUERIES["agg_lorenz_curve"](spark, SF_DIR).collect()
    )
    assert got == want
    # Lorenz invariants: shares are monotone and end at 100%
    shares = [w[3] for w in want]
    assert shares == sorted(shares) and shares[-1] == 1000000


def test_benjamini_hochberg_step_up(spark):
    rows = QUERIES["agg_benjamini_hochberg"](spark, SF_DIR).collect()
    m = len(rows)
    ranked = sorted(rows, key=lambda r: r["rk"])
    # ranks are a permutation ordered by p
    assert [r["rk"] for r in ranked] == list(range(1, m + 1))
    ps = [r["p_micro"] for r in ranked]
    assert ps == sorted(ps)
    passing = [r["rk"] for r in ranked if r["p_micro"] * m <= r["rk"] * 50000]
    k_star = max(passing) if passing else 0
    for r in ranked:
        assert r["rejected"] == (1 if r["rk"] <= k_star else 0)
    # BH rejects at least every Bonferroni rejection
    bonf = sum(1 for p in ps if p * m <= 50000)
    assert sum(r["rejected"] for r in rows) >= bonf


def _user_hashes_by_type(spark):
    by_type = defaultdict(set)
    for r in (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "user_id")
        .collect()
    ):
        by_type[r["event_type"]].add((r["user_id"] * 2654435761) % 1000000007)
    return by_type


def test_kmv_set_ops_matches_python_replay(spark):
    K, M = 64, 1000000007
    by_type = _user_hashes_by_type(spark)

    def est(hashes):
        sk = sorted(hashes)[:K]
        return len(sk) if len(sk) < K else (K - 1) * M // sk[-1]

    rows = QUERIES["sketch_kmv_set_ops"](spark, SF_DIR).collect()
    assert len(rows) == len(by_type) * (len(by_type) - 1) // 2
    for r in rows:
        a, b = by_type[r["ta"]], by_type[r["tb"]]
        ska, skb = set(sorted(a)[:K]), set(sorted(b)[:K])
        union_sk = sorted(ska | skb)[:K]
        c_both = sum(1 for h in union_sk if h in ska and h in skb)
        assert r["est_a"] == est(a)
        assert r["est_b"] == est(b)
        assert r["est_union"] == est(a | b)
        if len(union_sk) < K:
            assert r["est_inter"] == c_both
        else:
            assert r["est_inter"] == c_both * est(a | b) // K
        # KMV accuracy: estimates within 50% of truth at k=64
        true_union = len(a | b)
        assert abs(r["est_union"] - true_union) <= max(3, true_union // 2)


def test_closeness_sampled_matches_bfs_replay(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    adj = defaultdict(set)
    for r in li:
        c, s = orders[r["l_orderkey"]], r["l_suppkey"] + 1000000
        adj[c].add(s)
        adj[s].add(c)
    sups = [
        r["s_suppkey"] + 1000000
        for r in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    ]
    seeds = sorted(sups, key=lambda n: ((n * 2654435761) % 1000000007, n))[:4]
    got = {
        r["seed"]: (r["n1"], r["n2"], r["n3"], r["harmonic_micro"])
        for r in QUERIES["graph_closeness_sampled"](spark, SF_DIR).collect()
    }
    assert set(got) == set(seeds)
    for seed in seeds:
        visited, frontier, levels = {seed}, {seed}, []
        for _ in range(3):
            nxt = set()
            for n in frontier:
                nxt |= adj[n]
            nxt -= visited
            levels.append(len(nxt))
            visited |= nxt
            frontier = nxt
        n1, n2, n3 = levels
        assert got[seed] == (
            n1, n2, n3, n1 * 1000000 + n2 * 500000 + n3 * 333333
        )


def test_tukey_fences_matches_python_replay(spark):
    vals = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        if r["value"] is not None:
            vals[r["event_type"]].append(round(r["value"] * 100))
    got = {
        r["event_type"]: (r["n"], r["q1"], r["q3"], r["iqr"],
                          r["n_low"], r["n_high"])
        for r in QUERIES["agg_tukey_fences"](spark, SF_DIR).collect()
    }
    for et, cs in vals.items():
        cs.sort()
        n = len(cs)
        q1, q3 = cs[(n + 3) // 4 - 1], cs[(3 * n + 3) // 4 - 1]
        iqr = q3 - q1
        lo = sum(1 for c in cs if 2 * c < 2 * q1 - 3 * iqr)
        hi = sum(1 for c in cs if 2 * c > 2 * q3 + 3 * iqr)
        assert got[et] == (n, q1, q3, iqr, lo, hi)


def test_theil_decomposition_identity(spark):
    """Theil T = between + Σ (X_g/X)·T_g — reassemble the exact
    integer pieces and compare against a float recomputation."""
    import math

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    nation = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    spend = defaultdict(int)
    for r in orders:
        spend[r["o_custkey"]] += round(r["o_totalprice"] * 100)
    rows = QUERIES["agg_theil_index"](spark, SF_DIR).collect()
    xt = sum(r["x_cents"] for r in rows)
    nt = sum(r["n_cust"] for r in rows)
    # exact-piece reassembly (floats only at the very end)
    between = sum(
        r["x_cents"] / xt * (r["ln_between_nano"] / 1e9) for r in rows
    )
    within = sum(
        r["x_cents"] / xt * (r["within_micro"] / 1e6) for r in rows
    )
    # float ground truth
    groups = defaultdict(list)
    for ck, x in spend.items():
        groups[nation[ck]].append(x)
    t_total = 0.0
    for g in groups.values():
        xg = sum(g)
        for x in g:
            t_total += (x / xt) * math.log(x * nt / xt)
    assert abs((between + within) - t_total) < 1e-3
    assert within >= 0 and t_total >= 0
    # per-nation within replay in exact integers
    for r in rows:
        g = groups[r["nationkey"]]
        xg, ng = sum(g), len(g)
        num = sum(
            x * math.floor(math.log(x * ng / xg) * 1000000) for x in g
        )
        want = num // xg if num >= 0 else -((-num) // xg)
        assert r["within_micro"] == want


def test_markov_steadystate_matches_python_replay(spark):
    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    trans = defaultdict(int)
    prev = {}
    for r in rows:
        u = r["user_id"]
        if u in prev:
            trans[(prev[u], r["event_type"])] += 1
        prev[u] = r["event_type"]
    outs = defaultdict(int)
    for (a, _), c in trans.items():
        outs[a] += c
    r_vec = {a: 1000000000 // len(outs) for a in outs}
    for _ in range(6):
        nxt = defaultdict(int)
        for (a, b), c in trans.items():
            nxt[b] += r_vec[a] * c // outs[a]
        r_vec = dict(nxt)
    got = {
        r["event_type"]: r["rank_nano"]
        for r in QUERIES["event_markov_steadystate"](spark, SF_DIR).collect()
    }
    assert got == r_vec
    # stationary mass stays within truncation loss of 1e9
    assert 0 < sum(got.values()) <= 1000000000


def test_compaction_bins_respect_target_and_order(spark):
    rows = QUERIES["table_compaction_bins"](spark, SF_DIR).collect()
    assert rows
    by_bin = defaultdict(list)
    for r in rows:
        by_bin[r["bin"]].append(r)
    total = sum(r["bytes"] for r in rows)
    assert max(by_bin) == (total - 1) // 200000 or total <= 200000
    for b, members in by_bin.items():
        bin_bytes = sum(m["bytes"] for m in members)
        assert all(m["bin_bytes"] == bin_bytes for m in members)
        assert all(m["bin_files"] == len(members) for m in members)
    # size-descending packing: every file in bin i is <= every file
    # in bin i-1 is violated only at boundaries; check the prefix-sum
    # invariant directly instead
    ordered = sorted(
        rows, key=lambda r: (-r["bytes"], r["source"], r["file_id"])
    )
    cum = 0
    for r in ordered:
        assert r["bin"] == cum // 200000
        cum += r["bytes"]


def test_log_loss_matches_python_replay(spark):
    import math

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    mt = max(r["o_totalprice"] for r in orders)
    agg = defaultdict(lambda: [0, 0])
    for r in orders:
        p = min(999, max(1, math.floor(r["o_totalprice"] * 1000 / mt)))
        y = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        t = -math.floor(
            math.log(p / 1000.0 if y else 1.0 - p / 1000.0) * 1000000
        )
        a = agg[r["o_orderstatus"]]
        a[0] += 1
        a[1] += t
    got = {
        r["o_orderstatus"]: (r["n"], r["sum_micro"], r["logloss_micro"])
        for r in QUERIES["ml_log_loss"](spark, SF_DIR).collect()
    }
    want = {s: (n, t, t // n) for s, (n, t) in agg.items()}
    assert got == want
    # log loss is positive and bounded by the clip: -ln(0.001) ≈ 6.9
    for _, (_, _, ll) in got.items():
        assert 0 < ll < 6908000


def test_burstiness_in_range_and_matches_moments(spark):
    import math

    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "ts", "event_id")
        .collect(),
        key=lambda r: (r["event_type"], r["ts"], r["event_id"]),
    )
    gaps = defaultdict(list)
    prev = {}
    for r in rows:
        et = r["event_type"]
        us = int(r["ts"].timestamp() * 1000000)
        if et in prev:
            gaps[et].append((us - prev[et]) // 1000000)
        prev[et] = us
    got = {
        r["event_type"]: (r["n"], r["s1"], r["burstiness_milli"])
        for r in QUERIES["event_burstiness"](spark, SF_DIR).collect()
    }
    for et, dts in gaps.items():
        n, s1 = len(dts), sum(dts)
        s2 = sum(d * d for d in dts)
        sd = math.sqrt(float(n * s2 - s1 * s1))
        want_b = math.floor((sd - s1) / (sd + s1) * 1000)
        assert got[et] == (n, s1, want_b)
        assert -1000 <= want_b <= 1000


def test_pca_2var_eigen_identities(spark):
    r = QUERIES["ml_pca_2var"](spark, SF_DIR).collect()[0]
    # trace and determinant identities of the 2x2 eigen split
    # (integer floors: allow one unit of slack per eigenvalue)
    assert abs((r["lam1"] + r["lam2"]) - (r["cxx"] + r["cyy"])) <= 2
    det = r["cxx"] * r["cyy"] - r["cxy"] * r["cxy"]
    # lam1*lam2 ≈ det with relative tolerance from the floors
    assert abs(r["lam1"] * r["lam2"] - det) <= 2 * (abs(r["lam1"]) + abs(r["lam2"]) + 1)
    assert r["lam1"] >= r["lam2"] >= 0  # covariance PSD
    assert 500000 <= r["explained_ppm"] <= 1000000


def test_streak_longest_matches_python_replay(spark):
    days = defaultdict(set)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        days[r["user_id"]].add(r["ts"].date())
    got = {
        r["user_id"]: (r["longest_streak"], r["n_streaks"], r["active_days"])
        for r in QUERIES["window_streak_longest"](spark, SF_DIR).collect()
    }
    for u, ds in days.items():
        sd = sorted(ds)
        runs, cur = [], 1
        for a, b in zip(sd, sd[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert got[u] == (max(runs), len(runs), len(sd))
        assert sum(runs) == len(sd)


def test_matryoshka_recall_matches_python_replay(spark):
    vecs = {
        r["vec_id"]: [round(float(x) * 1000000) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    queries = {k: v for k, v in vecs.items() if k < 8}
    corpus = {k: v for k, v in vecs.items() if k >= 8}
    got = {
        r["qid"]: (r["n_overlap"], r["recall_milli"])
        for r in QUERIES["emb_matryoshka_recall"](spark, SF_DIR).collect()
    }
    for qid, qv in queries.items():
        full = sorted(
            corpus,
            key=lambda c: (-sum(a * b for a, b in zip(qv, corpus[c])), c),
        )[:10]
        pre = sorted(
            corpus,
            key=lambda c: (
                -sum(a * b for a, b in zip(qv[:16], corpus[c][:16])), c,
            ),
        )[:10]
        n_ov = len(set(full) & set(pre))
        assert got[qid] == (n_ov, n_ov * 100)


def _norm_tokens(text):
    import re

    return [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ")
            if t]


def test_winnowing_matches_python_replay(spark):
    import hashlib

    docs = {
        r["doc_id"]: _norm_tokens(r["text"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    fps = defaultdict(set)
    for did, tk in docs.items():
        hs = [
            hashlib.md5(
                " ".join(tk[i:i + 3]).encode()
            ).hexdigest()
            for i in range(len(tk) - 2)
        ]
        for i in range(len(hs) - 3):
            fps[did].add(min(hs[i:i + 4]))
    df = Counter(h for s in fps.values() for h in s)
    want = Counter()
    dids = sorted(fps)
    inv = defaultdict(list)
    for did in dids:
        for h in fps[did]:
            if df[h] <= 50:
                inv[h].append(did)
    for h, members in inv.items():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                want[(members[i], members[j])] += 1
    want = {p: c for p, c in want.items() if c >= 2}
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in QUERIES["docs_winnowing"](spark, SF_DIR).collect()
    }
    assert got == want
    assert want, "synthetic corpus should contain near-dups"


def test_lindley_matches_direct_recursion(spark):
    """Replay Lindley's recursion DIRECTLY (not the prefix-min
    identity the query uses) — validates the transform."""
    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "ts", "event_id")
        .collect(),
        key=lambda r: (r["event_type"], r["ts"], r["event_id"]),
    )
    gaps = defaultdict(list)
    prev = {}
    for r in rows:
        et = r["event_type"]
        us = int(r["ts"].timestamp() * 1000000)
        if et in prev:
            gaps[et].append((us - prev[et]) // 1000000)
        prev[et] = us
    got = {
        r["event_type"]: (r["service_s"], r["n_jobs"], r["n_delayed"],
                          r["max_wait_s"], r["total_wait_s"])
        for r in QUERIES["event_lindley_queue"](spark, SF_DIR).collect()
    }
    for et, a in gaps.items():
        s = sum(a) // len(a)
        w, waits = 0, []
        for ai in a:
            w = max(0, w + s - ai)
            waits.append(w)
        assert got[et] == (
            s, len(a), sum(1 for x in waits if x > 0),
            max(waits), sum(waits),
        )


def test_prefix_filter_join_equals_bruteforce(spark):
    import hashlib

    docs = {
        r["doc_id"]: _norm_tokens(r["text"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    sk = {}
    for did, tk in docs.items():
        hs = {
            hashlib.md5(" ".join(tk[i:i + 3]).encode()).hexdigest()
            for i in range(len(tk) - 2)
        }
        sk[did] = {h for h in hs if ord(h[0]) % 4 == 0}
    want = {}
    dids = sorted(sk)
    for i, a in enumerate(dids):
        for b in dids[i + 1:]:
            ix = len(sk[a] & sk[b])
            if ix == 0:
                continue
            un = len(sk[a] | sk[b])
            j = ix * 1000000 // un
            if j >= 600000:
                want[(a, b)] = (ix, un, j)
    got = {
        (r["doc_a"], r["doc_b"]): (r["ix"], r["un"], r["jaccard_ppm"])
        for r in QUERIES["dedup_prefix_filter_join"](spark, SF_DIR).collect()
    }
    assert got == want
    assert want, "synthetic corpus should contain high-Jaccard pairs"


def test_jackknife_matches_textbook_definition(spark):
    """Recompute var_jack from the individual leave-one-out
    estimates — validates the closed-form algebra the query uses."""
    from fractions import Fraction

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        if r["value"] is not None:
            daily[r["event_type"]][r["ts"].date()] += round(
                r["value"] * 100
            )
    got = {
        r["event_type"]: (r["n"], r["total_cents"], r["mean_cents"],
                          r["var_jack_cents2"])
        for r in QUERIES["agg_jackknife_variance"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        xs = list(days.values())
        n, s = len(xs), sum(xs)
        theta = [Fraction(s - x, n - 1) for x in xs]
        mean_t = sum(theta) / n
        var = Fraction(n - 1, n) * sum((t - mean_t) ** 2 for t in theta)
        assert got[et] == (n, s, s // n, int(var))


def test_hodges_lehmann_matches_python_replay(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    got = {
        r["event_type"]: (r["n_walsh"], r["hl_doubled"])
        for r in QUERIES["agg_hodges_lehmann"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        xs = [c for _, c in sorted(days.items())]
        w2 = sorted(
            xs[i] + xs[j]
            for i in range(len(xs))
            for j in range(i, len(xs))
        )
        m = len(w2)
        assert got[et] == (m, w2[(m + 1) // 2 - 1])
        assert m == len(xs) * (len(xs) + 1) // 2
        # HL lies within the data range
        assert 2 * min(xs) <= got[et][1] <= 2 * max(xs)


def test_sequence_regex_matches_python_replay(spark):
    import re

    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    seqs = defaultdict(str)
    for r in rows:
        seqs[r["user_id"]] += r["event_type"][0]
    got = {
        r["user_id"]: (r["seq_len"], r["n_click_buy"], r["n_view_binges"])
        for r in QUERIES["event_sequence_regex"](spark, SF_DIR).collect()
    }
    for u, s in seqs.items():
        assert got[u] == (
            len(s),
            len(re.findall(r"c+p", s)),
            len(re.findall(r"v{3,}", s)),
        )


def test_locf_fill_carries_last_level(spark):
    rows = QUERIES["window_locf_forward_fill"](spark, SF_DIR).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append((r["hour"], r["observed"], r["filled"]))
    assert by_type
    for _, series in by_type.items():
        series.sort()
        # dense spine: consecutive hours
        hours = [h for h, _, _ in series]
        assert all(
            (b - a).total_seconds() == 3600 for a, b in zip(hours, hours[1:])
        )
        last = None
        for _, obs, filled in series:
            if obs is not None:
                last = obs
            assert filled == last  # None before first observation


def test_ece_reassembles_exactly(spark):
    rows = QUERIES["ml_ece"](spark, SF_DIR).collect()
    n_total = sum(r["n"] for r in rows)
    # exact integer reassembly of ECE from the per-bin gap numerators
    ece_micro = sum(r["gap_n"] for r in rows) * 1000 // n_total
    assert 0 <= ece_micro <= 1000000
    # conf_milli is the truncating mean of Σp, so Σp lies in
    # [conf·n, conf·n + n); the gap numerator must sit in that band
    for r in rows:
        sp_lo = r["conf_milli"] * r["n"]
        assert (
            abs(sp_lo - 1000 * r["n_pos"]) - r["n"]
            <= r["gap_n"]
            <= abs(sp_lo - 1000 * r["n_pos"]) + r["n"]
        )


def test_pmi_matches_python_replay(spark):
    import math

    docs = [
        _norm_tokens(r["text"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    uni, bi = Counter(), Counter()
    for tk in docs:
        uni.update(tk)
        bi.update(zip(tk, tk[1:]))
    nt, nb = sum(uni.values()), sum(bi.values())
    want = {}
    for (w1, w2), c in bi.items():
        if c >= 5:
            want[(w1, w2)] = (
                c,
                math.floor(
                    math.log(c * nt * nt / (nb * uni[w1] * uni[w2]))
                    * 1000000
                ),
            )
    got = {
        (r["w1"], r["w2"]): (r["c_ab"], r["pmi_micro"])
        for r in QUERIES["text_collocations_pmi"](spark, SF_DIR).collect()
    }
    assert got == want
    assert want, "corpus should contain recurring bigrams"
    # template text must surface genuinely associated pairs
    assert any(p > 0 for _, p in want.values())


def test_absorbing_markov_matches_python_replay(spark):
    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    trans = defaultdict(int)
    prev = {}
    states = set()
    for r in rows:
        states.add(r["event_type"])
        u = r["user_id"]
        if u in prev and prev[u] not in ("purchase", "error"):
            trans[(prev[u], r["event_type"])] += 1
        prev[u] = r["event_type"]
    outs = defaultdict(int)
    for (a, _), c in trans.items():
        outs[a] += c
    h = {s: (1000000000 if s == "purchase" else 0) for s in states}
    for _ in range(6):
        nxt = {}
        for s in states:
            if s == "purchase":
                nxt[s] = 1000000000
            elif s == "error":
                nxt[s] = 0
            else:
                nxt[s] = sum(
                    c * h[b] // outs[a]
                    for (a, b), c in trans.items()
                    if a == s
                )
        h = nxt
    got = {
        r["event_type"]: r["p_convert_nano"]
        for r in QUERIES["event_absorbing_markov"](spark, SF_DIR).collect()
    }
    assert got == h
    assert got["purchase"] == 1000000000 and got["error"] == 0
    # transient states get a strictly-between probability
    assert any(0 < v < 1000000000 for v in got.values())


def test_junk_dimension_keys_and_counts(spark):
    rows = QUERIES["dim_junk_dimension"](spark, SF_DIR).collect()
    combos = Counter()
    for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect():
        q = (r["o_orderdate"].month - 1) // 3 + 1
        combos[(r["o_orderstatus"], r["o_orderpriority"], q)] += 1
    got = {
        (r["status"], r["priority"], r["qtr"]): (r["junk_key"], r["n_facts"])
        for r in rows
    }
    assert {k: v for k, (_, v) in got.items()} == dict(combos)
    # surrogate keys: dense 1..n in sort order of the combo tuple
    ordered = sorted(got)
    assert [got[c][0] for c in ordered] == list(range(1, len(ordered) + 1))
    # every fact row accounted for (the integrity check the join doubles as)
    assert sum(v for _, v in got.values()) == sum(combos.values())


def _ppr_seeds(spark):
    sups = [
        r["s_suppkey"] + 1000000
        for r in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    ]
    return set(
        sorted(sups, key=lambda n: ((n * 2654435761) % 1000000007, n))[:4]
    )


def test_ppr_localizes_on_seeds(spark):
    seeds = _ppr_seeds(spark)
    rows = QUERIES["graph_ppr_personalized"](spark, SF_DIR).collect()
    assert rows and seeds
    scores = {r["node"]: r["ppr_nano"] for r in rows}
    # teleportation pins mass on the seeds: every seed present and a
    # seed holds the top score
    top = max(scores, key=lambda n: (scores[n], -n))
    assert top in seeds
    assert seeds <= set(scores)
    # mass conservation within truncation: total <= 1e9
    assert 0 < sum(scores.values()) <= 1000000000


def test_ppr_matches_python_replay(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    adj = defaultdict(set)
    for r in li:
        c, s = orders[r["l_orderkey"]], r["l_suppkey"] + 1000000
        adj[c].add(s)
        adj[s].add(c)
    seeds = sorted(_ppr_seeds(spark))
    ev = {n: (1000000000 // len(seeds) if n in set(seeds) else 0)
          for n in adj}
    r_vec = dict(ev)
    for _ in range(6):
        inflow = defaultdict(int)
        for a, nbrs in adj.items():
            share = r_vec[a] // len(nbrs)
            for b in nbrs:
                inflow[b] += share
        r_vec = {
            n: (15 * ev[n] + 85 * inflow.get(n, 0)) // 100 for n in adj
        }
    want = sorted(
        ((r, n) for n, r in r_vec.items() if r > 0),
        key=lambda t: (-t[0], t[1]),
    )[:50]
    got = [
        (r["ppr_nano"], r["node"])
        for r in QUERIES["graph_ppr_personalized"](spark, SF_DIR).collect()
    ]
    assert sorted(got, key=lambda t: (-t[0], t[1])) == want


def test_durbin_watson_matches_python_replay(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    got = {
        r["event_type"]: (r["n"], r["dw_milli"])
        for r in QUERIES["ml_durbin_watson"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        xs = [c for _, c in sorted(days.items())]
        n, s = len(xs), sum(xs)
        res = [n * x - s for x in xs]
        num = sum(
            (b - a) ** 2 for a, b in zip(res, res[1:])
        )
        den = sum(e * e for e in res)
        assert got[et] == (n, num * 1000 // den)
        # DW lives in [0, 4]
        assert 0 <= got[et][1] <= 4000


def test_dickey_fuller_matches_python_replay(spark):
    import math

    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    got = {
        r["event_type"]: (r["n"], r["rho_micro"], r["t_milli"])
        for r in QUERIES["ts_dickey_fuller"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        ys = [c for _, c in sorted(days.items())]
        xs, ds = ys[:-1], [b - a for a, b in zip(ys, ys[1:])]
        n = len(xs)
        sx, sy = sum(xs), sum(ds)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ds))
        syy = sum(y * y for y in ds)
        cxx = float(n) * float(sxx) - float(sx) * float(sx)
        cxy = float(n) * float(sxy) - float(sx) * float(sy)
        cyy = float(n) * float(syy) - float(sy) * float(sy)
        beta = cxy / cxx
        se = math.sqrt((cyy - cxy * beta) / ((float(n) - 2) * cxx))
        assert got[et] == (
            n,
            math.floor(beta * 1000000),
            math.floor(beta / se * 1000),
        )
        # a stationary-ish count series should mean-revert: rho < 0
        assert got[et][1] < 0


def test_pvm_bridge_identity(spark):
    """Price + volume + mix must reassemble Δrev·1e6 exactly."""
    rows = QUERIES["agg_price_volume_mix"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert (
            r["price_effect_micro"]
            + r["volume_effect_micro"]
            + r["mix_residual_micro"]
            == r["delta_rev_cents"] * 1000000
        )


def test_pvm_matches_python_replay(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    orders = {
        r["o_orderkey"]: r["o_orderdate"].year
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    per = defaultdict(lambda: [0, 0, 0, 0])  # qa, ra, qb, rb
    for r in li:
        yr = orders[r["l_orderkey"]]
        if yr not in (1996, 1997):
            continue
        s = per[r["l_partkey"]]
        off = 0 if yr == 1996 else 2
        s[off] += int(r["l_quantity"])
        s[off + 1] += round(r["l_extendedprice"] * 100)
    def tdiv(a, b):
        # engines truncate toward zero; Python // floors
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    for pk, (qa, ra, qb, rb) in per.items():
        if qa == 0 or qb == 0:
            continue
        pe = rb * 1000000 - tdiv(qb * ra * 1000000, qa)
        ve = tdiv((qb - qa) * ra * 1000000, qa)
        g = agg[brand[pk]]
        g[0] += 1
        g[1] += rb - ra
        g[2] += pe
        g[3] += ve
        g[4] += (rb - ra) * 1000000 - pe - ve
    got = {
        r["p_brand"]: (
            r["n_parts"], r["delta_rev_cents"], r["price_effect_micro"],
            r["volume_effect_micro"], r["mix_residual_micro"],
        )
        for r in QUERIES["agg_price_volume_mix"](spark, SF_DIR).collect()
    }
    assert got == {b: tuple(v) for b, v in agg.items()}


def test_fifo_matching_invariants_and_replay(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    receipts, issues = defaultdict(list), defaultdict(list)
    # qty completes the total order — (l_orderkey, l_linenumber) is NOT
    # unique in the synthetic lineitem (round-6 sf0.1 sweep finding);
    # the replay must order lots exactly as the query does
    for r in sorted(
        li,
        key=lambda x: (x["l_orderkey"], x["l_linenumber"], int(x["l_quantity"])),
    ):
        lot = int(r["l_quantity"])
        (receipts if r["l_orderkey"] % 2 == 0 else issues)[
            r["l_partkey"]
        ].append(lot)
    # sequential FIFO replay
    want = {}
    for pk in set(receipts) & set(issues):
        ri, ii = 0, 0
        rrem = receipts[pk][0] if receipts[pk] else 0
        irem = issues[pk][0] if issues[pk] else 0
        while ri < len(receipts[pk]) and ii < len(issues[pk]):
            m = min(rrem, irem)
            if m > 0:
                want[(pk, ri + 1, ii + 1)] = m
            rrem -= m
            irem -= m
            if rrem == 0:
                ri += 1
                rrem = receipts[pk][ri] if ri < len(receipts[pk]) else 0
            if irem == 0:
                ii += 1
                irem = issues[pk][ii] if ii < len(issues[pk]) else 0
    got = {
        (r["pk"], r["receipt_seq"], r["issue_seq"]): r["matched_qty"]
        for r in QUERIES["join_fifo_lot_matching"](spark, SF_DIR).collect()
        if r["matched_qty"] > 0
    }
    assert got == want
    # conservation: matched total per part = min(receipts, issues)
    per_part = defaultdict(int)
    for (pk, _, _), m in got.items():
        per_part[pk] += m
    for pk, tot in per_part.items():
        assert tot == min(sum(receipts[pk]), sum(issues[pk]))


def test_shapley_efficiency_axiom_and_replay(spark):
    from itertools import permutations

    ux = defaultdict(lambda: [0, 0, 0, 0])
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        u = ux[r["user_id"]]
        idx = {"click": 0, "view": 1, "signup": 2, "purchase": 3}.get(
            r["event_type"]
        )
        if idx is not None:
            u[idx] = 1
    coal = defaultdict(lambda: [0, 0])
    for c, v, s, y in ux.values():
        g = coal[c * 4 + v * 2 + s]
        g[0] += 1
        g[1] += y
    vm = {m: (coal[m][1] * 1000000) // coal[m][0] if m in coal else 0
          for m in range(8)}
    bits = {"click": 4, "view": 2, "signup": 1}
    want = {}
    for ch, bit in bits.items():
        phi = 0
        for perm in permutations(bits.values()):
            pre = 0
            for b in perm:
                if b == bit:
                    break
                pre |= b
            phi += vm[pre | bit] - vm[pre]
        want[ch] = phi
    got = {
        r["channel"]: r["phi6_micro"]
        for r in QUERIES["event_shapley_attribution"](spark, SF_DIR).collect()
    }
    assert got == want
    # efficiency: the six-permutation credits sum to 6*(v(full)-v(empty))
    assert sum(got.values()) == 6 * (vm[7] - vm[0])


def test_ttl_cache_hits_matches_python_replay(spark):
    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "user_id", "ts", "event_id")
        .collect(),
        key=lambda r: (r["event_type"], r["user_id"], r["ts"], r["event_id"]),
    )
    prev = {}
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in rows:
        k = (r["event_type"], r["user_id"])
        us = int(r["ts"].timestamp() * 1000000)
        a = agg[r["event_type"]]
        a[0] += 1
        if k in prev:
            gap = us - prev[k]
            if gap <= 60000000:
                a[1] += 1
            if gap <= 600000000:
                a[2] += 1
            if gap <= 3600000000:
                a[3] += 1
        prev[k] = us
    got = {
        r["event_type"]: (
            r["n_requests"], r["hits_60s"], r["hits_600s"],
            r["hits_3600s"], r["hit_rate_600s_ppm"],
        )
        for r in QUERIES["event_ttl_cache_hits"](spark, SF_DIR).collect()
    }
    for et, (n, h1, h2, h3) in agg.items():
        assert got[et] == (n, h1, h2, h3, h2 * 1000000 // n)
        # longer TTL can only help
        assert h1 <= h2 <= h3 <= n


KNUTH = 2654435761


def _synth_pt(event_id):
    glat = (event_id * KNUTH) % 180000000 - 90000000
    glon = ((event_id * 40503) % 360000000) * KNUTH % 360000000 - 180000000
    return glat, glon


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_radius_of_gyration_matches_python_replay(spark):
    import math

    pts = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        pts[r["user_id"]].append(_synth_pt(r["event_id"]))
    got = {
        r["user_id"]: (r["n"], r["clat"], r["clon"], r["rg_microdeg"])
        for r in QUERIES["geo_radius_of_gyration"](spark, SF_DIR).collect()
    }
    for u, ps in pts.items():
        n = len(ps)
        clat = _tdiv(sum(p[0] for p in ps), n)
        clon = _tdiv(sum(p[1] for p in ps), n)
        s2 = sum((la - clat) ** 2 + (lo - clon) ** 2 for la, lo in ps)
        rg = math.floor(math.sqrt(float(s2) / float(n)))
        assert got[u] == (n, clat, clon, rg)


def test_od_matrix_matches_python_replay(spark):
    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    trips = Counter()
    users = defaultdict(set)
    prev = {}
    for r in rows:
        glat, glon = _synth_pt(r["event_id"])
        cell = (_tdiv(glat, 30000000), _tdiv(glon, 30000000))
        u = r["user_id"]
        if u in prev:
            od = prev[u] + cell
            trips[od] += 1
            users[od].add(u)
        prev[u] = cell
    got = {
        (r["o_lat"], r["o_lon"], r["d_lat"], r["d_lon"]):
            (r["n_trips"], r["n_users"])
        for r in QUERIES["geo_od_matrix"](spark, SF_DIR).collect()
    }
    want = {od: (c, len(users[od])) for od, c in trips.items()}
    assert got == want
    # total trips = events - users (one lag hop lost per user)
    assert sum(c for c, _ in got.values()) == len(rows) - len(
        {r["user_id"] for r in rows}
    )


def test_harmonic_mean_am_hm_inequality(spark):
    rows = QUERIES["agg_harmonic_mean"](spark, SF_DIR).collect()
    vals = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        if r["value"] is not None and round(r["value"] * 100) > 0:
            vals[r["event_type"]].append(round(r["value"] * 100))
    for r in rows:
        cs = vals[r["event_type"]]
        n = len(cs)
        inv = sum(1000000000000 // c for c in cs)
        assert r["n"] == n and r["sum_inv_pico"] == inv
        assert r["hmean_cents"] == n * 1000000000000 // inv
        # AM >= HM (strict unless all equal)
        assert r["hmean_cents"] <= sum(cs) // n + 1


def test_eval_suite_matches_standalone_queries(spark):
    suite = {
        r["metric"]: r["value"]
        for r in QUERIES["ml_eval_suite_shared_scan"](spark, SF_DIR).collect()
    }
    assert set(suite) == {"auc_ppm", "brier_nano", "ece_micro",
                          "logloss_micro"}
    # AUC must equal the standalone ml_auc_rank (same score recipe)
    auc = QUERIES["ml_auc_rank"](spark, SF_DIR).collect()[0]["auc_ppm"]
    assert suite["auc_ppm"] == auc
    # ECE reassembles from the standalone per-bin gap numerators
    bins = QUERIES["ml_ece"](spark, SF_DIR).collect()
    n_total = sum(r["n"] for r in bins)
    assert suite["ece_micro"] == sum(r["gap_n"] for r in bins) * 1000 // n_total
    assert 0 <= suite["auc_ppm"] <= 1000000
    assert suite["brier_nano"] > 0 and suite["logloss_micro"] > 0


def test_pack_sweep_matches_python_replay(spark):
    toks = {
        r["doc_id"]: len(_norm_tokens(r["text"]))
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    got = {
        r["ctx_len"]: (r["n_bins"], r["total_tokens"], r["waste_ppm"])
        for r in QUERIES["docs_pack_efficiency_sweep"](
            spark, SF_DIR
        ).collect()
    }
    for c in (512, 1024, 2048):
        clipped = sorted(
            ((min(n, c), d) for d, n in toks.items()),
            key=lambda t: (-t[0], t[1]),
        )
        bins = set()
        cum = 0
        for n, _ in clipped:
            bins.add(cum // c)
            cum += n
        total = sum(n for n, _ in clipped)
        waste = (len(bins) * c - total) * 1000000 // (len(bins) * c)
        assert got[c] == (len(bins), total, waste)
    # longer context cannot reduce total tokens; waste stays sane
    assert got[512][1] <= got[2048][1]
    for _, (_, _, w) in got.items():
        assert 0 <= w < 1000000


def test_dedup_sweep_consistent_with_prefix_join(spark):
    hist = {
        r["jaccard_decile"]: r["n_pairs"]
        for r in QUERIES["dedup_threshold_sweep"](spark, SF_DIR).collect()
    }
    # pairs at deciles >= 6 must equal the prefix-filter join's
    # theta=0.6 output count (same sketches, same integer Jaccard)
    high = sum(n for d, n in hist.items() if d >= 6)
    join_pairs = QUERIES["dedup_prefix_filter_join"](spark, SF_DIR).count()
    assert high == join_pairs
    assert sum(hist.values()) > 0


def test_reco_coverage_diversity_replay(spark):
    import math

    vecs = {
        r["vec_id"]: [round(float(x) * 1000000) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    qs = {k: v for k, v in vecs.items() if k < 8}
    corpus = {k: v for k, v in vecs.items() if k >= 8}
    topk = {}
    for qid, qv in qs.items():
        topk[qid] = sorted(
            corpus,
            key=lambda c: (-sum(a * b for a, b in zip(qv, corpus[c])), c),
        )[:5]
    cov = len({c for lst in topk.values() for c in lst}) * 1000000 // len(
        corpus
    )
    got = {
        r["qid"]: (r["ild_ppm"], r["catalog_coverage_ppm"])
        for r in QUERIES["ml_reco_coverage_diversity"](
            spark, SF_DIR
        ).collect()
    }
    for qid, lst in topk.items():
        terms = []
        for i in range(len(lst)):
            for j in range(i + 1, len(lst)):
                a, b = corpus[lst[i]], corpus[lst[j]]
                dotv = sum(x * y for x, y in zip(a, b))
                na = math.sqrt(float(sum(x * x for x in a)))
                nb = math.sqrt(float(sum(x * x for x in b)))
                terms.append(
                    1000000 - math.floor(float(dotv) * 1000000 / (na * nb))
                )
        want_ild = sum(terms) // len(terms)
        assert got[qid] == (want_ild, cov)
        assert 0 <= got[qid][0] <= 2000000


def test_chain_ladder_matches_python_replay(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    oyear = {
        r["o_orderkey"]: r["o_orderdate"].year
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    tri = defaultdict(int)
    for r in li:
        origin = oyear[r["l_orderkey"]]
        if origin > 2001:
            continue
        dev = (r["l_orderkey"] * 2654435761 + r["l_linenumber"]) % 4
        if origin + dev <= 2001:
            tri[(origin, dev)] += round(r["l_extendedprice"] * 100)
    cum = {}
    for (o, d), _ in tri.items():
        cum[(o, d)] = sum(v for (oo, dd), v in tri.items()
                          if oo == o and dd <= d)
    factors = {}
    for j in range(3):
        num = sum(cum[(o, j + 1)] for (o, d) in cum if d == j + 1)
        den = sum(cum[(o, j)] for (o, d) in cum
                  if d == j and (o, j + 1) in cum)
        if den:
            factors[j] = num * 1000000 // den
    got = {
        r["origin"]: (r["last_dev"], r["observed"], r["ultimate"], r["ibnr"])
        for r in QUERIES["agg_chain_ladder"](spark, SF_DIR).collect()
    }
    origins = {o for o, _ in cum}
    for o in origins:
        last = max(d for (oo, d) in cum if oo == o)
        obs = cum[(o, last)]
        ult = obs
        for j in range(last, 3):
            ult = ult * factors[j] // 1000000
        assert got[o] == (last, obs, ult, ult - obs)
    # closed origins need no reserve; open origins a positive one
    for o, (last, obs, ult, ibnr) in got.items():
        assert (ibnr == 0) == (last == 3) or ibnr >= 0


def test_hill_tail_index_replay(spark):
    import math

    spend = defaultdict(int)
    for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect():
        spend[r["o_custkey"]] += round(r["o_totalprice"] * 100)
    ordered = sorted(spend.items(), key=lambda t: (-t[1], t[0]))
    x_k1 = ordered[50][1]
    s = sum(
        math.floor(math.log(c / x_k1) * 1000000000)
        for _, c in ordered[:50]
    )
    r = QUERIES["agg_hill_tail_index"](spark, SF_DIR).collect()[0]
    assert (r["k"], r["x_k1"], r["hill_sum_nano"], r["alpha_milli"]) == (
        50, x_k1, s, 50 * 1000000000000 // s,
    )
    assert r["alpha_milli"] > 0


def test_stratified_ate_matches_python_replay(spark):
    ux = defaultdict(lambda: [0, 0, 0])  # events, signups, purchases
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        u = ux[r["user_id"]]
        u[0] += 1
        if r["event_type"] == "signup":
            u[1] += 1
        if r["event_type"] == "purchase":
            u[2] += 1
    te = sum(v[0] for v in ux.values())
    ts = sum(v[1] for v in ux.values())
    tp = sum(v[2] for v in ux.values())
    ordered = sorted(ux.items(), key=lambda kv: (kv[1][0], kv[0]))
    n_users = len(ordered)
    base, extra = divmod(n_users, 3)
    cells = defaultdict(lambda: [0, 0, 0, 0, 0])  # n1 y1 n0 y0 n
    pos = 0
    for i in range(1, 4):
        size = base + (1 if i <= extra else 0)
        for uid, (ne, ns, np_) in ordered[pos:pos + size]:
            t = 1 if ns * te > ts * ne else 0
            y = 1 if np_ * te > tp * ne else 0
            c = cells[i]
            c[4] += 1
            if t:
                c[0] += 1
                c[1] += y
            else:
                c[2] += 1
                c[3] += y
        pos += size
    kept = {s: c for s, c in cells.items() if c[0] > 0 and c[2] > 0}
    nt = sum(c[4] for c in kept.values())
    got = {
        r["stratum"]: (r["n"], r["n1"], r["n0"], r["p1_micro"],
                       r["p0_micro"], r["ate_micro"],
                       r["weighted_contrib_micro"])
        for r in QUERIES["ml_stratified_ate"](spark, SF_DIR).collect()
    }
    assert set(got) == set(kept)
    for s, (n1, y1, n0, y0, n) in kept.items():
        p1 = y1 * 1000000 // n1
        p0 = y0 * 1000000 // n0
        ate = p1 - p0
        contrib = ate * n // nt if ate * n >= 0 else -((-ate * n) // nt)
        assert got[s] == (n, n1, n0, p1, p0, ate, contrib)


def test_intersect_all_bag_semantics(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    left = Counter(
        r["o_custkey"] for r in orders if r["o_orderstatus"] == "O"
    )
    right = Counter(
        r["o_custkey"] for r in orders if r["o_orderpriority"] == "1-URGENT"
    )
    want = Counter()
    for k in left.keys() & right.keys():
        want[k] = min(left[k], right[k])
    got = Counter(
        r["o_custkey"]
        for r in QUERIES["set_intersect_all"](spark, SF_DIR).collect()
    )
    assert got == want
    assert sum(want.values()) > 0


def test_capture_recapture_matches_python_replay(spark):
    import datetime

    cut = datetime.date(2024, 1, 15)
    w1, w2 = defaultdict(set), defaultdict(set)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        (w1 if r["ts"].date() < cut else w2)[r["event_type"]].add(
            r["user_id"]
        )
    got = {
        r["event_type"]: (r["n1"], r["n2"], r["n_both"], r["n_hat"],
                          r["n_hat_chapman"])
        for r in QUERIES["agg_capture_recapture"](spark, SF_DIR).collect()
    }
    for et in set(w1) & set(w2):
        n1, n2 = len(w1[et]), len(w2[et])
        m = len(w1[et] & w2[et])
        if m == 0:
            assert et not in got
            continue
        lp = n1 * n2 // m
        ch = (n1 + 1) * (n2 + 1) // (m + 1) - 1
        assert got[et] == (n1, n2, m, lp, ch)
        # the estimate can never undershoot what was actually seen
        assert lp >= len(w1[et] | w2[et]) or m == n1 or m == n2


def test_sample_size_power_monotonicity(spark):
    import math

    base = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        b = base[r["event_type"]]
        b[1] += 1
        days = (r["ts"].date() - __import__("datetime").date(1970, 1, 1)).days
        if (days + 4) % 7 in (0, 6):
            b[0] += 1
    rows = QUERIES["ml_sample_size_power"](spark, SF_DIR).collect()
    by_type = defaultdict(dict)
    for r in rows:
        by_type[r["event_type"]][r["d_micro"]] = (
            r["p_micro"], r["n_per_arm"]
        )
    assert by_type
    for et, grid in by_type.items():
        assert set(grid) == {10000, 20000, 50000}
        # bigger detectable effect -> smaller required sample
        ns = [grid[d][1] for d in (10000, 20000, 50000)]
        assert ns[0] > ns[1] > ns[2] > 0
        # baseline equals the weekend share
        wk, n = base[et]
        assert grid[10000][0] == wk * 1000000 // n
        # replay the closed form
        for d, (p_micro, n_arm) in grid.items():
            p1 = p_micro / 1000000
            p2 = (p_micro + d) / 1000000
            dd = d / 1000000
            want = math.floor(
                7.849 * (p1 * (1 - p1) + p2 * (1 - p2)) / (dd * dd)
            )
            assert n_arm == want


def test_wasserstein_matches_python_replay(spark):
    per_src = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect():
        per_src[r["source"]].append((r["doc_id"], r["n_chars"]))
    sorted_lens = {
        s: sorted(nc for _, nc in sorted(docs)[:100])
        for s, docs in per_src.items()
    }
    got = {
        (r["src_a"], r["src_b"]): (r["n"], r["total_move"], r["w1_chars"])
        for r in QUERIES["docs_length_wasserstein"](spark, SF_DIR).collect()
    }
    srcs = sorted(sorted_lens)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            xs, ys = sorted_lens[a], sorted_lens[b]
            n = min(len(xs), len(ys))
            tm = sum(abs(x - y) for x, y in zip(xs, ys))
            assert got[(a, b)] == (n, tm, tm // n)
    # W1 symmetry is implicit (pairs are a<b); identity of indiscernibles
    assert all(v[1] >= 0 for v in got.values())


def test_frame_exclude_current_identity(spark):
    rows = QUERIES["window_frame_exclude_current"](spark, SF_DIR).collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(r)
    for _, rs in groups.items():
        s = sum(r["c"] for r in rs)
        n = len(rs)
        for r in rs:
            assert r["loo_mean"] == (s - r["c"]) / (n - 1)
            assert r["above_150pct_of_peers"] == (
                1 if 100 * (n - 1) * r["c"] > 150 * (s - r["c"]) else 0
            )


def test_ipf_converges_to_marginals(spark):
    rows = QUERIES["privacy_ipf_marginals"](spark, SF_DIR).collect()
    fitted = {(r["o_orderstatus"], r["o_orderpriority"]): r["fitted"]
              for r in rows}
    target = Counter()
    for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect():
        target[(r["o_orderstatus"], r["o_orderpriority"])] += 1
    rowm = Counter()
    colm = Counter()
    for (rk, ck), c in target.items():
        rowm[rk] += c
        colm[ck] += c
    # after the final column sweep, column marginals match exactly
    # (within per-cell truncation); row marginals are near-matched
    fit_col = Counter()
    fit_row = Counter()
    for (rk, ck), v in fitted.items():
        fit_col[ck] += v
        fit_row[rk] += v
    n_cells_per_col = Counter(ck for _, ck in fitted)
    for ck, tot in colm.items():
        assert abs(fit_col[ck] - tot) <= n_cells_per_col[ck]
    for rk, tot in rowm.items():
        # IPF converges geometrically; 3 sweeps gets within 1% here
        assert abs(fit_row[rk] - tot) <= max(2, tot // 100)


def test_burrows_delta_matches_python_replay(spark):
    import math

    docs = [
        (r["source"], _norm_tokens(r["text"]))
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    words = Counter()
    per_src = defaultdict(Counter)
    src_tot = Counter()
    for s, tk in docs:
        words.update(tk)
        per_src[s].update(tk)
        src_tot[s] += len(tk)
    top30 = [
        w for w, _ in sorted(words.items(), key=lambda t: (-t[1], t[0]))[:30]
    ]
    srcs = sorted(per_src)
    f = {
        (s, w): per_src[s][w] * 1000000000 // src_tot[s]
        for s in srcs
        for w in top30
    }
    z = {}
    for w in top30:
        vals = [f[(s, w)] for s in srcs]
        k, sf = len(vals), sum(vals)
        sff = sum(v * v for v in vals)
        if sff * k <= sf * sf:
            continue
        mu = sf / k
        sigma = math.sqrt(sff / k - mu * mu)
        for s in srcs:
            z[(s, w)] = (f[(s, w)] - mu) / sigma
    want = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            ts = [
                math.floor(abs(z[(sa, w)] - z[(sb, w)]) * 1000000)
                for w in top30
                if (sa, w) in z
            ]
            want[(sa, sb)] = (len(ts), sum(ts) // len(ts))
    got = {
        (r["src_a"], r["src_b"]): (r["n_words"], r["delta_micro"])
        for r in QUERIES["text_burrows_delta"](spark, SF_DIR).collect()
    }
    assert got == want
    assert all(d >= 0 for _, d in got.values())


def test_lateness_audit_matches_python_replay(spark):
    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "event_id", "ts")
        .collect(),
        key=lambda r: (r["event_type"], r["event_id"]),
    )
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    hwm = {}
    for r in rows:
        et = r["event_type"]
        us = int(r["ts"].timestamp() * 1000000)
        hwm[et] = max(hwm.get(et, us), us)
        late = hwm[et] - us
        a = agg[et]
        a[0] += 1
        if late > 0:
            a[1] += 1
        a[2] = max(a[2], late)
        if late > 60000000:
            a[3] += 1
        if late > 600000000:
            a[4] += 1
        if late > 3600000000:
            a[5] += 1
    got = {
        r["event_type"]: (r["n_events"], r["n_late"], r["max_late_us"],
                          r["dropped_at_1m"], r["dropped_at_10m"],
                          r["dropped_at_1h"])
        for r in QUERIES["stream_lateness_audit"](spark, SF_DIR).collect()
    }
    assert got == {et: tuple(a) for et, a in agg.items()}
    # widening the watermark can only drop fewer events
    for _, (_, _, _, d1, d10, d60) in got.items():
        assert d1 >= d10 >= d60


def test_permutation_entropy_matches_python_replay(spark):
    import math

    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    got = {
        r["event_type"]: (r["n_patterns"], r["n_windows"], r["pe_micro"])
        for r in QUERIES["ts_permutation_entropy"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        xs = [c for _, c in sorted(days.items())]
        pats = Counter()
        for a, b, c in zip(xs, xs[1:], xs[2:]):
            if a <= b <= c:
                p = 0
            elif a <= c < b:
                p = 1
            elif b < a <= c:
                p = 2
            elif c < a <= b:
                p = 3
            elif b <= c < a:
                p = 4
            else:
                p = 5
            pats[p] += 1
        m = sum(pats.values())
        s = -sum(
            n * math.floor(math.log(n / m) * 1000000)
            for n in pats.values()
        )
        assert got[et] == (len(pats), m, s // m)
        # PE of a 3-window is at most ln(6)
        assert 0 <= got[et][2] <= 1791760


def test_gumbel_fit_matches_python_replay(spark):
    import math

    blocks = defaultdict(dict)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        if r["value"] is None:
            continue
        d = r["ts"].date()
        wk = d - __import__("datetime").timedelta(days=d.weekday())
        et = r["event_type"]
        c = round(r["value"] * 100)
        blocks[et][wk] = max(blocks[et].get(wk, c), c)
    got = {
        r["event_type"]: (r["k"], r["s1"], r["beta_milli"], r["mu_milli"],
                          r["level100_milli"])
        for r in QUERIES["agg_gumbel_block_maxima"](spark, SF_DIR).collect()
    }
    for et, bm in blocks.items():
        xs = list(bm.values())
        k, s1 = len(xs), sum(xs)
        s2 = sum(x * x for x in xs)
        sigma = math.sqrt((float(s2) * k - float(s1) * s1) / (float(k) * k))
        beta = sigma * 0.7796968012336093
        mu = s1 / k - beta * 0.5772156649015329
        assert got[et] == (
            k, s1,
            math.floor(beta * 1000),
            math.floor(mu * 1000),
            math.floor((mu + beta * 4.600149226776579) * 1000),
        )
        # the 1-in-100 level must exceed the fitted location
        assert got[et][4] > got[et][3]


def test_equalized_odds_matches_python_replay(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    mt = max(r["o_totalprice"] for r in orders)
    cells = defaultdict(lambda: [0, 0, 0, 0])  # tp p fp neg
    for r in orders:
        y = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        yhat = 1 if r["o_totalprice"] * 1000 > mt * 500 else 0
        c = cells[r["o_orderstatus"]]
        if y:
            c[1] += 1
            c[0] += yhat
        else:
            c[3] += 1
            c[2] += yhat
    kept = {g: c for g, c in cells.items() if c[1] > 0 and c[3] > 0}
    tprs = {g: c[0] * 1000000 // c[1] for g, c in kept.items()}
    fprs = {g: c[2] * 1000000 // c[3] for g, c in kept.items()}
    got = {
        r["grp"]: (r["p"], r["neg"], r["tpr_micro"], r["fpr_micro"],
                   r["tpr_gap_to_min_micro"], r["fpr_gap_to_min_micro"])
        for r in QUERIES["ml_equalized_odds"](spark, SF_DIR).collect()
    }
    for g, c in kept.items():
        assert got[g] == (
            c[1], c[3], tprs[g], fprs[g],
            tprs[g] - min(tprs.values()), fprs[g] - min(fprs.values()),
        )
    assert any(v[4] > 0 or v[5] > 0 for v in got.values()) or len(got) == 1


def test_unicity_matches_python_replay(spark):
    qi = {}
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        u = r["user_id"]
        key = (r["ts"].date(), r["event_type"])
        if u not in qi:
            qi[u] = key
        else:
            qi[u] = (min(qi[u][0], key[0]), min(qi[u][1], key[1]))
    cells = Counter(qi.values())
    n = len(qi)
    uniq = sum(1 for v in qi.values() if cells[v] == 1)
    pairs = sum(1 for v in qi.values() if cells[v] <= 2)
    r = QUERIES["privacy_unicity"](spark, SF_DIR).collect()[0]
    assert (r["n_users"], r["n_unique"], r["n_in_pairs_or_less"],
            r["unicity_ppm"]) == (n, uniq, pairs, uniq * 1000000 // n)
    assert 0 <= r["unicity_ppm"] <= 1000000


def test_simpson_diversity_matches_python_replay(spark):
    cnt = defaultdict(Counter)
    for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect():
        cnt[r["source"]][r["lang"]] += 1
    got = {
        r["source"]: (r["n_langs"], r["simpson_ppm"],
                      r["effective_langs_micro"])
        for r in QUERIES["agg_simpson_diversity"](spark, SF_DIR).collect()
    }
    for s, langs in cnt.items():
        tot = sum(langs.values())
        ssq = sum(n * n for n in langs.values())
        simpson = 1000000 - ssq * 1000000 // (tot * tot)
        eff = (tot * tot) * 1000000 // ssq
        assert got[s] == (len(langs), simpson, eff)
        # inverse Simpson lies in [1, n_langs]
        assert 1000000 <= eff <= len(langs) * 1000000


def test_local_bridges_matches_python_replay(spark):
    edges = _copurchase_edges(spark)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    closed = sum(1 for u, v in edges if adj[u] & adj[v])
    r = QUERIES["graph_local_bridges"](spark, SF_DIR).collect()[0]
    n = len(edges)
    assert (r["n_edges"], r["n_in_triangles"], r["n_local_bridges"],
            r["bridge_share_ppm"]) == (
        n, closed, n - closed, (n - closed) * 1000000 // n,
    )


def test_feistel_pseudonym_bijective_and_invertible(spark):
    rows = QUERIES["fn_feistel_pseudonym"](spark, SF_DIR).collect()
    toks = {r["o_custkey"]: r["token"] for r in rows}
    # bijective over the key set: no collisions
    assert len(set(toks.values())) == len(toks)
    # invertible: run the rounds backwards
    for k, t in list(toks.items())[:200]:
        l2, r2 = t // 65536, t % 65536
        r1 = l2
        l1 = (r2 - (r1 * 2654435761 + 67890) % 65536) % 65536
        r0 = l1
        l0 = (r1 - (r0 * 2654435761 + 12345) % 65536) % 65536
        assert l0 * 65536 + r0 == k
    # the map is not the identity on this key set
    assert any(k != t for k, t in toks.items())


def test_mean_shift_breakpoint_matches_python_replay(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    got = {
        r["event_type"]: (r["break_at"], r["n"], r["mean_before"],
                          r["mean_after"], r["shift"])
        for r in QUERIES["ts_mean_shift_breakpoint"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        xs = [c for _, c in sorted(days.items())]
        n, s = len(xs), sum(xs)
        best_t, best_gain = None, None
        s1 = 0
        for t in range(1, n):
            s1 += xs[t - 1]
            gain = (float(s1) * n - float(t) * s) ** 2 / (
                float(t) * (n - t)
            )
            if best_gain is None or gain > best_gain:
                best_gain, best_t, best_s1 = gain, t, s1
        mb = best_s1 // best_t
        ma = (s - best_s1) // (n - best_t)
        assert got[et] == (best_t, n, mb, ma, ma - mb)
        # the split truly is the SSE-optimal one: exhaustive check done


def test_diurnal_profile_matches_python_replay(spark):
    hourly = defaultdict(Counter)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        hourly[r["event_type"]][r["ts"].hour] += 1
    got = {
        r["event_type"]: (r["peak_hour"], r["peak_share_ppm"],
                          r["effective_hours_micro"])
        for r in QUERIES["event_diurnal_profile"](spark, SF_DIR).collect()
    }
    for et, hs in hourly.items():
        total = sum(hs.values())
        ssq = sum(n * n for n in hs.values())
        peak_h = min(hs, key=lambda h: (-hs[h], h))
        eff = total * total * 1000000 // ssq
        assert got[et] == (peak_h, hs[peak_h] * 1000000 // total, eff)
        assert 1000000 <= eff <= 24000000


def test_pinball_loss_propriety(spark):
    vals = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        if r["value"] is not None:
            vals[r["event_type"]].append(
                (round(r["value"] * 100), r["event_id"])
            )
    got = {
        r["event_type"]: (r["n"], r["p90"], r["p50"],
                          r["pinball90_at_p90_decicents"],
                          r["pinball90_at_p50_decicents"])
        for r in QUERIES["ml_pinball_loss"](spark, SF_DIR).collect()
    }
    for et, cs in vals.items():
        cs.sort()
        n = len(cs)
        p90 = cs[(9 * n + 9) // 10 - 1][0]
        p50 = cs[(n + 1) // 2 - 1][0]

        def pb(pred):
            return sum(
                9 * (c - pred) if c >= pred else (pred - c)
                for c, _ in cs
            )

        assert got[et] == (n, p90, p50, pb(p90), pb(p50))
        # propriety: the true 90th percentile minimizes pinball@0.9
        assert pb(p90) <= pb(p50)


def test_rich_club_matches_python_replay(spark):
    edges = _copurchase_edges(spark)
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    got = {
        r["k"]: (r["n_club"], r["e_club"], r["phi_ppm"])
        for r in QUERIES["graph_rich_club"](spark, SF_DIR).collect()
    }
    for k in (4, 8, 16):
        club = {n for n, d in deg.items() if d > k}
        if len(club) < 2:
            assert k not in got
            continue
        e_club = sum(1 for u, v in edges if u in club and v in club)
        phi = e_club * 2000000 // (len(club) * (len(club) - 1))
        assert got[k] == (len(club), e_club, phi)
        assert 0 <= phi <= 1000000


def test_mincer_zarnowitz_matches_python_replay(spark):
    import math

    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    got = {
        r["event_type"]: (r["n"], r["beta_milli"], r["alpha_milli"])
        for r in QUERIES["agg_mincer_zarnowitz"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        ys = [c for _, c in sorted(days.items())]
        fs, acts = ys[:-1], ys[1:]
        n = len(fs)
        sf, sy = sum(fs), sum(acts)
        sff = sum(f * f for f in fs)
        sfy = sum(f * y for f, y in zip(fs, acts))
        beta = (float(n) * sfy - float(sf) * sy) / (
            float(n) * sff - float(sf) * sf
        )
        alpha = sy / n - beta * (sf / n)
        assert got[et] == (
            n, math.floor(beta * 1000), math.floor(alpha * 1000),
        )


def test_chao1_matches_python_replay(spark):
    per_user = defaultdict(Counter)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        per_user[r["event_type"]][r["user_id"]] += 1
    got = {
        r["event_type"]: (r["s_obs"], r["f1"], r["f2"], r["chao1_hat"])
        for r in QUERIES["event_chao1_richness"](spark, SF_DIR).collect()
    }
    for et, users in per_user.items():
        s = len(users)
        f1 = sum(1 for n in users.values() if n == 1)
        f2 = sum(1 for n in users.values() if n == 2)
        assert got[et] == (s, f1, f2, s + f1 * f1 // (2 * (f2 + 1)))
        # the estimator never undercounts the observed richness
        assert got[et][3] >= s


def test_staleness_aoi_matches_python_replay(spark):
    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    last_p = {}
    ages = []
    for r in rows:
        us = int(r["ts"].timestamp() * 1000000)
        u = r["user_id"]
        if r["event_type"] == "purchase":
            last_p[u] = max(last_p.get(u, us), us)
        if r["event_type"] == "view" and u in last_p:
            ages.append(us - last_p[u])
    r = QUERIES["event_staleness_aoi"](spark, SF_DIR).collect()[0]
    assert (r["n_views"], r["avg_age_us"], r["max_age_us"],
            r["n_stale_over_1d"]) == (
        len(ages), sum(ages) // len(ages), max(ages),
        sum(1 for a in ages if a > 86400000000),
    )


def test_medallion_gold_matches_python_replay(spark):
    rows = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    best = {}
    for r in rows:
        if r["user_id"] is None or r["event_type"] is None:
            continue
        k = r["event_id"]
        if k not in best or (r["ts"],) < (best[k]["ts"],):
            best[k] = r
    gold = defaultdict(lambda: [0, set(), 0])
    for r in best.values():
        g = gold[(r["ts"].date(), r["event_type"])]
        g[0] += 1
        g[1].add(r["user_id"])
        if r["value"] is not None:
            g[2] += round(r["value"] * 100)
    got = {
        (r["day"], r["event_type"]): (r["n_events"], r["n_users"],
                                      r["revenue_cents"],
                                      r["revenue_per_user_millicents"])
        for r in QUERIES["pipeline_medallion_gold"](spark, SF_DIR).collect()
    }
    want = {
        k: (n, len(us), rev, rev * 1000 // len(us))
        for k, (n, us, rev) in gold.items()
    }
    assert got == want


def test_conformal_interval_matches_python_replay(spark):
    import datetime

    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    epoch = datetime.date(2024, 1, 1)
    got = {
        r["event_type"]: (r["qhat"], r["n_test"], r["n_covered"],
                          r["coverage_ppm"])
        for r in QUERIES["ml_conformal_interval"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        seq = sorted(days.items())
        resid = []
        for (d0, y0), (d1, y1) in zip(seq, seq[1:]):
            dn = (d1 - epoch).days
            resid.append((dn, abs(y1 - y0)))
        cal = sorted(
            (r for dn, r in resid if dn % 2 == 0)
        )
        n = len(cal)
        q = cal[min(n, (9 * (n + 1) + 9) // 10) - 1]
        test = [r for dn, r in resid if dn % 2 == 1]
        cov = sum(1 for r in test if r <= q)
        assert got[et] == (
            q, len(test), cov, cov * 1000000 // len(test),
        )
        # coverage targets 90% but wobbles hard on ~15 test points
        # (and persistence residuals are serially dependent, so the
        # exchangeability premise is only approximate here)
        assert got[et][3] >= 500000


def test_interval_union_matches_python_replay(spark):
    iv = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        us = int(r["ts"].timestamp() * 1000000)
        iv[r["user_id"]].append((us, us + 300000000))
    got = {
        r["user_id"]: (r["n_spans"], r["active_seconds"])
        for r in QUERIES["agg_interval_union_time"](spark, SF_DIR).collect()
    }
    for u, spans in iv.items():
        spans.sort()
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        total = sum(e - s for s, e in merged)
        assert got[u] == (len(merged), total // 1000000)
        # union never exceeds the naive sum, never undershoots one span
        assert 300 <= got[u][1] <= len(spans) * 300


def test_cramer_von_mises_matches_python_replay(spark):
    u = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        u[r["event_type"]].append(
            ((r["event_id"] * 2654435761) % 1000000, r["event_id"])
        )
    got = {
        r["event_type"]: (r["n"], r["cvm_sum_micro"], r["omega2_micro"])
        for r in QUERIES["agg_cramer_von_mises"](spark, SF_DIR).collect()
    }
    for et, xs in u.items():
        xs.sort()
        n = len(xs)
        num = sum(
            ((2 * i - 1) * 1000000 - 2 * n * x) ** 2
            for i, (x, _) in enumerate(xs, start=1)
        )
        cvm_sum = num // (4 * n * n * 1000000)
        omega2 = (cvm_sum + 1000000 // (12 * n)) // n
        assert got[et] == (n, cvm_sum, omega2)
        # a uniform hash stream should be nearly calibrated
        assert omega2 < 5000


def test_running_records_matches_python_replay(spark):
    import math

    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda r: (r["event_type"], r["ts"], r["event_id"]),
    )
    agg = defaultdict(lambda: [0, 0, None])
    for r in rows:
        if r["value"] is None:
            continue
        c = round(r["value"] * 100)
        a = agg[r["event_type"]]
        a[0] += 1
        if a[2] is None or c > a[2]:
            a[1] += 1
            a[2] = c
    got = {
        r["event_type"]: (r["n"], r["n_records"], r["final_record"])
        for r in QUERIES["window_running_records"](spark, SF_DIR).collect()
    }
    assert got == {et: tuple(a) for et, a in agg.items()}
    # i.i.d. theory: record count concentrates near H_n ~ ln n + gamma
    for et, (n, nr, _) in got.items():
        expect = math.log(n) + 0.5772
        assert nr <= 6 * expect  # generous trend band


def test_brier_decomposition_sanity_and_replay(spark):
    bins = QUERIES["ml_ece"](spark, SF_DIR).collect()
    r = QUERIES["ml_brier_decomposition"](spark, SF_DIR).collect()[0]
    n = sum(b["n"] for b in bins)
    ypos = sum(b["n_pos"] for b in bins)
    rows = QUERIES["ml_eval_suite_shared_scan"](spark, SF_DIR).collect()
    assert r["n"] == n and r["ypos"] == ypos
    # sanity: each Murphy term lives in [0, 250000] micro (= 0.25)
    for k in ("reliability_micro", "resolution_micro",
              "uncertainty_micro"):
        assert 0 <= r[k] <= 250000
    # resolution can never exceed uncertainty
    assert r["resolution_micro"] <= r["uncertainty_micro"]
    # the 3-term Murphy sum UNDERSHOOTS the raw Brier by the
    # within-bin variance/covariance residual (Stephenson et al.
    # 2008) — sizable with 11-score-wide bins; check direction + band
    suite = {x["metric"]: x["value"] for x in rows}
    approx_bs_micro = (
        r["reliability_micro"] - r["resolution_micro"]
        + r["uncertainty_micro"]
    )
    assert approx_bs_micro * 1000 <= suite["brier_nano"] + 1000000
    assert suite["brier_nano"] - approx_bs_micro * 1000 <= 150000000


def test_delta_method_ratio_var_replay(spark):
    import math

    per_user = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        u = per_user[r["user_id"]]
        if r["event_type"] == "purchase" and r["value"] is not None:
            u[0] += round(r["value"] * 100)
        if r["event_type"] == "view":
            u[1] += 1
    xs = [x for x, _ in per_user.values()]
    ys = [y for _, y in per_user.values()]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    ratio = sx / sy
    var = (
        (sx / sy) * (sx / sy)
        * (
            (float(n) * sxx - float(sx) * sx) / (float(sx) * sx)
            + (float(n) * syy - float(sy) * sy) / (float(sy) * sy)
            - 2 * (float(n) * sxy - float(sx) * sy) / (float(sx) * sy)
        )
        / n
    )
    r = QUERIES["agg_delta_method_ratio_var"](spark, SF_DIR).collect()[0]
    assert (r["n"], r["sx"], r["sy"]) == (n, sx, sy)
    assert r["ratio_micro"] == math.floor(ratio * 1000000)
    assert r["var_ratio_pico"] == math.floor(var * 1000000000000)
    assert r["var_ratio_pico"] >= 0


def test_heaps_fit_matches_python_replay(spark):
    import math

    docs = {
        r["doc_id"]: _norm_tokens(r["text"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    first = {}
    tpd = {}
    for did in sorted(docs):
        tpd[did] = len(docs[did])
        for w in docs[did]:
            first.setdefault(w, did)
    pts = []
    for k in (10, 20, 40, 80, 160, 320):
        n_tok = sum(n for d, n in tpd.items() if d < k)
        v = sum(1 for d in first.values() if d < k)
        if n_tok > 0 and v > 0:
            pts.append((
                math.floor(math.log(n_tok) * 1000000),
                math.floor(math.log(v) * 1000000),
            ))
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    beta = (float(m) * sxy - float(sx) * sy) / (
        float(m) * sxx - float(sx) * sx
    )
    r = QUERIES["text_heaps_law_fit"](spark, SF_DIR).collect()[0]
    assert (r["m"], r["beta_milli"]) == (m, math.floor(beta * 1000))
    # sublinear growth; the synthetic template vocabulary saturates
    # early, so beta can sit near 0 — just pin the sane band
    assert 0 <= r["beta_milli"] < 1200


def test_deadman_alerts_match_python_replay(spark):
    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    gaps = defaultdict(list)
    last = {}
    for r in rows:
        us = int(r["ts"].timestamp() * 1000000)
        u = r["user_id"]
        if u in last:
            gaps[u].append((us - last[u]) // 1000000)
        last[u] = us
    now = max(last.values())
    got = {
        r["user_id"]: (r["median_gap_s"], r["silent_s"], r["is_alert"])
        for r in QUERIES["event_deadman_alerts"](spark, SF_DIR).collect()
    }
    for u, gs in gaps.items():
        gs.sort()
        med = gs[(len(gs) + 1) // 2 - 1]
        silent = (now - last[u]) // 1000000
        alert = 1 if now - last[u] > 3 * med * 1000000 else 0
        assert got[u] == (med, silent, alert)


def test_entropy_rate_matches_python_replay(spark):
    import math

    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    trans = Counter()
    prev = {}
    for r in rows:
        u = r["user_id"]
        if u in prev:
            trans[(prev[u], r["event_type"])] += 1
        prev[u] = r["event_type"]
    outs = Counter()
    for (a, _), c in trans.items():
        outs[a] += c
    grand = sum(trans.values())
    s = -sum(
        c * math.floor(math.log(c / outs[a]) * 1000000)
        for (a, _), c in trans.items()
    )
    r = QUERIES["event_entropy_rate"](spark, SF_DIR).collect()[0]
    assert (r["n_cells"], r["entropy_rate_micronats"]) == (
        len(trans), s // grand,
    )
    # bounded by ln(n_states) for a 5-state chain
    assert 0 <= r["entropy_rate_micronats"] <= 1609438


def test_filter_clause_matches_python_replay(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0, set()])
    for r in orders:
        a = agg[r["o_orderstatus"]]
        a[0] += 1
        if r["o_orderpriority"] == "1-URGENT":
            a[1] += 1
            a[2] += round(r["o_totalprice"] * 100)
        if r["o_orderdate"].year == 1997:
            a[3].add(r["o_custkey"])
    got = {
        r["o_orderstatus"]: (r["n"], r["n_urgent"], r["urgent_cents"],
                             r["custs_1997"])
        for r in QUERIES["sql_filter_clause_aggs"](spark, SF_DIR).collect()
    }
    want = {
        s: (n, nu, uc if nu else None, len(cs))
        for s, (n, nu, uc, cs) in agg.items()
    }
    assert got == want


def test_fano_matches_python_replay(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    got = {
        r["event_type"]: (r["n"], r["s"], r["fano_milli"])
        for r in QUERIES["agg_fano_overdispersion"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        xs = list(days.values())
        n, s = len(xs), sum(xs)
        ss = sum(x * x for x in xs)
        fano = (n * ss - s * s) * 1000 // (n * (n - 1) * s)
        assert got[et] == (n, s, fano)
        assert got[et][2] >= 0


def test_western_electric_matches_python_replay(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    got = {
        r["event_type"]: (r["n_days"], r["n_rule1"], r["n_rule2"],
                          r["n_rule3"], r["n_rule4"])
        for r in QUERIES["window_western_electric"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        xs = [c for _, c in sorted(days.items())]
        n, s = len(xs), sum(xs)
        q = sum(x * x for x in xs)
        var_num = n * q - s * s

        def beyond(x, k):
            return (n - 1) * (n * x - s) ** 2 > k * k * n * var_num

        sides = [1 if n * x - s > 0 else -1 for x in xs]
        b3 = [beyond(x, 3) for x in xs]
        b2 = [beyond(x, 2) for x in xs]
        b1 = [beyond(x, 1) for x in xs]
        r1 = sum(b3)
        r2 = r3 = r4 = 0
        for i in range(n):
            lo3, lo5, lo8 = max(0, i - 2), max(0, i - 4), max(0, i - 7)
            for sgn in (1, -1):
                if sum(
                    1 for j in range(lo3, i + 1)
                    if sides[j] == sgn and b2[j]
                ) >= 2:
                    r2 += 1
                    break
            for sgn in (1, -1):
                if sum(
                    1 for j in range(lo5, i + 1)
                    if sides[j] == sgn and b1[j]
                ) >= 4:
                    r3 += 1
                    break
            w = sides[lo8:i + 1]
            if len(w) == 8 and abs(sum(w)) == 8:
                r4 += 1
        assert got[et] == (n, r1, r2, r3, r4)


def test_hexbin_matches_python_replay(spark):
    import math

    got = {
        (r["hq"], r["hr"]): r["n"]
        for r in QUERIES["geo_hexbin_rollup"](spark, SF_DIR).collect()
    }
    cells = Counter()
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        y, x = _synth_pt(r["event_id"])
        q = (0.5773502691896258 * x - 0.3333333333333333 * y) / 10000000
        rr = (0.6666666666666666 * y) / 10000000
        s = -q - rr
        rq, rrr, rs = (
            math.floor(q + 0.5), math.floor(rr + 0.5), math.floor(s + 0.5),
        )
        dq, dr, ds = abs(rq - q), abs(rrr - rr), abs(rs - s)
        if dq > dr and dq > ds:
            hq, hr = -rrr - rs, rrr
        elif dr > ds:
            hq, hr = rq, -rq - rs
        else:
            hq, hr = rq, rrr
        cells[(hq, hr)] += 1
    want = {c: n for c, n in cells.items() if n >= 5}
    assert got == want
    # cube invariant holds for every emitted cell implicitly (q+r+s=0)
    assert want


def test_js_divergence_matches_python_replay(spark):
    import math

    docs = [
        (r["source"], _norm_tokens(r["text"]))
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    words = Counter()
    per_src = defaultdict(Counter)
    for s, tk in docs:
        words.update(tk)
        per_src[s].update(tk)
    top30 = [
        w for w, _ in sorted(words.items(), key=lambda t: (-t[1], t[0]))[:30]
    ]
    srcs = sorted(per_src)
    c = {(s, w): per_src[s][w] for s in srcs for w in top30}
    ct = {s: sum(c[(s, w)] for w in top30) for s in srcs}
    want = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            tot = 0
            for w in top30:
                ca, cb = c[(sa, w)], c[(sb, w)]
                cta, ctb = ct[sa], ct[sb]
                t = 0
                if ca > 0:
                    t += _tdiv(ca * math.floor(math.log(
                        (2.0 * ca * ctb) / (ca * ctb + cb * cta)
                    ) * 1000000), 2 * cta)
                if cb > 0:
                    t += _tdiv(cb * math.floor(math.log(
                        (2.0 * cb * cta) / (ca * ctb + cb * cta)
                    ) * 1000000), 2 * ctb)
                tot += t
            want[(sa, sb)] = tot
    got = {
        (r["src_a"], r["src_b"]): r["js_micronats"]
        for r in QUERIES["text_js_divergence"](spark, SF_DIR).collect()
    }
    assert got == want
    # JS is bounded by ln 2 (floor-quantization can push a term
    # slightly below 0 but never above the bound)
    assert all(v <= 693148 for v in got.values())


def test_kruskal_wallis_matches_python_replay(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    rows = [
        (et, c) for et, days in daily.items() for _, c in days.items()
    ]
    vals = sorted(c for _, c in rows)
    less = {}
    eq = Counter(vals)
    seen = 0
    for v in vals:
        if v not in less:
            less[v] = seen
        seen += 1
    grp = defaultdict(lambda: [0, 0])
    for et, c in rows:
        r2 = 2 * less[c] + eq[c] + 1
        g = grp[et]
        g[0] += 1
        g[1] += r2
    n = sum(g[0] for g in grp.values())
    ssum = sum(_tdiv(s2 * s2, ng) for ng, s2 in grp.values())
    h = _tdiv(3000 * (ssum - n * (n + 1) * (n + 1)), n * (n + 1))
    r = QUERIES["agg_kruskal_wallis"](spark, SF_DIR).collect()[0]
    assert (r["n_groups"], r["n"], r["h_milli"]) == (len(grp), n, h)
    # H is chi-square(k-1)-ish under the null: sane magnitude
    assert -1000 <= r["h_milli"] < 1000000


def test_stochastic_k_matches_python_replay(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        if r["value"] is not None:
            daily[r["event_type"]][r["ts"].date()] += round(
                r["value"] * 100
            )
    got = {
        (r["event_type"], r["day"]): (r["c"], r["pct_k_ppm"])
        for r in QUERIES["window_stochastic_k"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        seq = sorted(days.items())
        for i in range(13, len(seq)):
            frame = [c for _, c in seq[i - 13:i + 1]]
            lo, hi = min(frame), max(frame)
            c = frame[-1]
            want = (
                (c - lo) * 1000000 // (hi - lo) if hi > lo else 500000
            )
            assert got[(et, seq[i][0])] == (c, want)
            assert 0 <= want <= 1000000


def test_theil_u2_matches_python_replay(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    got = {
        r["event_type"]: (r["n"], r["sse_model"], r["sse_naive"],
                          r["u2_ppm"])
        for r in QUERIES["ts_theil_u2"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        ys = [c for _, c in sorted(days.items())]
        em = [(ys[i] - ys[i - 7]) for i in range(7, len(ys))]
        en = [(ys[i] - ys[i - 1]) for i in range(7, len(ys))]
        sm = sum(e * e for e in em)
        sn = sum(e * e for e in en)
        assert got[et] == (len(em), sm, sn, sm * 1000000 // sn)


def test_anderson_darling_matches_python_replay(spark):
    import math

    u = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        u[r["event_type"]].append(
            ((r["event_id"] * 2654435761) % 1000000, r["event_id"])
        )
    got = {
        r["event_type"]: (r["n"], r["a2_micro"])
        for r in QUERIES["agg_anderson_darling"](spark, SF_DIR).collect()
    }
    for et, xs in u.items():
        xs.sort()
        n = len(xs)
        ln_f = [
            math.floor(math.log(max(x, 1) / 1000000.0) * 1000000)
            for x, _ in xs
        ]
        ln_1mf = [
            math.floor(
                math.log(max(1000000 - x, 1) / 1000000.0) * 1000000
            )
            for x, _ in xs
        ]
        s = sum(
            (2 * i - 1) * (ln_f[i - 1] + ln_1mf[n - i])
            for i in range(1, n + 1)
        )
        a2 = -n * 1000000 - _tdiv(s, n)
        assert got[et] == (n, a2)
        # uniform hash stream: A^2 near 1 (micro units), never huge
        assert -1000000 < got[et][1] < 10000000


def test_retention_decay_fit_matches_python_replay(spark):
    import math

    firsts = {}
    acts = set()
    rows = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    for r in rows:
        d = r["ts"].date()
        u = r["user_id"]
        if u not in firsts or d < firsts[u]:
            firsts[u] = d
    for r in rows:
        age = (r["ts"].date() - firsts[r["user_id"]]).days
        if 1 <= age <= 14:
            acts.add((r["user_id"], age))
    curve = Counter(age for _, age in acts)
    pts = [
        (
            math.floor(math.log(age) * 1000000),
            math.floor(math.log(n) * 1000000),
        )
        for age, n in sorted(curve.items())
        if n > 0
    ]
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    beta = (float(m) * sxy - float(sx) * sy) / (
        float(m) * sxx - float(sx) * sx
    )
    r = QUERIES["event_retention_decay_fit"](spark, SF_DIR).collect()[0]
    assert (r["m"], r["decay_exponent_milli"]) == (
        m, math.floor(beta * 1000),
    )


def test_ulcer_index_matches_python_replay(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        if r["value"] is not None:
            daily[r["event_type"]][r["ts"].date()] += round(
                r["value"] * 100
            )
    got = {
        r["event_type"]: (r["n"], r["max_drawdown_ppm"],
                          r["ulcer_sq_ppm2"])
        for r in QUERIES["window_ulcer_index"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        xs = [c for _, c in sorted(days.items())]
        peak, dds = None, []
        for c in xs:
            peak = c if peak is None else max(peak, c)
            if peak > 0:
                dds.append((peak - c) * 1000000 // peak)
        ui2 = sum(d * d for d in dds) // len(dds)
        assert got[et] == (len(dds), max(dds), ui2)
        # UI^2 never exceeds maxdd^2
        assert ui2 <= max(dds) ** 2


def test_dft_weekly_power_matches_python_replay(spark):
    import datetime
    import math

    daily = defaultdict(lambda: defaultdict(int))
    epoch = datetime.date(2024, 1, 1)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][(r["ts"].date() - epoch).days] += 1
    cos7 = [math.cos(2 * math.pi * k / 7) for k in range(7)]
    sin7 = [math.sin(2 * math.pi * k / 7) for k in range(7)]
    # the query carries these as fixed literals; pin them
    lits_c = [1.0, 0.6234898018587336, -0.2225209339563144,
              -0.9009688679024191, -0.9009688679024191,
              -0.2225209339563144, 0.6234898018587336]
    lits_s = [0.0, 0.7818314824680298, 0.9749279121818236,
              0.43388373911755823, -0.43388373911755823,
              -0.9749279121818236, -0.7818314824680298]
    for k in range(7):
        assert abs(cos7[k] - lits_c[k]) < 1e-12
        assert abs(sin7[k] - (-lits_s[k])) < 1e-12 or abs(
            sin7[k] - lits_s[k]
        ) < 1e-12
    got = {
        r["event_type"]: (r["n"], r["re_milli"], r["im_milli"],
                          r["weekly_power"])
        for r in QUERIES["ts_dft_weekly_power"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        re = sum(
            math.floor(x * lits_c[t % 7] * 1000)
            for t, x in days.items()
        )
        im = sum(
            math.floor(x * lits_s[t % 7] * 1000)
            for t, x in days.items()
        )
        power = (re * re + im * im) // 1000000
        assert got[et] == (len(days), re, im, power)


def test_oaxaca_identity(spark):
    r = QUERIES["agg_oaxaca_blinder"](spark, SF_DIR).collect()[0]
    # two-fold identity within the milli flooring slack
    assert abs(
        r["gap_milli"] - (r["explained_milli"] + r["unexplained_milli"])
    ) <= 2


def test_mod97_validates_and_detects_corruption(spark):
    rows = QUERIES["fn_mod97_checkdigits"](spark, SF_DIR).collect()
    assert rows and all(r["valid"] == 1 for r in rows)
    for r in rows[:100]:
        acct = r["account_no"]
        assert acct % 97 == 1
        # any single-digit corruption breaks the checksum
        corrupted = acct + 1
        assert corrupted % 97 != 1
        # adjacent transposition in the last two digits breaks it too
        d1, d0 = (acct // 10) % 10, acct % 10
        if d1 != d0:
            swapped = acct - d1 * 10 - d0 + d0 * 10 + d1
            assert swapped % 97 != 1


def test_mcc_matches_python_replay(spark):
    import math

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    mt = max(r["o_totalprice"] for r in orders)
    tp = tn = fp = fn = 0
    for r in orders:
        y = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        yhat = 1 if r["o_totalprice"] * 1000 > mt * 500 else 0
        if y and yhat:
            tp += 1
        elif not y and not yhat:
            tn += 1
        elif not y and yhat:
            fp += 1
        else:
            fn += 1
    mcc = math.floor(
        (float(tp) * tn - float(fp) * fn)
        / math.sqrt(
            float(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
        )
        * 1000000
    )
    r = QUERIES["ml_mcc_matthews"](spark, SF_DIR).collect()[0]
    assert (r["tp"], r["tn"], r["fp"], r["fn"], r["mcc_micro"]) == (
        tp, tn, fp, fn, mcc,
    )
    assert -1000000 <= r["mcc_micro"] <= 1000000


def test_smape_matches_python_replay(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    got = {
        r["event_type"]: (r["n"], r["smape_ppm"])
        for r in QUERIES["ts_smape"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        ys = [c for _, c in sorted(days.items())]
        ts = [
            2 * abs(b - a) * 1000000 // (a + b) if a + b > 0 else 0
            for a, b in zip(ys, ys[1:])
        ]
        assert got[et] == (len(ts), sum(ts) // len(ts))
        # sMAPE is bounded at 200%
        assert 0 <= got[et][1] <= 2000000


def test_realized_volatility_matches_python_replay(spark):
    import math

    ticks = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        if r["value"] is not None:
            c = round(r["value"] * 100)
            if c > 0:
                ticks[(r["event_type"], r["ts"].date())].append(
                    (r["ts"], r["event_id"], c)
                )
    got = {
        (r["event_type"], r["day"]): (r["n_returns"], r["rv_micro2"])
        for r in QUERIES["window_realized_volatility"](
            spark, SF_DIR
        ).collect()
    }
    want = {}
    for key, seq in ticks.items():
        seq.sort()
        rets = [
            math.floor(math.log(b[2] / a[2]) * 1000000)
            for a, b in zip(seq, seq[1:])
        ]
        if len(rets) >= 5:
            want[key] = (
                len(rets),
                _tdiv(sum(x * x for x in rets), 1000000),
            )
    assert got == want


def test_gap_autocorr_matches_python_replay(spark):
    import math

    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda r: (r["event_type"], r["ts"], r["event_id"]),
    )
    gaps = defaultdict(list)
    prev = {}
    for r in rows:
        us = int(r["ts"].timestamp() * 1000000)
        et = r["event_type"]
        if et in prev:
            gaps[et].append((us - prev[et]) // 1000000)
        prev[et] = us
    got = {
        r["event_type"]: (r["n"], r["rho1_milli"])
        for r in QUERIES["event_gap_autocorr"](spark, SF_DIR).collect()
    }
    for et, gs in gaps.items():
        xs, ys = gs[1:], gs[:-1]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        rho = (float(n) * sxy - float(sx) * sy) / math.sqrt(
            (float(n) * sxx - float(sx) * sx)
            * (float(n) * syy - float(sy) * sy)
        )
        assert got[et] == (n, math.floor(rho * 1000))
        assert -1000 <= got[et][1] <= 1000


def test_role_playing_dates_matches_python_replay(spark):
    import datetime

    orders = {
        r["o_orderkey"]: r["o_orderdate"].date()
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }

    def wk(d):
        return 1 if ((d - datetime.date(1970, 1, 1)).days + 4) % 7 in (
            0, 6,
        ) else 0

    agg = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        od = orders[r["l_orderkey"]]
        sd = r["l_shipdate"].date() if hasattr(
            r["l_shipdate"], "date"
        ) else r["l_shipdate"]
        k = (od.year, wk(od), wk(sd))
        agg[k][0] += 1
        agg[k][1] += round(r["l_extendedprice"] * 100)
    got = {
        (r["order_year"], r["ordered_weekend"], r["shipped_weekend"]):
            (r["n_lines"], r["cents"])
        for r in QUERIES["dim_role_playing_dates"](spark, SF_DIR).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    # both roles genuinely vary
    assert len({k[1] for k in got}) == 2 and len({k[2] for k in got}) == 2


def test_qini_matches_python_replay(spark):
    ux = defaultdict(lambda: [0, 0, 0])
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        u = ux[r["user_id"]]
        u[0] += 1
        if r["event_type"] == "signup":
            u[1] += 1
        if r["event_type"] == "purchase":
            u[2] += 1
    te = sum(v[0] for v in ux.values())
    ts = sum(v[1] for v in ux.values())
    tp = sum(v[2] for v in ux.values())
    ordered = sorted(ux.items(), key=lambda kv: (-kv[1][0], kv[0]))
    n_users = len(ordered)
    base, extra = divmod(n_users, 5)
    cells = defaultdict(lambda: [0, 0, 0, 0])
    pos = 0
    for i in range(1, 6):
        size = base + (1 if i <= extra else 0)
        for uid, (ne, ns, np_) in ordered[pos:pos + size]:
            t = 1 if ns * te > ts * ne else 0
            y = 1 if np_ * te > tp * ne else 0
            c = cells[i]
            if t:
                c[0] += 1
                c[1] += y
            else:
                c[2] += 1
                c[3] += y
        pos += size
    got = {
        r["seg"]: (r["cnt_t"], r["cnt_c"], r["cy_t"], r["cy_c"],
                   r["qini_incremental"])
        for r in QUERIES["ml_qini_curve"](spark, SF_DIR).collect()
    }
    ct = cc = yt = yc = 0
    for seg in range(1, 6):
        nt, yts, nc, ycs = cells[seg]
        ct += nt
        yt += yts
        cc += nc
        yc += ycs
        if cc > 0:
            assert got[seg] == (ct, cc, yt, yc, yt - yc * ct // cc)


def test_retrieval_suite_consistent_with_matryoshka(spark):
    suite = {
        r["metric"]: r["value"]
        for r in QUERIES["sim_retrieval_eval_suite"](
            spark, SF_DIR
        ).collect()
    }
    assert set(suite) == {"recall_at_10_ppm", "mrr_micro", "coverage_ppm"}
    # recall@10 must be the mean of matryoshka's per-query overlaps
    mat = QUERIES["emb_matryoshka_recall"](spark, SF_DIR).collect()
    total_hits = sum(r["n_overlap"] for r in mat)
    want_recall = total_hits * 100000 // len(mat)
    assert suite["recall_at_10_ppm"] == want_recall
    # coverage must match the standalone beyond-accuracy metric
    cov = QUERIES["ml_reco_coverage_diversity"](spark, SF_DIR).collect()[0][
        "catalog_coverage_ppm"
    ]
    # the suite covers top-10 lists; the standalone uses top-5 — so
    # suite coverage can only be >= the top-5 coverage
    assert suite["coverage_ppm"] >= cov
    assert 0 <= suite["mrr_micro"] <= 1000000


def test_segment_migration_matches_python_replay(spark):
    import datetime

    weekly = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        d = r["ts"].date()
        wk = d - datetime.timedelta(days=d.weekday())
        weekly[wk][r["user_id"]] += 1
    tiers = {}
    for wk, users in weekly.items():
        ordered = sorted(users.items(), key=lambda kv: (kv[1], kv[0]))
        n = len(ordered)
        base, extra = divmod(n, 3)
        pos = 0
        for t in range(1, 4):
            size = base + (1 if t <= extra else 0)
            for uid, _ in ordered[pos:pos + size]:
                tiers[(uid, wk)] = t
            pos += size
    flows = Counter()
    for (uid, wk), t in tiers.items():
        nxt = (uid, wk + datetime.timedelta(days=7))
        if nxt in tiers:
            flows[(wk, t, tiers[nxt])] += 1
    got = {
        (r["from_wk"], r["from_tier"], r["to_tier"]): r["n_users"]
        for r in QUERIES["event_segment_migration"](spark, SF_DIR).collect()
    }
    assert got == dict(flows)
    # flows out of a week can't exceed that week's population
    by_week = Counter()
    for (wk, _, _), c in flows.items():
        by_week[wk] += c
    for wk, c in by_week.items():
        assert c <= len(weekly[wk])


def test_membership_inference_matches_python_replay(spark):
    import hashlib
    import re

    def norm(t):
        return re.sub(r"\s+", " ", t).strip().lower()

    docs = {
        r["doc_id"]: hashlib.md5(norm(r["text"]).encode()).hexdigest()
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    train = {h for d, h in docs.items() if d % 2 == 0}
    n_mem = sum(1 for d in docs if d % 2 == 0)
    n_non = len(docs) - n_mem
    fp = sum(1 for d, h in docs.items() if d % 2 == 1 and h in train)
    r = QUERIES["privacy_membership_inference"](spark, SF_DIR).collect()[0]
    assert (r["n_members"], r["n_nonmembers"], r["n_false_members"],
            r["attack_advantage_ppm"]) == (
        n_mem, n_non, fp, 1000000 - fp * 1000000 // n_non,
    )
    # advantage bounded by the perfect-attack ceiling
    assert 0 <= r["attack_advantage_ppm"] <= 1000000


def test_critical_path_matches_python_replay(spark):
    orders = {
        r["o_orderkey"]: r["o_orderdate"].date()
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    per_order = {}
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        sd = r["l_shipdate"]
        sd = sd.date() if hasattr(sd, "date") else sd
        key = r["l_orderkey"]
        cand = (sd, -r["l_suppkey"])
        if key not in per_order or cand > per_order[key][0]:
            per_order[key] = (cand, r["l_suppkey"], sd)
    agg = defaultdict(lambda: [0, 0, None])
    for ok, (_, supp, sd) in per_order.items():
        lag = (sd - orders[ok]).days
        a = agg[supp]
        a[0] += 1
        a[1] += lag
        a[2] = lag if a[2] is None else max(a[2], lag)
    want = {
        s: tuple(v) for s, v in agg.items() if v[0] >= 3
    }
    got = {
        r["l_suppkey"]: (r["n_orders_bottlenecked"], r["total_lag_days"],
                         r["worst_lag_days"])
        for r in QUERIES["join_critical_path_supplier"](
            spark, SF_DIR
        ).collect()
    }
    assert got == want
    assert want


def test_group_roc_points_matches_python_replay(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    mt = max(r["o_totalprice"] for r in orders)
    cells = defaultdict(lambda: [0, 0])
    import math

    for r in orders:
        band = min(math.floor(r["o_totalprice"] * 10 / mt), 9)
        y = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        c = cells[(r["o_orderstatus"], band)]
        if y:
            c[0] += 1
        else:
            c[1] += 1
    groups = {g for g, _ in cells}
    got = {
        (r["grp"], r["threshold_band"]): (r["tpr_micro"], r["fpr_micro"])
        for r in QUERIES["ml_group_roc_points"](spark, SF_DIR).collect()
    }
    for g in groups:
        p = sum(c[0] for (gg, _), c in cells.items() if gg == g)
        n = sum(c[1] for (gg, _), c in cells.items() if gg == g)
        if p == 0 or n == 0:
            continue
        bands = sorted(
            {b for (gg, b) in cells if gg == g}, reverse=True
        )
        tp = fp = 0
        prev_tpr = prev_fpr = -1
        for b in bands:
            tp += cells[(g, b)][0]
            fp += cells[(g, b)][1]
            want = (tp * 1000000 // p, fp * 1000000 // n)
            assert got[(g, b)] == want
            # ROC points are monotone along the sweep
            assert want[0] >= prev_tpr and want[1] >= prev_fpr
            prev_tpr, prev_fpr = want


def test_obv_matches_python_replay(spark):
    daily = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        d = daily[r["event_type"]][r["ts"].date()]
        if r["value"] is not None:
            d[0] += round(r["value"] * 100)
        d[1] += 1
    got = {
        (r["event_type"], r["day"]): r["obv"]
        for r in QUERIES["window_on_balance_volume"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        seq = sorted(days.items())
        obv, prev = 0, None
        for d, (px, vol) in seq:
            if prev is not None:
                if px > prev:
                    obv += vol
                elif px < prev:
                    obv -= vol
            prev = px
            assert got[(et, d)] == obv


def test_tpr_at_fpr_matches_python_replay(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    import hashlib

    cells = defaultdict(lambda: [0, 0])
    for r in li:
        noise = int(hashlib.md5(
            f"{r['l_orderkey']}:{r['l_linenumber']}".encode()
        ).hexdigest()[:4], 16) % 10
        score = round(r["l_discount"] * 100) * 10 + noise
        y = 1 if r["l_returnflag"] == "R" else 0
        c = cells[score]
        if y:
            c[0] += 1
        else:
            c[1] += 1
    p = sum(c[0] for c in cells.values())
    n = sum(c[1] for c in cells.values())
    tp = fp = 0
    best = None
    for s in sorted(cells, reverse=True):
        tp += cells[s][0]
        fp += cells[s][1]
        if fp * 100 <= n:
            if best is None or tp > best[1]:
                best = (s, tp, fp)
    r = QUERIES["ml_tpr_at_fpr"](spark, SF_DIR).collect()[0]
    assert (r["threshold_score"], r["tpr_micro"], r["fpr_micro"]) == (
        best[0], best[1] * 1000000 // p, best[2] * 1000000 // n,
    )
    assert r["fpr_micro"] <= 10000


def test_upset_counts_matches_python_replay(spark):
    rows = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    seen = Counter()
    masks = defaultdict(int)
    bits = {"click": 16, "view": 8, "purchase": 4, "signup": 2,
            "error": 1}
    for r in rows:
        u = r["user_id"]
        seen[u] += 1
        if seen[u] <= 5:
            masks[u] |= bits[r["event_type"]]
    want = Counter(masks.values())
    got = {
        r["mask"]: (r["set_size"], r["n_exclusive"])
        for r in QUERIES["event_type_upset_counts"](spark, SF_DIR).collect()
    }
    assert {m: c for m, (_, c) in got.items()} == dict(want)
    for m, (sz, _) in got.items():
        assert sz == bin(m).count("1")
    # the early window genuinely differentiates users
    assert len(got) >= 5
    # total users conserved
    assert sum(c for _, c in got.values()) == len(masks)


def test_concentration_ratios_matches_python_replay(spark):
    spend = defaultdict(int)
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        spend[r["l_suppkey"]] += round(r["l_extendedprice"] * 100)
    ordered = sorted(spend.items(), key=lambda kv: (-kv[1], kv[0]))
    t = sum(spend.values())
    r = QUERIES["agg_concentration_ratios"](spark, SF_DIR).collect()[0]
    for k, col in ((1, "cr1_ppm"), (4, "cr4_ppm"), (8, "cr8_ppm")):
        want = sum(c for _, c in ordered[:k]) * 1000000 // t
        assert r[col] == want
    assert r["n_suppliers"] == len(spend)
    assert r["cr1_ppm"] <= r["cr4_ppm"] <= r["cr8_ppm"] <= 1000000


def test_otif_matches_python_replay(spark):
    orders = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    per_order = {}
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        od = orders[r["l_orderkey"]]
        sd = r["l_shipdate"]
        sd = sd.date() if hasattr(sd, "date") else sd
        lag = (sd - od.date()).days
        ok = 0 <= lag <= 90
        key = (r["l_orderkey"], od.year)
        per_order[key] = per_order.get(key, True) and ok
    agg = defaultdict(lambda: [0, 0])
    for (_, yr), ok in per_order.items():
        a = agg[yr]
        a[0] += 1
        if ok:
            a[1] += 1
    got = {
        r["yr"]: (r["n_orders"], r["n_otif"], r["otif_ppm"])
        for r in QUERIES["join_otif_rate"](spark, SF_DIR).collect()
    }
    for yr, (n, ok) in agg.items():
        assert got[yr] == (n, ok, ok * 1000000 // n)


def test_covariate_balance_smd_matches_python_replay(spark):
    import math

    ux = defaultdict(lambda: [0, 0, set(), 0])
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        u = ux[r["user_id"]]
        u[0] += 1
        if r["event_type"] == "signup":
            u[1] += 1
        u[2].add(r["ts"].date())
        if r["value"] is not None:
            u[3] += round(r["value"] * 100)
    te = sum(v[0] for v in ux.values())
    ts = sum(v[1] for v in ux.values())
    arms = defaultdict(lambda: defaultdict(list))
    for ne, ns, days, cents in (
        (v[0], v[1], len(v[2]), v[3]) for v in ux.values()
    ):
        t = 1 if ns * te > ts * ne else 0
        arms["n_events"][t].append(ne)
        arms["active_days"][t].append(days)
        arms["cents"][t].append(cents)
    got = {
        r["covariate"]: (r["smd_milli"], r["balanced"])
        for r in QUERIES["ml_covariate_balance_smd"](spark, SF_DIR).collect()
    }
    for cov, sides in arms.items():
        stats = {}
        for t in (0, 1):
            xs = sides[t]
            n, s = len(xs), sum(xs)
            ss = sum(x * x for x in xs)
            stats[t] = (
                s / n,
                (float(ss) * n - float(s) * s) / (float(n) * (n - 1)),
            )
        smd = (stats[1][0] - stats[0][0]) / math.sqrt(
            (stats[1][1] + stats[0][1]) / 2
        )
        assert got[cov] == (
            math.floor(smd * 1000), 1 if abs(smd) < 0.1 else 0,
        )


def test_pettitt_matches_python_replay(spark):
    daily = defaultdict(lambda: defaultdict(int))
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        daily[r["event_type"]][r["ts"].date()] += 1
    got = {
        r["event_type"]: (r["change_at"], r["n"], r["k_stat"])
        for r in QUERIES["ts_pettitt_test"](spark, SF_DIR).collect()
    }
    for et, days in daily.items():
        xs = [c for _, c in sorted(days.items())]
        n = len(xs)
        # doubled midranks over the value order
        vals = sorted(xs)
        less, eq = {}, Counter(vals)
        seen = 0
        for v in vals:
            if v not in less:
                less[v] = seen
            seen += 1
        r2 = [2 * less[x] + eq[x] + 1 for x in xs]
        best = None
        s = 0
        for t in range(1, n):
            s += r2[t - 1]
            u = s - t * (n + 1)
            if best is None or abs(u) > abs(best[1]):
                best = (t, u)
        assert got[et] == (best[0], n, abs(best[1]))


def test_degree_gini_matches_python_replay(spark):
    edges = _copurchase_edges(spark)
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    ordered = sorted(deg.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ordered)
    s = sum(d for _, d in ordered)
    num = 2 * sum(i * d for i, (_, d) in enumerate(ordered, start=1))
    gini = (num - (n + 1) * s) * 1000000 // (n * s)
    r = QUERIES["graph_degree_gini"](spark, SF_DIR).collect()[0]
    assert (r["n_nodes"], r["total_degree"], r["gini_ppm"]) == (
        n, s, gini,
    )
    assert 0 <= r["gini_ppm"] < 1000000
