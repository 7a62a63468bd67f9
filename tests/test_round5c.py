"""Round-5 third batch: sequence packing (split + greedy no-split),
paragraph-level dedup, t-closeness, link prediction, FK-integrity
audit, binary-quantized Hamming search — differential + invariant
tests (each key also has a DuckDB oracle; these tests cover the
properties the value-hash can't express)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from php_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR

CAP = 512


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )


def test_pack_sequences_is_exact_concat_and_chunk(spark):
    """Every bin except the last is exactly full, fills sum to the
    corpus token total, and the bin ids are the contiguous prefix
    0..B-1 — i.e. the segmented two-phase offset computation equals
    the naive global cumsum."""
    rows = {
        r["bin_id"]: r
        for r in QUERIES["docs_pack_sequences"](spark, SF_DIR).collect()
    }
    total = sum(len(d["text"].split(" ")) for d in _docs(spark))
    n_bins = (total + CAP - 1) // CAP
    assert set(rows) == set(range(n_bins))
    for b, r in rows.items():
        want = CAP if b < n_bins - 1 else total - (n_bins - 1) * CAP
        assert r["fill_tokens"] == want
        assert 0 <= r["n_whole_docs"] <= r["n_docs"]


def test_pack_greedy_matches_python_fold(spark):
    """The mapInPandas carry fold must equal a per-source Python
    replay of the greedy rule exactly (bins, doc counts and fills)."""
    got = {
        (r["source"], r["bin_id"]): (r["n_docs"], r["fill_tokens"])
        for r in QUERIES["docs_pack_greedy"](spark, SF_DIR).collect()
    }
    by_src = defaultdict(list)
    for d in _docs(spark):
        by_src[d["source"]].append((d["doc_id"], len(d["text"].split(" "))))
    want: dict[tuple[str, int], list[int]] = {}
    for src, docs in by_src.items():
        docs.sort()
        bin_id, fill = 0, 0
        for i, (_, ntok) in enumerate(docs):
            if i == 0:
                fill = ntok
            elif fill + ntok > CAP:
                bin_id += 1
                fill = ntok
            else:
                fill += ntok
            k = (src, bin_id)
            if k not in want:
                want[k] = [0, 0]
            want[k][0] += 1
            want[k][1] += ntok
    assert got == {k: tuple(v) for k, v in want.items()}


def test_paragraph_dedup_first_wins_replay(spark):
    """Global first-wins span dedup: replay the 3-word-chunk hash
    dedup in Python (corpus order = doc_id, position) and compare
    counts and the md5 fingerprint of every reassembled doc."""
    got = {
        r["doc_id"]: (
            r["n_chunks"], r["n_kept"], r["kept_tokens"],
            r["kept_fingerprint"],
        )
        for r in QUERIES["docs_paragraph_dedup"](spark, SF_DIR).collect()
    }
    seen: set[str] = set()
    docs = sorted(_docs(spark), key=lambda d: d["doc_id"])
    n_dups = 0
    for d in docs:
        words = d["text"].split(" ")
        chunks = [
            " ".join(words[i : i + 3]) for i in range(0, len(words), 3)
        ]
        kept = []
        for c in chunks:
            if c in seen:
                n_dups += 1
            else:
                seen.add(c)
                kept.append(c)
        joined = " ".join(kept)
        fp = hashlib.md5(joined.encode()).hexdigest()
        assert got[d["doc_id"]] == (
            len(chunks), len(kept), sum(len(c.split(" ")) for c in kept), fp
        )
    assert n_dups > 0  # the corpus actually exercises the dedup path


def test_t_closeness_bounds_and_global_zero(spark):
    """t is a normalized EMD: every cohort's t_ppm lies in [0, 1e6],
    and pooling ALL cohorts (weighted by size) with the cohort-vs-
    global construction would give 0 — approximated here by checking
    the size-weighted signed cumulative differences cancel."""
    rows = QUERIES["privacy_t_closeness"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["t_ppm"] <= 1_000_000
        assert r["t_close"] == (r["t_ppm"] <= 200_000)
    assert sum(r["n"] for r in rows) == spark.read.parquet(
        f"{SF_DIR}/customer.parquet"
    ).count()


def test_link_prediction_predicts_only_nonedges(spark):
    rows = QUERIES["graph_link_prediction"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r["u"] < r["v"]
        assert r["cn"] >= 1
        assert 0 < r["jaccard_ppm"] <= 1_000_000


def test_fk_integrity_clean_schema_and_seeded_violation(spark):
    rows = {
        r["relation"]: r
        for r in QUERIES["profile_fk_integrity"](spark, SF_DIR).collect()
    }
    assert len(rows) == 8
    for rel, r in rows.items():
        if rel == "events.user_id->region":
            assert r["orphan_rows"] > 0 and r["orphan_keys"] > 0
        else:
            assert r["orphan_rows"] == 0 and r["orphan_keys"] == 0
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    assert rows["lineitem.l_orderkey->orders"]["child_rows"] == li


def test_binary_hamming_matches_python_popcount(spark):
    """Pack + XOR + popcount must equal a Python replay of the sign
    binarization on the raw float vectors."""
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }

    def sig(v):
        return sum(1 << i for i, x in enumerate(v) if x > 0.0)

    sigs = {k: sig(v) for k, v in emb.items()}
    rows = QUERIES["sim_binary_hamming_topk"](spark, SF_DIR).collect()
    by_q = defaultdict(list)
    for r in rows:
        assert 0 <= r["hamming"] <= 64
        by_q[r["q_id"]].append(r)
    assert set(by_q) == {q for q in sigs if q < 10}
    for q, got in by_q.items():
        assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == [
            1, 2, 3, 4, 5
        ]
        want = sorted(
            (bin(sigs[q] ^ s).count("1"), vid)
            for vid, s in sigs.items()
            if vid != q
        )[:5]
        got_pairs = sorted((r["hamming"], r["vec_id"]) for r in got)
        assert got_pairs == want


def test_mmr_rerank_matches_greedy_replay(spark):
    """The applyInPandas greedy pass must equal a Python replay of
    lambda=0.5 MMR over exact integer dot products."""
    emb = {
        r["vec_id"]: [round(float(x) * 1_000_000) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    rows = QUERIES["sim_mmr_rerank"](spark, SF_DIR).collect()
    by_q = defaultdict(dict)
    for r in rows:
        by_q[r["q_id"]][r["sel_rank"]] = (r["vec_id"], r["rel"], r["mmr"])
    for q, got in by_q.items():
        rel = {v: dot(emb[q], emb[v]) for v in emb if v != q}
        pool = sorted(rel, key=lambda v: (-rel[v], v))[:8]
        selected = []
        for _ in range(3):
            best = None
            for v in pool:
                if v in [s for s, _ in selected]:
                    continue
                score = rel[v] - max(
                    (dot(emb[v], emb[s]) for s, _ in selected), default=0
                ) if selected else rel[v]
                if best is None or (score, -v) > (best[1], -best[0]):
                    best = (v, score)
            selected.append(best)
        want = {
            i + 1: (v, rel[v], m) for i, (v, m) in enumerate(selected)
        }
        assert got == want


def test_ccnet_buckets_are_language_tertiles(spark):
    """Each language splits into three near-equal perplexity tertiles,
    head having the lowest scores; ranks are a permutation of 1..n."""
    rows = QUERIES["docs_ccnet_buckets"](spark, SF_DIR).collect()
    assert rows
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        assert sorted(r["ppl_rank"] for r in rs) == list(range(1, n + 1))
        ordered = sorted(rs, key=lambda r: (r["nll_micronats"], r["doc_id"]))
        assert [r["ppl_rank"] for r in ordered] == list(range(1, n + 1))
        sizes = defaultdict(int)
        for r in rs:
            sizes[r["bucket"]] += 1
        assert max(sizes.values()) - min(sizes.values()) <= 1
        max_head = max(
            r["nll_micronats"] for r in rs if r["bucket"] == "head"
        )
        min_tail = min(
            r["nll_micronats"] for r in rs if r["bucket"] == "tail"
        )
        assert max_head <= min_tail


def test_keep_best_keeps_longest_member(spark):
    rows = QUERIES["dedup_keep_best"](spark, SF_DIR).collect()
    assert rows
    docs = _docs(spark)
    chars = {
        d["doc_id"]: len(d["text"]) for d in docs
    }
    by_fp = defaultdict(list)
    for d in docs:
        fp = " ".join(d["text"].split(" ")[:3])
        by_fp[fp].append(d["doc_id"])
    multi = {fp: ids for fp, ids in by_fp.items() if len(ids) > 1}
    assert len(rows) == len(multi)
    for r in rows:
        assert r["n_members"] >= 2
        assert r["n_dropped"] == r["n_members"] - 1
        # kept doc must be at least as long as every cluster sibling
        sibs = next(
            ids for ids in multi.values() if r["kept_doc_id"] in ids
        )
        assert all(
            chars[r["kept_doc_id"]] >= chars[s] for s in sibs
        )


def test_random_walks_follow_edges_deterministically(spark):
    """Every step moves along a real edge, walks are 4 rows each, and
    a second run returns the identical paths (hash-derived, no RNG)."""
    out1 = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in QUERIES["graph_random_walks"](spark, SF_DIR).collect()
    )
    out2 = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in QUERIES["graph_random_walks"](spark, SF_DIR).collect()
    )
    assert out1 == out2 and out1
    by_walk = defaultdict(dict)
    for w, s, n in out1:
        by_walk[w][s] = n
    # rebuild the edge set the query walks over
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    from php_etl_spark.operators import graph as G

    edges = {
        (r["item_a"], r["item_b"])
        for r in G.cooccurrence_pairs(li, "l_orderkey", "l_partkey")
        .filter("n_cooc >= 2")
        .collect()
    }
    und = edges | {(b, a) for a, b in edges}
    for w, path in by_walk.items():
        assert path[0] == w
        assert set(path) == {0, 1, 2, 3}
        for s in (1, 2, 3):
            assert (path[s - 1], path[s]) in und


def test_clip_filter_matches_hashing_trick_replay(spark):
    """Signed-feature-hash text encoding dotted with the quantized
    image embedding must equal a Python replay."""
    emb = {
        r["vec_id"]: [round(float(x) * 1_000_000) for x in r["embedding"]]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    got = {
        r["doc_id"]: (r["clip_score"], r["kept"])
        for r in QUERIES["multimodal_clip_filter"](spark, SF_DIR).collect()
    }
    n_checked = 0
    for d in _docs(spark):
        if d["doc_id"] not in emb:
            continue
        tv = defaultdict(int)
        for t in d["text"].split(" "):
            h = hashlib.md5(t.encode()).hexdigest()
            dim = (ord(h[0]) * 31 + ord(h[2])) % 64
            tv[dim] += 1 if ord(h[4]) % 2 == 0 else -1
        score = sum(v * emb[d["doc_id"]][k] for k, v in tv.items())
        assert got[d["doc_id"]] == (score, score > 0)
        n_checked += 1
    assert n_checked == len(got) > 0
    # the gate actually separates: both classes present
    assert {k for _, k in got.values()} == {True, False}


def test_sssp_matches_hop_bounded_bellman_ford(spark):
    from php_etl_spark.operators import graph as G

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    w = {}
    for r in (
        G.cooccurrence_pairs(li, "l_orderkey", "l_partkey")
        .filter("n_cooc >= 2")
        .collect()
    ):
        c = 1_000_000 // r["n_cooc"]
        w[(r["item_a"], r["item_b"])] = c
        w[(r["item_b"], r["item_a"])] = c
    nodes = {u for u, _ in w}
    srcs = sorted(n for n in nodes if n % 97 == 0)
    want = {}
    for s in srcs:
        dist = {s: 0}
        for _ in range(3):
            nxt = dict(dist)
            for (u, v), c in w.items():
                if u in dist and dist[u] + c < nxt.get(v, 1 << 62):
                    nxt[v] = dist[u] + c
            dist = nxt
        for n, dv in dist.items():
            want[(s, n)] = dv
    got = {
        (r["src"], r["node"]): r["dist"]
        for r in QUERIES["graph_sssp_weighted"](spark, SF_DIR).collect()
    }
    assert got == want and got


def test_asof_forward_is_earliest_later_click(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    clicks = defaultdict(list)
    for r in ev:
        if r["event_type"] == "click":
            clicks[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    for v in clicks.values():
        v.sort()
    rows = QUERIES["join_asof_forward"](spark, SF_DIR).collect()
    purchases = [r for r in ev if r["event_type"] == "purchase"]
    assert len(rows) == len(purchases)
    got = {r["event_id"]: (r["next_click_id"], r["next_click_value"])
           for r in rows}
    n_matched = 0
    for p in purchases:
        later = [c for c in clicks.get(p["user_id"], []) if c[0] >= p["ts"]]
        want = (later[0][1], later[0][2]) if later else (None, None)
        assert got[p["event_id"]] == want
        n_matched += bool(later)
    assert 0 < n_matched  # the forward path actually matches


def test_fixed_width_roundtrip_exact(spark):
    sup = {
        r["s_suppkey"]: r
        for r in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    }
    rows = QUERIES["scan_fixed_width"](spark, SF_DIR).collect()
    assert len(rows) == len(sup)
    for r in rows:
        s = sup[r["s_suppkey"]]
        assert r["s_name"] == s["s_name"]
        assert r["s_nationkey"] == s["s_nationkey"]
        assert r["acctbal_cents"] == round(s["s_acctbal"] * 100)


def test_ridge_matches_fraction_solve(spark):
    """Exact-rational replay: build the same integer moments in
    Python, solve with fractions, compare micro-rounded betas."""
    from fractions import Fraction

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    obs = [
        (round(r["l_quantity"]), round(r["l_discount"] * 1000),
         round(r["l_extendedprice"] * 100))
        for r in li
    ]
    n = len(obs)
    sq = sum(q for q, _, _ in obs)
    sd = sum(d for _, d, _ in obs)
    sy = sum(y for _, _, y in obs)
    sqq = sum(q * q for q, _, _ in obs) + 1000
    sqd = sum(q * d for q, d, _ in obs)
    sdd = sum(d * d for _, d, _ in obs) + 1000
    sqy = sum(q * y for q, _, y in obs)
    sdy = sum(d * y for _, d, y in obs)
    a = [[n, sq, sd], [sq, sqq, sqd], [sd, sqd, sdd]]
    b = [sy, sqy, sdy]

    def det3(m):
        return (
            m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
        )

    det = det3(a)
    want = []
    for i in range(3):
        mi = [[b[r] if c == i else a[r][c] for c in range(3)]
              for r in range(3)]
        # mirror the engines: double division of the two exact dets
        want.append(round(1_000_000 * float(Fraction(det3(mi)) / det)))
    row = QUERIES["ml_ridge_closed_form"](spark, SF_DIR).collect()[0]
    assert row["n"] == n
    got = [row["beta0_micro"], row["beta1_micro"], row["beta2_micro"]]
    for g, w in zip(got, want):
        assert abs(g - w) <= 1  # float(Fraction) vs double/double: <=1 ulp at micro grain


def test_filter_funnel_is_conserving(spark):
    """Funnel arithmetic: stage s n_out = n_in - n_dropped, the next
    stage's n_in equals it, stage 1 starts at the corpus size, and
    the final n_out equals docs passing ALL gates."""
    rows = sorted(
        QUERIES["corpus_filter_funnel"](spark, SF_DIR).collect(),
        key=lambda r: r["stage_id"],
    )
    assert [r["stage"] for r in rows] == [
        "word_count", "mean_word_len", "alpha_fraction", "stopwords",
        "ppl_tail",
    ]
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert rows[0]["n_in"] == n_docs
    for prev, cur in zip(rows, rows[1:]):
        assert prev["n_out"] == prev["n_in"] - prev["n_dropped"]
        assert cur["n_in"] == prev["n_out"]
    gopher = {
        r["doc_id"]: r["keep"]
        for r in QUERIES["docs_gopher_rules"](spark, SF_DIR).collect()
    }
    tail = {
        r["doc_id"]
        for r in QUERIES["docs_ccnet_buckets"](spark, SF_DIR).collect()
        if r["bucket"] == "tail"
    }
    survivors = sum(
        1 for d, k in gopher.items() if k and d not in tail
    )
    assert rows[-1]["n_out"] == rows[-1]["n_in"] - rows[-1]["n_dropped"]
    assert rows[-1]["n_out"] == survivors


def test_hampel_matches_python_replay(spark):
    """Lower-median Hampel replay over per-user series."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    series = defaultdict(list)
    for r in ev:
        if r["value"] is not None:
            series[r["user_id"]].append(
                (r["ts"], r["event_id"], round(r["value"] * 100))
            )
    want = {}
    for uid, rows in series.items():
        rows.sort()
        vals = [v for _, _, v in rows]
        for i, (_, eid, v) in enumerate(rows):
            winv = sorted(vals[max(0, i - 3): i + 4])
            med = winv[(len(winv) + 1) // 2 - 1]
            devs = sorted(abs(x - med) for x in winv)
            mad = devs[(len(devs) + 1) // 2 - 1]
            want[eid] = (v, med, mad, abs(v - med) > 3 * mad)
    got = {
        r["event_id"]: (r["v"], r["med"], r["mad"], r["is_outlier"])
        for r in QUERIES["window_hampel_filter"](spark, SF_DIR).collect()
    }
    assert got == want and got
    assert any(o for _, _, _, o in got.values())  # flags something


def test_dp_topk_noise_bounded_and_deterministic(spark):
    r1 = QUERIES["privacy_dp_topk"](spark, SF_DIR).collect()
    r2 = QUERIES["privacy_dp_topk"](spark, SF_DIR).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    assert [r["rank"] for r in sorted(r1, key=lambda r: r["rank"])] == [
        1, 2, 3, 4, 5
    ]
    true_counts = defaultdict(int)
    for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect():
        true_counts[r["p_brand"]] += 1
    for r in r1:
        # Laplace(b=2) at |u|<=0.999999 bounds |noise| by 2*ln(1e6)
        assert abs(r["noisy_n"] - true_counts[r["p_brand"]]) <= 28


def test_explode_outer_keeps_empty_array_rows(spark):
    rows = QUERIES["fn_explode_outer"](spark, SF_DIR).collect()
    orders = [
        r["o_orderkey"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter("o_orderkey < 1000").collect()
    ]
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["o_orderkey"]].append(r["item"])
    assert set(by_key) == set(orders)  # no row lost
    for k in orders:
        if k % 3 == 0:
            assert by_key[k] == [None]
        else:
            assert sorted(by_key[k]) == list(range(1, k % 3 + 1))


def test_cohens_kappa_replay(spark):
    import hashlib as _h

    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    pairs = []
    for vid, a in labels.items():
        flip = ord(_h.md5(str(vid).encode()).hexdigest()[0]) % 10 < 2
        pairs.append((a, (a + 1) % 10 if flip else a))
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    na = defaultdict(int)
    nb = defaultdict(int)
    for a, b in pairs:
        na[a] += 1
        nb[b] += 1
    sum_ab = sum(na[k] * nb.get(k, 0) for k in na)
    want = 1_000_000 * (n * agree - sum_ab) // (n * n - sum_ab)
    row = QUERIES["ml_cohens_kappa"](spark, SF_DIR).collect()[0]
    assert (row["n"], row["agree"], row["sum_ab"]) == (n, agree, sum_ab)
    assert row["kappa_ppm"] == want
    assert 600_000 < row["kappa_ppm"] < 1_000_000  # 20% flips ~ 0.78


def test_csv_gzip_roundtrip_files_are_gz(spark):
    import glob as _g

    df = QUERIES["sink_csv_gzip_roundtrip"](spark, SF_DIR)
    rows = {(r["r_regionkey"], r["r_name"]) for r in df.collect()}
    want = {
        (r["r_regionkey"], r["r_name"])
        for r in spark.read.parquet(f"{SF_DIR}/region.parquet").collect()
    }
    assert rows == want
    path = df.inputFiles()[0]
    assert path.endswith(".gz")


def test_theil_sen_is_lower_median_of_pair_slopes(spark):
    rows = QUERIES["window_theil_sen"](spark, SF_DIR).collect()
    assert rows
    monthly = defaultdict(dict)
    orders = spark.sql(
        f"""
        SELECT n_name, year(o_orderdate) * 12 + month(o_orderdate) AS t,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev
        FROM parquet.`{SF_DIR}/orders.parquet` o
        JOIN parquet.`{SF_DIR}/customer.parquet` c ON o_custkey = c_custkey
        JOIN parquet.`{SF_DIR}/nation.parquet` n ON c_nationkey = n_nationkey
        GROUP BY 1, 2
        """
    ).collect()
    for r in orders:
        monthly[r["n_name"]][r["t"]] = r["rev"]
    got = {r["n_name"]: (r["n_pairs"], r["theil_sen_slope_milli"])
           for r in rows}
    for nat, series in monthly.items():
        ts = sorted(series)
        slopes = []
        for i, t1 in enumerate(ts):
            for t2 in ts[i + 1:]:
                d = (series[t2] - series[t1]) * 1000
                q = d // (t2 - t1)
                if d < 0 and d % (t2 - t1) != 0:
                    q += 1  # truncate toward zero, not floor
                slopes.append(q)
        slopes.sort()
        want = slopes[(len(slopes) + 1) // 2 - 1]
        assert got[nat] == (len(slopes), want)


def test_hard_negatives_are_cross_label_nearest(spark):
    emb = {}
    labels = {}
    for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect():
        emb[r["vec_id"]] = [round(float(x) * 1_000_000)
                            for x in r["embedding"]]
        labels[r["vec_id"]] = r["label"]
    rows = QUERIES["ml_hard_negatives"](spark, SF_DIR).collect()
    by_q = defaultdict(list)
    for r in rows:
        assert labels[r["q_id"]] != r["label"]  # only cross-label
        by_q[r["q_id"]].append(r)
    for q, got in by_q.items():
        want = sorted(
            (
                (-sum(a * b for a, b in zip(emb[q], emb[v])), v)
                for v in emb
                if v != q and labels[v] != labels[q]
            ),
        )[:3]
        got_pairs = sorted(
            (-r["dot"], r["vec_id"]) for r in got
        )
        assert got_pairs == want


def test_source_overlap_matrix_replay(spark):
    chunks_by_source = defaultdict(set)
    for d in _docs(spark):
        words = d["text"].split(" ")
        for i in range(0, len(words), 3):
            chunks_by_source[d["source"]].add(" ".join(words[i:i + 3]))
    df = defaultdict(int)
    for src, cs in chunks_by_source.items():
        for c in cs:
            df[c] += 1
    want = defaultdict(int)
    srcs = sorted(chunks_by_source)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            n = sum(
                1 for c in chunks_by_source[a] & chunks_by_source[b]
                if 2 <= df[c] <= 10
            )
            if n:
                want[(a, b)] = n
    got = {
        (r["source_a"], r["source_b"]): r["shared_spans"]
        for r in QUERIES["docs_source_overlap_matrix"](spark, SF_DIR)
        .collect()
    }
    assert got == dict(want) and got


def test_sliding_distinct_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    series = defaultdict(list)
    for r in ev:
        us = int(r["ts"].timestamp() * 1_000_000)
        series[r["user_id"]].append((us, r["event_id"], r["event_type"]))
    want = {}
    for uid, rows in series.items():
        rows.sort()
        for us, eid, _ in rows:
            types = {
                t for u2, _, t in rows if us - 3_600_000_000 <= u2 <= us
            }
            want[eid] = len(types)
    got = {
        r["event_id"]: r["distinct_types_1h"]
        for r in QUERIES["window_sliding_distinct"](spark, SF_DIR).collect()
    }
    assert got == want and got
    assert max(got.values()) > 1


def test_not_in_null_trap_semantics(spark):
    row = QUERIES["subquery_not_in_null_trap"](spark, SF_DIR).collect()[0]
    assert row["not_in_with_nulls"] == 0  # the trap
    assert row["not_in_null_filtered"] == row["not_exists_form"] > 0


def test_modularity_replay(spark):
    from php_etl_spark.operators import graph as G

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = [
        (r["item_a"], r["item_b"])
        for r in G.cooccurrence_pairs(li, "l_orderkey", "l_partkey")
        .filter("n_cooc >= 2").collect()
    ]
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    m = len(edges)
    e_in = sum(1 for u, v in edges if brand[u] == brand[v])
    d = defaultdict(int)
    for u, v in edges:
        d[brand[u]] += 1
        d[brand[v]] += 1
    sum_d2 = sum(x * x for x in d.values())
    num = 4_000_000 * e_in * m - 1_000_000 * sum_d2
    den = 4 * m * m
    want = num // den if num >= 0 else -((-num) // den)
    row = QUERIES["graph_modularity"](spark, SF_DIR).collect()[0]
    assert (row["m_edges"], row["e_in"]) == (m, e_in)
    assert row["modularity_ppm"] == want


def test_lang_confusion_rows_sum_to_million(spark):
    rows = QUERIES["text_lang_confusion"](spark, SF_DIR).collect()
    assert rows
    by_true = defaultdict(list)
    for r in rows:
        by_true[r["labeled_lang"]].append(r)
    pred = QUERIES["text_language_id"](spark, SF_DIR).collect()
    assert sum(r["n"] for r in rows) == len(pred)
    for lang, cells in by_true.items():
        total = sum(r["n"] for r in cells)
        # truncating ppm shares sum to <= 1e6 and within |cells| of it
        share = sum(r["row_frac_ppm"] for r in cells)
        assert 1_000_000 - len(cells) < share <= 1_000_000
        for r in cells:
            assert r["row_frac_ppm"] == 1_000_000 * r["n"] // total


def test_dynamic_overwrite_touches_only_target_partition(spark):
    rows = {
        r["event_type"]: (r["n"], r["cents"])
        for r in QUERIES["sink_dynamic_partition_overwrite"](
            spark, SF_DIR
        ).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").filter(
        "value IS NOT NULL"
    ).collect()
    want = defaultdict(lambda: [0, 0])
    for r in ev:
        mult = 2 if r["event_type"] == "purchase" else 1
        want[r["event_type"]][0] += 1
        want[r["event_type"]][1] += round(r["value"] * mult * 100)
    assert rows == {k: tuple(v) for k, v in want.items()}
    assert "purchase" in rows and len(rows) > 1


def test_dominant_period_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    hours = defaultdict(lambda: defaultdict(int))
    for r in ev:
        h = int(
            r["ts"].replace(minute=0, second=0, microsecond=0).timestamp()
            // 3600
        )
        hours[r["event_type"]][h] += 1
    h0 = min(min(d) for d in hours.values())
    h1 = max(max(d) for d in hours.values())
    got = {
        r["event_type"]: (r["best_lag"], r["r_ppm"])
        for r in QUERIES["ts_dominant_period"](spark, SF_DIR).collect()
    }
    for etype, d in hours.items():
        xs = [d.get(h, 0) for h in range(h0, h1 + 1)]
        n = len(xs)
        s = sum(xs)
        den = sum((n * x - s) ** 2 for x in xs)
        best = None
        for lag in range(4, 25):
            num = sum(
                (n * xs[t] - s) * (n * xs[t - lag] - s)
                for t in range(lag, n)
            )
            r_ppm = (
                1_000_000 * num // den if num >= 0
                else -((-1_000_000 * num) // den)
            )
            if best is None or (r_ppm, -lag) > (best[1], -best[0]):
                best = (lag, r_ppm)
        assert got[etype] == best


def test_boilerplate_removal_deletes_all_copies(spark):
    chunks_per_doc = {}
    df = defaultdict(set)
    for d in _docs(spark):
        words = d["text"].split(" ")
        cs = [" ".join(words[i:i + 3]) for i in range(0, len(words), 3)]
        chunks_per_doc[d["doc_id"]] = cs
        for c in cs:
            df[c].add(d["doc_id"])
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_fingerprint"])
        for r in QUERIES["docs_boilerplate_removal"](spark, SF_DIR)
        .collect()
    }
    n_removed_total = 0
    for doc, cs in chunks_per_doc.items():
        kept = [c for c in cs if len(df[c]) < 5]
        n_removed_total += len(cs) - len(kept)
        fp = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert got[doc] == (len(cs), len(kept), fp)
    assert n_removed_total > 0  # corpus actually has boilerplate spans


def test_ab_srm_replay(spark):
    import hashlib as _h

    users = {
        r["user_id"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id").distinct().collect()
    }
    counts = defaultdict(int)
    for u in users:
        h = _h.md5(f"exp1#{u}".encode()).hexdigest()
        counts["control" if ord(h[0]) % 2 == 0 else "treatment"] += 1
    big_n = sum(counts.values())
    rows = {r["variant"]: r for r in
            QUERIES["event_ab_srm_check"](spark, SF_DIR).collect()}
    assert set(rows) == set(counts)
    for v, r in rows.items():
        n = counts[v]
        chi2 = 1_000_000 * (2 * n - big_n) ** 2 // (2 * big_n)
        assert (r["n"], r["chi2_ppm"], r["srm_flag"]) == (
            n, chi2, chi2 > 3_841_459
        )


def test_nested_roundtrip_preserves_every_item(spark):
    df = QUERIES["scan_nested_struct_roundtrip"](spark, SF_DIR)
    got = {
        (r["o_orderkey"], r["l_linenumber"]):
        (r["o_orderstatus"], r["l_partkey"], r["price_cents"])
        for r in df.collect()
    }
    orders = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
        if r["o_orderkey"] % 20 == 0
    }
    n = 0
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        if r["l_orderkey"] % 20 != 0:
            continue
        key = (r["l_orderkey"], r["l_linenumber"])
        # synthetic lineitem can reuse (orderkey, linenumber); the
        # roundtrip keeps every copy — compare against ANY matching
        assert key in got
        n += 1
    assert len(got) > 0 and n >= len(got)
    for (ok, _), (status, _, _) in got.items():
        assert status == orders[ok]


def test_luhn_matches_python_reference(spark):
    def luhn_ok(s):
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    rows = QUERIES["fn_luhn_check"](spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["luhn_valid"] == luhn_ok(r["candidate"])
        seen.add(r["luhn_valid"])
    assert seen == {True, False}  # both outcomes exercised


def test_late_arriving_inferred_members(spark):
    rows = QUERIES["dim_late_arriving_inferred"](spark, SF_DIR).collect()
    inferred = [r for r in rows if r["member_status"] == "inferred"]
    matched = [r for r in rows if r["member_status"] == "matched"]
    assert inferred and matched
    for r in inferred:
        assert r["custkey"] % 11 == 0
        assert r["mktsegment"] == "UNKNOWN"
    for r in matched:
        assert r["custkey"] % 11 != 0
        assert r["mktsegment"] != "UNKNOWN"
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    assert sum(r["n_facts"] for r in rows) == len(orders)
    assert sum(r["cents"] for r in rows) == sum(
        round(o["o_totalprice"] * 100) for o in orders
    )


def test_csv_multiline_preserves_embedded_newlines(spark):
    rows = QUERIES["scan_csv_multiline"](spark, SF_DIR).collect()
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    assert len(rows) == len(nation)  # no record splitting
    for r in rows:
        assert "\nline2, with comma" in r["note"]


def test_pattern_matches_state_machine_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    series = defaultdict(list)
    for r in ev:
        us = int(r["ts"].timestamp() * 1_000_000)
        series[r["user_id"]].append((us, r["event_id"], r["event_type"]))
    got = {
        r["user_id"]: (r["n_purchases"], r["n_clean_conversions"])
        for r in QUERIES["event_pattern_no_interruption"](
            spark, SF_DIR
        ).collect()
    }
    for uid, rows in series.items():
        rows.sort()
        last_click = last_error = None
        n_p = n_clean = 0
        for us, _, et in rows:
            if et == "purchase":
                n_p += 1
                if last_click is not None and (
                    last_error is None or last_error < last_click
                ):
                    n_clean += 1
            if et == "click":
                last_click = us
            elif et == "error":
                last_error = us
        if n_p:
            assert got[uid] == (n_p, n_clean)
    assert any(c < p for p, c in got.values())  # interruptions happen
    assert any(c > 0 for _, c in got.values())


def test_disparate_impact_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    stats = defaultdict(lambda: [0, 0])
    for r in ev:
        g = "group_a" if r["user_id"] % 3 == 0 else "group_b"
        stats[g][0] += 1
        stats[g][1] += r["event_type"] == "purchase"
    an, apos = stats["group_a"]
    bn, bpos = stats["group_b"]
    di = 1_000_000 * apos * bn // (bpos * an)
    rows = {r["grp"]: r for r in
            QUERIES["ml_disparate_impact"](spark, SF_DIR).collect()}
    for g, (n, npos) in stats.items():
        r = rows[g]
        assert (r["n"], r["n_pos"]) == (n, npos)
        assert r["rate_ppm"] == 1_000_000 * npos // n
        assert r["di_ratio_ppm"] == di
        assert r["passes_four_fifths"] == (800_000 <= di <= 1_250_000)


def test_assortativity_bounds_and_replay(spark):
    import math

    from php_etl_spark.operators import graph as G

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    edges = [
        (r["item_a"], r["item_b"])
        for r in G.cooccurrence_pairs(li, "l_orderkey", "l_partkey")
        .filter("n_cooc >= 2").collect()
    ]
    d = defaultdict(int)
    for u, v in edges:
        d[u] += 1
        d[v] += 1
    xs, ys = [], []
    for u, v in edges:
        xs += [d[u], d[v]]
        ys += [d[v], d[u]]
    mm = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    want = round(
        1_000_000.0 * (mm * sxy - sx * sy)
        / (math.sqrt(float(mm * sxx - sx * sx))
           * math.sqrt(float(mm * syy - sy * sy)))
    )
    row = QUERIES["graph_assortativity"](spark, SF_DIR).collect()[0]
    assert row["n_endpoints"] == mm
    assert abs(row["assortativity_ppm"] - want) <= 1
    assert -1_000_000 <= row["assortativity_ppm"] <= 1_000_000


def test_reaggregation_is_lossless(spark):
    """Two-level (daily -> monthly) totals must equal direct monthly
    aggregation of the facts, including the exact distinct count."""
    rows = QUERIES["agg_reaggregate_from_cube"](spark, SF_DIR).collect()
    assert rows
    direct = spark.sql(
        f"""
        SELECT n_name, year(o_orderdate) * 100 + month(o_orderdate) AS ym,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents,
               count(DISTINCT o_custkey) AS nc
        FROM parquet.`{SF_DIR}/orders.parquet` o
        JOIN parquet.`{SF_DIR}/customer.parquet` c ON o_custkey = c_custkey
        JOIN parquet.`{SF_DIR}/nation.parquet` n ON c_nationkey = n_nationkey
        GROUP BY 1, 2
        """
    ).collect()
    want = {
        (r["n_name"], r["ym"]): (r["n_orders"], r["cents"], r["nc"])
        for r in direct
    }
    got = {
        (r["n_name"], r["ym"]):
        (r["n_orders"], r["cents"], r["n_custs_lower_bound"])
        for r in rows
    }
    assert got == want


def test_threshold_cost_is_global_minimum(spark):
    import hashlib as _h

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    pairs = []
    for r in li:
        noise = int(
            _h.md5(f"{r['l_orderkey']}:{r['l_linenumber']}".encode())
            .hexdigest()[:4], 16
        ) % 10
        score = round(r["l_discount"] * 100) * 10 + noise
        pairs.append((score, 1 if r["l_returnflag"] == "R" else 0))
    p = sum(y for _, y in pairs)
    neg = len(pairs) - p
    scores = sorted({s for s, _ in pairs}, reverse=True)
    best = None
    tp = fp = 0
    by_score = defaultdict(lambda: [0, 0])
    for s, y in pairs:
        by_score[s][0] += 1
        by_score[s][1] += y
    candidates = [(None, 0, 0)]
    for s in scores:
        tp += by_score[s][1]
        fp += by_score[s][0] - by_score[s][1]
        candidates.append((s, tp, fp))
    for thr, tp_, fp_ in candidates:
        cost = fp_ + (p - tp_) * 5
        key = (cost, thr if thr is not None else 1 << 62)
        if best is None or key < best[0]:
            best = (key, thr, tp_, fp_)
    row = QUERIES["ml_threshold_cost_optimal"](spark, SF_DIR).collect()[0]
    assert row["best_threshold"] == best[1]
    assert (row["tp"], row["fp"]) == (best[2], best[3])
    assert row["fn"] == p - best[2] and row["tn"] == neg - best[3]
    assert row["cost_units"] == best[0][0]


def test_generalize_to_k_picks_minimal_level(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    nat = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    def cohorts(level):
        c = defaultdict(int)
        for r in cust:
            if level == 0:
                qi = f"{r['c_nationkey']}|{r['c_mktsegment']}"
            elif level == 1:
                qi = f"r{nat[r['c_nationkey']]}|{r['c_mktsegment']}"
            elif level == 2:
                qi = r["c_mktsegment"]
            else:
                qi = "*"
            c[qi] += 1
        return c
    want = None
    for lvl in range(4):
        c = cohorts(lvl)
        if min(c.values()) >= 10:
            want = (lvl, len(c), min(c.values()), True)
            break
    if want is None:
        c = cohorts(0)
        want = (0, len(c), min(c.values()), False)
    row = QUERIES["privacy_generalize_to_k"](spark, SF_DIR).collect()[0]
    assert (
        row["chosen_level"], row["n_cohorts"], row["min_cohort"],
        row["k_satisfied"],
    ) == want
    assert row["chosen_level"] > 0  # L0 cohorts are below k in testdata


def test_safety_lexicon_replay(spark):
    lex = {"error", "slow", "crash"}
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_flagged"], r["flagged_ppm"],
                      r["needs_review"])
        for r in QUERIES["docs_safety_lexicon"](spark, SF_DIR).collect()
    }
    routed = 0
    for d in _docs(spark):
        toks = [t for t in d["text"].lower().split(" ") if t]
        flagged = sum(1 for t in toks if t in lex)
        ppm = 1_000_000 * flagged // len(toks)
        assert got[d["doc_id"]] == (
            len(toks), flagged, ppm, ppm > 20_000
        )
        routed += ppm > 20_000
    assert 0 < routed < len(got)  # threshold separates the corpus


def test_map_at_k_matches_fraction_replay(spark):
    from fractions import Fraction

    emb = {}
    labels = {}
    for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect():
        emb[r["vec_id"]] = [round(float(x) * 1_000_000)
                            for x in r["embedding"]]
        labels[r["vec_id"]] = r["label"]
    got = {
        r["q_id"]: (r["n_rel"], r["ap_at5_ppm"])
        for r in QUERIES["ml_map_at_k"](spark, SF_DIR).collect()
    }
    for q in [v for v in emb if v < 10]:
        ranked = sorted(
            (v for v in emb if v != q),
            key=lambda v: (-sum(a * b for a, b in zip(emb[q], emb[v])), v),
        )[:5]
        ap = Fraction(0)
        cum = 0
        for i, v in enumerate(ranked, 1):
            if labels[v] == labels[q]:
                cum += 1
                ap += Fraction(cum, i)
        n_rel = cum
        want = (
            0 if n_rel == 0
            else int(1_000_000 * ap / n_rel)  # floor of the exact rational
        )
        assert got[q] == (n_rel, want)


def test_accumulating_snapshot_milestones(spark):
    li = defaultdict(list)
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        if r["l_orderkey"] % 10 == 0:
            li[r["l_orderkey"]].append(r["l_shipdate"])
    rows = QUERIES["dim_accumulating_snapshot"](spark, SF_DIR).collect()
    assert len(rows) == len(li)
    for r in rows:
        ships = li[r["o_orderkey"]]
        assert r["first_ship"] == min(ships)
        assert r["last_ship"] == max(ships)
        assert r["n_lines"] == len(ships)
        assert r["days_to_complete"] == (
            max(ships) - r["o_orderdate"]
        ).days
        assert r["shipped_within_month_span"] == (
            (max(ships) - min(ships)).days <= 30
        )


def test_mini_dimension_profiles_are_domain_bounded(spark):
    rows = QUERIES["dim_mini_dimension"](spark, SF_DIR).collect()
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    def band(b):
        return ("neg" if b < 0 else "low" if b < 2500
                else "mid" if b < 5000 else "high")
    want = defaultdict(int)
    for r in cust:
        want[(r["c_mktsegment"], band(r["c_acctbal"]))] += 1
    assert len(rows) == len(want)
    ids = sorted(r["mini_dim_id"] for r in rows)
    assert ids == list(range(1, len(rows) + 1))  # dense surrogate keys
    ordered = sorted(rows, key=lambda r: (r["c_mktsegment"],
                                          r["balance_band"]))
    assert [r["mini_dim_id"] for r in ordered] == ids
    for r in rows:
        assert r["n_customers"] == want[
            (r["c_mktsegment"], r["balance_band"])
        ]


def test_business_days_matches_numpy_busday(spark):
    import numpy as np

    import datetime as _dt

    def _day(d):
        return d.date() if isinstance(d, _dt.datetime) else d

    orders = {
        r["o_orderkey"]: (_day(r["o_orderdate"]), r["o_orderpriority"])
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    stats = defaultdict(lambda: [0, 0, 0])
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        od, prio = orders[r["l_orderkey"]]
        ship = _day(r["l_shipdate"])
        if ship >= od:
            # weekdays in (od, ship] == np.busday_count over
            # [od+1, ship+1) with default Mon-Fri week
            bd = int(np.busday_count(od + _dt.timedelta(1),
                                     ship + _dt.timedelta(1)))
        else:
            # negative span: numpy's reversed-range convention is
            # off-by-one vs signed set counting; day-loop the exact
            # definition -(weekdays in (ship, od])
            bd = -sum(
                1
                for k in range(1, (od - ship).days + 1)
                if (ship + _dt.timedelta(k)).weekday() < 5
            )
        stats[prio][0] += 1
        stats[prio][1] += bd
        stats[prio][2] += bd <= 5
    rows = {r["o_orderpriority"]: r for r in
            QUERIES["fn_business_days"](spark, SF_DIR).collect()}
    assert set(rows) == set(stats)
    for prio, (n, tot, within) in stats.items():
        r = rows[prio]
        assert (r["n_lines"], r["total_busdays"]) == (n, tot)
        assert r["within_5bd_ppm"] == 1_000_000 * within // n


def test_diff_in_diff_fraction_replay(spark):
    import hashlib as _h
    from fractions import Fraction
    import datetime as _dt

    cells = defaultdict(lambda: [0, 0])
    cutoff = _dt.datetime(2024, 1, 16)
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        if r["value"] is None:
            continue
        t = ord(_h.md5(f"did#{r['user_id']}".encode()).hexdigest()[0]) % 2 == 0
        p = r["ts"] >= cutoff
        c = cells[(int(t), int(p))]
        c[0] += 1
        c[1] += round(r["value"] * 100)
    did = (
        Fraction(cells[(1, 1)][1], cells[(1, 1)][0])
        - Fraction(cells[(1, 0)][1], cells[(1, 0)][0])
        - Fraction(cells[(0, 1)][1], cells[(0, 1)][0])
        + Fraction(cells[(0, 0)][1], cells[(0, 0)][0])
    )
    row = QUERIES["agg_diff_in_diff"](spark, SF_DIR).collect()[0]
    assert (row["n_tp"], row["n_tb"], row["n_cp"], row["n_cb"]) == (
        cells[(1, 1)][0], cells[(1, 0)][0],
        cells[(0, 1)][0], cells[(0, 0)][0],
    )
    assert abs(row["did_milli_cents"] - round(float(1000 * did))) <= 1


def test_shard_manifest_detects_mutation(spark):
    """The checksum must be order-insensitive yet move on any row
    change: recompute from raw rows and verify a simulated mutation
    shifts it."""
    import hashlib as _h

    rows = {r["shard"]: r for r in
            QUERIES["docs_shard_manifest"](spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    ).collect()

    def hb(x):
        h = _h.md5(str(x).encode()).hexdigest()
        return (ord(h[0]) * 17161 + ord(h[2]) * 131 + ord(h[4])) % 8

    want = defaultdict(lambda: [0, 0, None, None, 0])
    for d in docs:
        s = hb(d["doc_id"])
        sig = int(
            _h.md5(f"{d['doc_id']}#{d['n_chars']}".encode())
            .hexdigest()[:12], 16
        )
        w = want[s]
        w[0] += 1
        w[1] += d["n_chars"]
        w[2] = d["doc_id"] if w[2] is None else min(w[2], d["doc_id"])
        w[3] = d["doc_id"] if w[3] is None else max(w[3], d["doc_id"])
        w[4] += sig
    assert set(rows) == set(want)
    for s, w in want.items():
        r = rows[s]
        assert (
            r["n_docs"], r["total_chars"], r["min_doc_id"],
            r["max_doc_id"], r["content_checksum"],
        ) == tuple(w)
        # a 1-char mutation in any member changes the checksum
        d0 = next(d for d in docs if hb(d["doc_id"]) == s)
        mut = int(
            _h.md5(f"{d0['doc_id']}#{d0['n_chars'] + 1}".encode())
            .hexdigest()[:12], 16
        )
        assert w[4] - int(
            _h.md5(f"{d0['doc_id']}#{d0['n_chars']}".encode())
            .hexdigest()[:12], 16
        ) + mut != w[4]


def test_cuped_theta_fraction_replay(spark):
    import hashlib as _h
    import datetime as _dt

    cutoff = _dt.datetime(2024, 1, 16)
    per_user = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        if r["value"] is None:
            continue
        v = "treatment" if ord(
            _h.md5(f"did#{r['user_id']}".encode()).hexdigest()[0]
        ) % 2 == 0 else "control"
        u = per_user[(v, r["user_id"])]
        u[r["ts"] >= cutoff] += round(r["value"] * 100)
    by_variant = defaultdict(list)
    for (v, _), (pre, post) in per_user.items():
        by_variant[v].append((pre, post))
    rows = {r["variant"]: r for r in
            QUERIES["agg_cuped_theta"](spark, SF_DIR).collect()}
    for v, pairs in by_variant.items():
        n = len(pairs)
        sx = sum(p for p, _ in pairs)
        sy = sum(q for _, q in pairs)
        sxy = sum(p * q for p, q in pairs)
        sxx = sum(p * p for p, _ in pairs)
        num = 1_000_000 * (n * sxy - sx * sy)
        den = n * sxx - sx * sx
        # both engines truncate toward zero
        want = abs(num) // abs(den) * (
            1 if (num >= 0) == (den >= 0) else -1
        )
        r = rows[v]
        assert (r["n_users"], r["sum_pre"], r["sum_post"]) == (n, sx, sy)
        assert r["theta_ppm"] == want
        assert 0 < r["theta_ppm"] < 2_000_000 or r["theta_ppm"] <= 0


def test_grouping_id_bit_order(spark):
    rows = QUERIES["sql_grouping_id"](spark, SF_DIR).collect()
    by_gid = defaultdict(list)
    for r in rows:
        by_gid[r["gid"]].append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    # gid bit semantics: high bit = first cube column rolled up
    for r in by_gid[3]:
        assert r["l_returnflag"] is None and r["l_linestatus"] is None
    for r in by_gid[2]:
        assert r["l_returnflag"] is None and r["l_linestatus"] is not None
    for r in by_gid[1]:
        assert r["l_returnflag"] is not None and r["l_linestatus"] is None
    total = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    assert sum(r["n"] for r in by_gid[0]) == total
    assert by_gid[3][0]["n"] == total


def test_minmax_scale_bounds_and_replay(spark):
    ev = [r for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
          .collect() if r["value"] is not None]
    lo = defaultdict(lambda: 1 << 62)
    hi = defaultdict(lambda: -(1 << 62))
    for r in ev:
        v = round(r["value"] * 100)
        lo[r["event_type"]] = min(lo[r["event_type"]], v)
        hi[r["event_type"]] = max(hi[r["event_type"]], v)
    got = {
        r["event_id"]: (r["event_type"], r["v"], r["scaled_ppm"])
        for r in QUERIES["ml_minmax_scale"](spark, SF_DIR).collect()
    }
    assert len(got) == len(ev)
    seen_0 = seen_1m = False
    for r in ev:
        et = r["event_type"]
        v = round(r["value"] * 100)
        span = hi[et] - lo[et]
        want = 0 if span == 0 else 1_000_000 * (v - lo[et]) // span
        assert got[r["event_id"]] == (et, v, want)
        assert 0 <= want <= 1_000_000
        seen_0 |= want == 0
        seen_1m |= want == 1_000_000
    assert seen_0 and seen_1m  # endpoints map to the boundary values


def test_rolling_corr_replay(spark):
    import math

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    hours = defaultdict(lambda: [0, 0])
    for r in ev:
        h = int(
            r["ts"].replace(minute=0, second=0, microsecond=0).timestamp()
            // 3600
        )
        if r["event_type"] == "view":
            hours[h][0] += 1
        elif r["event_type"] == "purchase":
            hours[h][1] += 1
    h0, h1 = min(hours), max(hours)
    xs = [hours.get(h, [0, 0])[0] for h in range(h0, h1 + 1)]
    ys = [hours.get(h, [0, 0])[1] for h in range(h0, h1 + 1)]
    got = {
        r["h"]: (r["n"], r["corr_ppm"])
        for r in QUERIES["window_rolling_corr"](spark, SF_DIR).collect()
    }
    assert len(got) == h1 - h0 + 1
    for i, h in enumerate(range(h0, h1 + 1)):
        lo = max(0, i - 23)
        wx, wy = xs[lo:i + 1], ys[lo:i + 1]
        n = len(wx)
        sx, sy = sum(wx), sum(wy)
        sxy = sum(a * b for a, b in zip(wx, wy))
        vx = n * sum(a * a for a in wx) - sx * sx
        vy = n * sum(b * b for b in wy) - sy * sy
        if vx == 0 or vy == 0:
            want = None
        else:
            want = round(
                1_000_000.0 * (n * sxy - sx * sy)
                / (math.sqrt(vx) * math.sqrt(vy))
            )
        gn, gc = got[h]
        assert gn == n
        if want is None:
            assert gc is None
        else:
            assert abs(gc - want) <= 1


def test_recursive_glob_ignores_sidecars(spark):
    rows = {r["o_orderpriority"]: (r["n"], r["key_sum"])
            for r in QUERIES["scan_recursive_glob"](spark, SF_DIR)
            .collect()}
    want = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect():
        if r["o_orderkey"] % 2 == 0:
            want[r["o_orderpriority"]][0] += 1
            want[r["o_orderpriority"]][1] += r["o_orderkey"]
    assert rows == {k: tuple(v) for k, v in want.items()}


def test_reciprocity_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    series = defaultdict(list)
    for r in ev:
        series[r["user_id"]].append((r["ts"], r["event_id"],
                                     r["event_type"]))
    edges = set()
    for rows in series.values():
        rows.sort()
        for (a, b) in zip(rows, rows[1:]):
            if a[2] != b[2]:
                edges.add((a[2], b[2]))
    recip = sum(1 for s, d in edges if (d, s) in edges)
    row = QUERIES["graph_reciprocity"](spark, SF_DIR).collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["n_reciprocated"] == recip
    assert row["reciprocity_ppm"] == 1_000_000 * recip // len(edges)


def test_decimal_roundtrip_is_lossless(spark):
    rows = {r["o_orderpriority"]: (r["n"], r["cents"])
            for r in QUERIES["sink_decimal_roundtrip"](spark, SF_DIR)
            .collect()}
    want = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect():
        want[r["o_orderpriority"]][0] += 1
        want[r["o_orderpriority"]][1] += round(r["o_totalprice"] * 100)
    assert rows == {k: tuple(v) for k, v in want.items()}


def test_scene_cuts_replay(spark):
    got = {
        r["doc_id"]: (r["n_frames"], r["n_cuts"])
        for r in QUERIES["multimodal_scene_cuts"](spark, SF_DIR).collect()
    }
    n_with_cuts = 0
    checked = 0
    for d in _docs(spark):
        text = d["text"]
        if len(text) > 300:
            continue
        sigs = []
        for i in range(0, (max(len(text) - 1, 0)) // 256 + 1):
            sl = text[i * 256: i * 256 + 64]
            sigs.append(ord(hashlib.md5(sl.encode()).hexdigest()[0]) % 16)
        cuts = sum(
            1 for a, b in zip(sigs, sigs[1:]) if abs(b - a) >= 6
        )
        assert got[d["doc_id"]] == (len(sigs), cuts)
        n_with_cuts += cuts > 0
        checked += 1
    assert checked == len(got) > 0
    assert n_with_cuts > 0


def test_json_corrupt_modes_differ_by_corrupt_count(spark):
    rows = {r["mode"]: r for r in
            QUERIES["scan_json_corrupt_modes"](spark, SF_DIR).collect()}
    n_nation = spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    p = rows["permissive"]
    d = rows["dropmalformed"]
    assert p["n_corrupt"] == 5
    assert p["n_rows"] == n_nation + 5  # quarantined, not lost
    assert d["n_rows"] == n_nation      # silently dropped
    assert p["n_rows"] - d["n_rows"] == p["n_corrupt"]


def test_growth_accounting_identities(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    active = defaultdict(set)
    for r in ev:
        wk = int(r["ts"].timestamp() * 1_000_000) // 604_800_000_000
        active[wk].add(r["user_id"])
    weeks = sorted(active)
    rows = {r["wk"]: r for r in
            QUERIES["event_growth_accounting"](spark, SF_DIR).collect()}
    assert set(rows) == set(weeks)
    seen = set()
    for i, wk in enumerate(weeks):
        cur = active[wk]
        prev = active.get(wk - 1, set())
        new = cur - seen
        retained = cur & prev
        resurrected = cur - new - retained
        churned = prev - cur
        r = rows[wk]
        assert (r["n_new"], r["n_retained"], r["n_resurrected"]) == (
            len(new), len(retained), len(resurrected)
        )
        if i > 0:
            assert r["n_churned"] == len(churned)
            # the self-auditing identity
            assert len(prev) == r["n_retained"] + r["n_churned"]
        seen |= cur


def test_scalar_iter_udf_exact(spark):
    rows = QUERIES["udf_pandas_scalar_iter"](spark, SF_DIR).collect()
    orders = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
        if r["o_orderkey"] < 5000
    }
    assert len(rows) == len(orders)
    for r in rows:
        assert r["scored_cents"] == round(
            orders[r["o_orderkey"]] * 100
        ) + 7


def test_powerlaw_fit_replay(spark):
    import math

    from php_etl_spark.operators import graph as G

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    d = defaultdict(int)
    for r in (G.cooccurrence_pairs(li, "l_orderkey", "l_partkey")
              .filter("n_cooc >= 2").collect()):
        d[r["item_a"]] += 1
        d[r["item_b"]] += 1
    dist = defaultdict(int)
    for v in d.values():
        dist[v] += 1
    pts = [
        (math.floor(math.log(k) * 1_000_000),
         math.floor(math.log(c) * 1_000_000))
        for k, c in dist.items()
    ]
    n = len(pts)
    sx = float(sum(x for x, _ in pts))
    sy = float(sum(y for _, y in pts))
    sxx = float(sum(x * x for x, _ in pts))
    sxy = float(sum(x * y for x, y in pts))
    want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = QUERIES["graph_powerlaw_fit"](spark, SF_DIR).collect()[0]
    assert row["n"] == n
    assert abs(row["powerlaw_slope"] - want) < 1e-9
    # sign is data-dependent at tiny scales (sf0.001's co-purchase
    # graph has too few distinct degrees to be heavy-tailed); the
    # exact replay above is the real check
    assert abs(row["powerlaw_slope"]) < 10


def test_pretrain_build_composes_its_stages(spark):
    """The composite's bins must pack exactly the gopher-AND-safety
    survivors, bins full except the tail."""
    keep = {
        r["doc_id"] for r in
        QUERIES["docs_gopher_rules"](spark, SF_DIR).collect() if r["keep"]
    }
    safe = {
        r["doc_id"] for r in
        QUERIES["docs_safety_lexicon"](spark, SF_DIR).collect()
        if not r["needs_review"]
    }
    survivors = keep & safe
    total = sum(
        len(d["text"].split(" ")) for d in _docs(spark)
        if d["doc_id"] in survivors
    )
    rows = {r["bin_id"]: r for r in
            QUERIES["corpus_pretrain_build"](spark, SF_DIR).collect()}
    n_bins = (total + 511) // 512
    assert set(rows) == set(range(n_bins))
    assert 0 < len(survivors) < len(_docs(spark))  # gates actually gate
    for b, r in rows.items():
        want = 512 if b < n_bins - 1 else total - (n_bins - 1) * 512
        assert r["fill_tokens"] == want
