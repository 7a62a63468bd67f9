"""Round-5 fourth batch: rank correlations (Spearman/Kendall at the
fixed nation grain), Wald SPRT sequential testing, Brier proper
scoring — differential replays against straight-line Python."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from php_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR


def _nation_series(spark):
    """(avg supplier balance key, order volume) per nation as exact
    integers: (bal_cents, n_sup, n_orders)."""
    sup = defaultdict(lambda: [0, 0])
    for r in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect():
        s = sup[r["s_nationkey"]]
        s[0] += round(r["s_acctbal"] * 100)
        s[1] += 1
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    vol = defaultdict(int)
    for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect():
        vol[cust[r["o_custkey"]]] += 1
    return {
        nk: (sup[nk][0], sup[nk][1], vol[nk])
        for nk in sup
        if nk in vol
    }


def _avg_ranks_doubled(keyed):
    """keyed: list of (sort_key, id). Returns id -> 2*average rank."""
    keyed.sort()
    out = {}
    i = 0
    while i < len(keyed):
        j = i
        while j < len(keyed) and keyed[j][0] == keyed[i][0]:
            j += 1
        # ranks i+1 .. j (1-based); doubled average = (i+1) + j
        for k in range(i, j):
            out[keyed[k][1]] = (i + 1) + j
        i = j
    return out


def test_spearman_matches_python_replay(spark):
    series = _nation_series(spark)
    rx = _avg_ranks_doubled(
        [(s[0] / s[1], nk) for nk, s in series.items()]
    )
    ry = _avg_ranks_doubled([(s[2], nk) for nk, s in series.items()])
    n = len(series)
    sx = sum(rx.values())
    sy = sum(ry.values())
    sxx = sum(v * v for v in rx.values())
    syy = sum(v * v for v in ry.values())
    sxy = sum(rx[nk] * ry[nk] for nk in series)
    num = n * sxy - sx * sy
    want = round(
        1e6 * num / math.sqrt(float(n * sxx - sx * sx)
                              * float(n * syy - sy * sy))
    )
    row = QUERIES["agg_spearman_rho"](spark, SF_DIR).collect()[0]
    assert row["n"] == n
    assert row["rho_ppm"] == want
    assert -1_000_000 <= row["rho_ppm"] <= 1_000_000


def test_kendall_matches_python_replay(spark):
    series = _nation_series(spark)
    nks = sorted(series)
    c = d = ntx = nty = n0 = 0
    for i in range(len(nks)):
        for j in range(i + 1, len(nks)):
            (bqa, bda, ya) = series[nks[i]]
            (bqb, bdb, yb) = series[nks[j]]
            n0 += 1
            tiex = bqa * bdb == bqb * bda
            tiey = ya == yb
            if tiex:
                ntx += 1
            if tiey:
                nty += 1
            if tiex or tiey:
                continue
            if (bqa * bdb < bqb * bda) == (ya < yb):
                c += 1
            else:
                d += 1
    want = round(1e6 * (c - d) / math.sqrt(float(n0 - ntx) * float(n0 - nty)))
    row = QUERIES["agg_kendall_tau"](spark, SF_DIR).collect()[0]
    assert (row["n0"], row["concordant"], row["discordant"]) == (n0, c, d)
    assert row["tau_b_ppm"] == want


def test_sprt_matches_python_walk(spark):
    WIN, LOSE, BOUND = 510826, -336472, 2944439
    ev = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda r: (r["event_type"], r["ts"], r["event_id"]),
    )
    walks = defaultdict(list)
    for r in ev:
        walks[r["event_type"]].append(WIN if r["value"] > 50 else LOSE)
    want = {}
    for et, steps in walks.items():
        llr, decided, at = 0, None, None
        for i, s in enumerate(steps, 1):
            llr += s
            if decided is None and (llr >= BOUND or llr <= -BOUND):
                decided = "accept_h1" if llr >= BOUND else "accept_h0"
                at = i
                llr_at = llr
        want[et] = (
            len(steps),
            at,
            llr_at if decided else None,
            decided or "continue",
        )
    got = {
        r["event_type"]: (
            r["n_trials"], r["decided_at"], r["llr_at_decision"],
            r["decision"],
        )
        for r in QUERIES["agg_sprt_boundary"](spark, SF_DIR).collect()
    }
    assert got == want


def test_brier_decomposes_and_bounds(spark):
    rows = QUERIES["ml_brier_score"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    mt = max(r["o_totalprice"] for r in orders)
    sse = defaultdict(int)
    n = defaultdict(int)
    for r in orders:
        p = min(999, max(1, math.floor(r["o_totalprice"] * 1000 / mt)))
        y = 1000 if r["o_orderpriority"] == "1-URGENT" else 0
        sse[r["o_orderstatus"]] += (p - y) ** 2
        n[r["o_orderstatus"]] += 1
    assert {r["o_orderstatus"]: (r["n"], r["sse_milli2"]) for r in rows} == {
        k: (n[k], sse[k]) for k in n
    }
    for r in rows:
        # brier_nano = sse*1000 // n, and brier in [0, 1] => nano <= 1e9
        assert r["brier_nano"] == r["sse_milli2"] * 1000 // r["n"]
        assert 0 <= r["brier_nano"] <= 1_000_000_000


def test_sax_symbols_replay(spark):
    """PAA segmentation + empirical-quartile symbols replayed in
    Python; also asserts the SAX mass-equalization property (each
    letter covers n_seg/4 +- 1 segments per series)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].date())] += 1
    series = defaultdict(list)
    for (et, day), cnt in sorted(daily.items()):
        series[et].append(cnt)
    want = {}
    for et, cnts in series.items():
        n = len(cnts)
        segs = defaultdict(lambda: [0, 0])
        for i, c in enumerate(cnts):
            s = segs[i * 8 // n]
            s[0] += c
            s[1] += 1
        ordered = sorted(segs.items(), key=lambda kv: (kv[1][0], kv[0]))
        m = len(ordered)
        for pos, (seg, (tot, days)) in enumerate(ordered):
            # NTILE(4): first (m % 4) tiles get ceil(m/4) rows
            big, rem = divmod(m, 4)
            tile, acc = 1, 0
            for t in range(1, 5):
                size = big + (1 if t <= rem else 0)
                if pos < acc + size:
                    tile = t
                    break
                acc += size
            want[(et, seg)] = (tot, days, "abcd"[tile - 1])
    got = {
        (r["event_type"], r["seg"]): (
            r["seg_sum"], r["seg_days"], r["symbol"],
        )
        for r in QUERIES["ts_sax_symbols"](spark, SF_DIR).collect()
    }
    assert got == want


def test_decayed_sum_replay(spark):
    ev = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    hist = defaultdict(list)
    for r in ev:
        hist[r["user_id"]].append(round(r["value"] * 100))
    want_scores = {
        u: sum(
            v * (1 << (15 - k))
            for k, v in enumerate(reversed(vals[-16:]))
        )
        for u, vals in hist.items()
    }
    top = sorted(want_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got = [
        (r["user_id"], r["decayed_32768"])
        for r in QUERIES["window_decayed_sum"](spark, SF_DIR).collect()
    ]
    assert got == top


def test_hits_counts_alternating_paths(spark):
    """auth2(v) must equal the number of (s1 -> c1 <- s2 -> v)
    alternating path triples — replayed from the edge set."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    edges = {(r["l_suppkey"], orders[r["l_orderkey"]]) for r in li}
    auth1 = defaultdict(int)
    for s, c in edges:
        auth1[c] += 1
    hub1 = defaultdict(int)
    for s, c in edges:
        hub1[s] += auth1[c]
    auth2 = defaultdict(int)
    for s, c in edges:
        auth2[c] += hub1[s]
    want = sorted(
        ((c, a2, auth1[c]) for c, a2 in auth2.items()),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    got = [
        (r["custkey"], r["auth2"], r["auth1"])
        for r in QUERIES["graph_hits_authorities"](spark, SF_DIR).collect()
    ]
    assert got == want


def test_lift_table_invariants(spark):
    rows = sorted(
        QUERIES["ml_lift_cumulative_gains"](spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    tot_n = rows[-1]["cum_n"]
    tot_pos = rows[-1]["cum_pos"]
    assert tot_n == sum(r["n"] for r in rows)
    assert tot_pos == sum(r["pos"] for r in rows)
    run_n = run_pos = 0
    for r in rows:
        run_n += r["n"]
        run_pos += r["pos"]
        assert (r["cum_n"], r["cum_pos"]) == (run_n, run_pos)
        assert r["lift_ppm"] == run_pos * tot_n * 1_000_000 // (
            run_n * tot_pos
        )
    # final cumulative lift is exactly 1.0 (ppm floor)
    assert rows[-1]["lift_ppm"] == 1_000_000


def test_mutual_information_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cell = defaultdict(int)
    for r in docs:
        cell[(r["lang"], r["source"])] += 1
    nx = defaultdict(int)
    ny = defaultdict(int)
    for (x, y), n in cell.items():
        nx[x] += n
        ny[y] += n
    N = sum(cell.values())
    mi = sum(
        n * (math.log(n * N) - math.log(nx[x] * ny[y]))
        for (x, y), n in cell.items()
    ) / N
    row = QUERIES["ml_mutual_information"](spark, SF_DIR).collect()[0]
    assert row["n_cells"] == len(cell)
    assert abs(row["mi_micronats"] - round(mi * 1e6)) <= 1
    assert row["mi_micronats"] >= 0


def test_cramers_v_bounds_and_replay(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cell = defaultdict(float)
    for r in orders:
        cell[(r["o_orderpriority"], r["o_orderstatus"])] += 1.0
    rm = defaultdict(float)
    cm = defaultdict(float)
    for (p, s), o in cell.items():
        rm[p] += o
        cm[s] += o
    t = sum(cell.values())
    chi2 = sum(
        (o - rm[p] * cm[s] / t) ** 2 / (rm[p] * cm[s] / t)
        for (p, s), o in cell.items()
    )
    want = round(
        math.sqrt(chi2 / (t * (min(len(rm), len(cm)) - 1))) * 1e6
    )
    row = QUERIES["ml_cramers_v"](spark, SF_DIR).collect()[0]
    assert abs(row["cramers_v_ppm"] - want) <= 1
    assert 0 <= row["cramers_v_ppm"] <= 1_000_000


def test_iv_woe_identity(spark):
    """Sum of signed bucket shares must vanish; IV >= 0 overall and
    each bucket's WoE sign matches its good/bad share imbalance."""
    rows = QUERIES["ml_iv_woe"](spark, SF_DIR).collect()
    assert len(rows) == 5
    tb = sum(r["n_bad"] for r in rows)
    tg = sum(r["n"] - r["n_bad"] for r in rows)
    iv_total = 0
    for r in rows:
        good, bad = r["n"] - r["n_bad"], r["n_bad"]
        woe = math.log(good * tb) - math.log(bad * tg)
        assert abs(r["woe_micronats"] - round(woe * 1e6)) <= 1
        assert (r["woe_micronats"] > 0) == (good * tb > bad * tg)
        iv_total += r["iv_contrib_micro"]
        assert r["iv_contrib_micro"] >= -1  # each term is >= 0 up to grain
    assert iv_total >= 0


def test_rr_estimator_identity(spark):
    """Exact estimator arithmetic + md5-coin flip-count replay. The
    statistical recovery band is only meaningful at sf>=0.01 user
    counts (15 users here), so the test pins the deterministic parts:
    the flip set, the truncating division, and the estimator range."""
    row = QUERIES["privacy_rr_estimate"](spark, SF_DIR).collect()[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    attr = defaultdict(int)
    for r in ev:
        if r["event_type"] == "purchase":
            attr[r["user_id"]] = 1
        attr.setdefault(r["user_id"], 0)
    yes = 0
    for u, a in attr.items():
        flip = int(hashlib.md5(str(u).encode()).hexdigest()[:6], 16) % 4 == 0
        yes += (1 - a) if flip else a
    assert (row["n"], row["yes"], row["true_yes"]) == (
        len(attr), yes, sum(attr.values()),
    )
    num = (4 * row["yes"] - row["n"]) * 1_000_000
    den = 2 * row["n"]
    assert row["est_true_ppm"] == int(num / den) if num < 0 else num // den
    # estimator range for a p=1/4 flip: [-0.5, 1.5]
    assert -500_000 <= row["est_true_ppm"] <= 1_500_000


def test_small_cell_suppression_margin_safety(spark):
    """After suppression no row or column may contain EXACTLY ONE
    hidden cell (the recoverability invariant the pass enforces),
    and every under-threshold cell is hidden."""
    rows = QUERIES["privacy_small_cell_suppression"](spark, SF_DIR).collect()
    by_row = defaultdict(list)
    by_col = defaultdict(list)
    for r in rows:
        assert (r["n"] < 5) == (r["status"] == "primary")
        hidden = r["status"] != "published"
        by_row[r["seg"]].append(hidden)
        by_col[r["nk"]].append(hidden)
    for sups in by_row.values():
        assert sum(sups) != 1
    # columns: one round of column pass can't be broken by later steps
    for sups in by_col.values():
        assert sum(sups) != 1


def test_stickiness_dau_mau_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    epoch = __import__("datetime").date(1970, 1, 1)
    active = {
        (r["user_id"], (r["ts"].date() - epoch).days) for r in ev
    }
    days = sorted({d for _, d in active})
    got = {
        r["day_num"]: (r["dau"], r["mau"], r["stickiness_ppm"])
        for r in QUERIES["event_stickiness_dau_mau"](spark, SF_DIR).collect()
    }
    assert set(got) == set(days)
    for d in days:
        dau = sum(1 for (_, dd) in active if dd == d)
        mau = len({u for (u, dd) in active if d - 27 <= dd <= d})
        assert got[d] == (dau, mau, dau * 1_000_000 // mau)
        assert got[d][0] <= got[d][1]


def test_audio_vad_segments_replay(spark):
    """Frame energies + island merge replayed bytewise in Python."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    want = set()
    for d in docs:
        raw = d["text"].encode()
        n = (len(raw) // 64) * 64
        speech = [
            i
            for i in range(n // 64)
            if sum(raw[i * 64:(i + 1) * 64]) > 6040
        ]
        if not speech:
            continue
        start = prev = speech[0]
        seg_e = sum(raw[start * 64:(start + 1) * 64])
        for f in speech[1:]:
            if f == prev + 1:
                prev = f
                seg_e += sum(raw[f * 64:(f + 1) * 64])
            else:
                want.add((d["doc_id"], start, prev, prev - start + 1, seg_e))
                start = prev = f
                seg_e = sum(raw[f * 64:(f + 1) * 64])
        want.add((d["doc_id"], start, prev, prev - start + 1, seg_e))
    got = {
        (r["doc_id"], r["start_frame"], r["end_frame"], r["n_frames"],
         r["total_energy"])
        for r in QUERIES["multimodal_audio_vad"](spark, SF_DIR).collect()
    }
    assert got == want


def test_tokenizer_fertility_invariants(spark):
    rows = QUERIES["docs_tokenizer_fertility"](spark, SF_DIR).collect()
    assert len(rows) >= 2
    for r in rows:
        # BPE pre-tokens can only split words further: fertility >= 1
        assert r["fertility_ppm"] >= 1_000_000
        assert r["tot_tokens"] >= r["tot_words"]
        assert r["fertility_ppm"] == r["tot_tokens"] * 1_000_000 // r["tot_words"]


def test_sentence_stats_replay(spark):
    import re as _re

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for d in docs:
        sents = [
            s.strip() for s in _re.split(r"[.!?]+", d["text"]) if s.strip()
        ]
        words = sum(len([w for w in s.split(" ") if w]) for s in sents)
        a = agg[d["source"]]
        a[0] += 1
        a[1] += len(sents)
        a[2] += words
    got = {
        r["source"]: (
            r["n_docs"], r["tot_sents"], r["tot_words"],
            r["words_per_sent_milli"],
        )
        for r in QUERIES["docs_sentence_stats"](spark, SF_DIR).collect()
    }
    assert got == {
        k: (n, s, w, w * 1000 // s) for k, (n, s, w) in agg.items()
    }


def test_dup_rate_charges_copies_not_originals(spark):
    rows = QUERIES["docs_dup_rate_by_source"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    import re as _re

    first = {}
    dups = defaultdict(int)
    tot = defaultdict(int)
    for d in sorted(docs, key=lambda r: r["doc_id"]):
        norm = _re.sub(r"\s+", " ", d["text"]).strip().lower()
        tot[d["source"]] += 1
        if norm in first:
            dups[d["source"]] += 1
        else:
            first[norm] = d["doc_id"]
    got = {r["source"]: (r["n_docs"], r["n_dups"]) for r in rows}
    assert got == {k: (tot[k], dups[k]) for k in tot}
    total_dups = sum(dups.values())
    assert total_dups == len(docs) - len(first)


def test_char_trigram_profile_topk(spark):
    rows = QUERIES["text_char_trigram_profile"](spark, SF_DIR).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append((r["rk"], r["n"], r["tri"]))
        assert len(r["tri"]) == 3 and r["tri"].isalpha() and r["tri"].islower()
    for lang, items in by_lang.items():
        items.sort()
        assert [rk for rk, _, _ in items] == list(range(1, len(items) + 1))
        # counts non-increasing with rank; ties broken by trigram asc
        for (r1, n1, t1), (r2, n2, t2) in zip(items, items[1:]):
            assert n1 > n2 or (n1 == n2 and t1 < t2)


def test_base64_hex_roundtrip_all_ok(spark):
    import base64 as _b64

    rows = QUERIES["fn_base64_hex_roundtrip"](spark, SF_DIR).collect()
    cust = {
        r["c_custkey"]: r["c_name"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
        if r["c_custkey"] <= 1000
    }
    assert len(rows) == len(cust)
    for r in rows:
        name = cust[r["c_custkey"]]
        assert r["roundtrip_ok"] == 1
        assert r["name_b64"] == _b64.b64encode(name.encode()).decode()
        assert r["name_hex"] == name.encode().hex()


def test_iso_week_parity_replay(spark):
    import datetime as _dt

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    agg = defaultdict(lambda: [0, 8])
    for r in orders:
        d = r["o_orderdate"].date()
        iso = d.isocalendar()
        a = agg[(iso[0], iso[1])]
        a[0] += 1
        a[1] = min(a[1], iso[2])
    got = {
        (r["iso_year"], r["iso_week"]): (r["n_orders"], r["first_dow"])
        for r in QUERIES["fn_iso_week_parity"](spark, SF_DIR).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_distinct_on_picks_max_order(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    best = {}
    for r in orders:
        k = r["o_custkey"]
        cand = (-r["o_totalprice"], r["o_orderkey"])
        if k not in best or cand < best[k]:
            best[k] = cand
    got = {
        r["o_custkey"]: r["o_orderkey"]
        for r in QUERIES["sql_distinct_on"](spark, SF_DIR).collect()
    }
    assert got == {k: v[1] for k, v in best.items()}


def test_npv_exact_replay(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    scaled = defaultdict(int)
    n = defaultdict(int)
    for r in orders:
        s = seg[r["o_custkey"]]
        t = r["o_orderdate"].year - 1995
        assert 0 <= t <= 6
        scaled[s] += round(r["o_totalprice"] * 100) * 20**t * 21 ** (6 - t)
        n[s] += 1
    got = {
        r["segment"]: (r["n_orders"], r["npv_cents"])
        for r in QUERIES["agg_npv_exact"](spark, SF_DIR).collect()
    }
    want = {
        s: (n[s], round(float(v) / 21**6)) for s, v in scaled.items()
    }
    assert got == want
    for s, (_, npv) in got.items():
        undiscounted = sum(
            round(r["o_totalprice"] * 100)
            for r in orders
            if seg[r["o_custkey"]] == s
        )
        assert 0 < npv < undiscounted


def test_rsi_wilder_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].date())] += round(r["value"] * 100)
    series = defaultdict(list)
    for (et, day), px in sorted(daily.items()):
        series[et].append((day, px))
    want = {}
    for et, pts in series.items():
        u = d = None
        for (pd0, p0), (pd1, p1) in zip(pts, pts[1:]):
            delta = p1 - p0
            g, l = max(delta, 0), max(-delta, 0)
            if u is None:
                u, d = float(g), float(l)
            else:
                u = 0.5 * g + 0.5 * u
                d = 0.5 * l + 0.5 * d
            if u + d > 0:
                x = 100000.0 * u / (u + d)
                want[(et, pd1)] = int(math.floor(x + 0.5))
            else:
                want[(et, pd1)] = None
    got = {
        (r["event_type"], r["day"]): r["rsi_milli"]
        for r in QUERIES["ts_rsi_wilder"](spark, SF_DIR).collect()
    }
    assert got == want
    for v in got.values():
        assert v is None or 0 <= v <= 100_000


def test_str_to_map_entries_replay(spark):
    rows = QUERIES["fn_str_to_map_entries"](spark, SF_DIR).collect()
    cust = [
        r
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
        if r["c_custkey"] <= 500
    ]
    want = set()
    for r in cust:
        want.add((r["c_custkey"], "seg", r["c_mktsegment"]))
        want.add((r["c_custkey"], "nat", str(r["c_nationkey"])))
        want.add((r["c_custkey"], "bal", str(round(r["c_acctbal"] * 100))))
    assert {(r["c_custkey"], r["k"], r["v"]) for r in rows} == want


def test_levene_bf_replay(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    groups = defaultdict(list)
    for r in orders:
        groups[r["o_orderpriority"]].append(round(r["o_totalprice"] * 100))
    stats = []
    for vals in groups.values():
        vals.sort()
        n = len(vals)
        # interpolated median doubled (matches quantile_cont * 2)
        if n % 2:
            med2 = 2 * vals[n // 2]
        else:
            med2 = vals[n // 2 - 1] + vals[n // 2]
        z = [abs(2 * v - med2) for v in vals]
        stats.append((n, sum(z), sum(x * x for x in z)))
    nn = sum(s[0] for s in stats)
    k = len(stats)
    tz = sum(s[1] for s in stats)
    num = sum(
        n * (sz / n - tz / nn) ** 2 for (n, sz, _) in stats
    )
    den = sum(szz - sz / n * sz for (n, sz, szz) in stats)
    want = round(1000.0 * (nn - k) / (k - 1) * num / den)
    row = QUERIES["agg_levene_bf"](spark, SF_DIR).collect()[0]
    assert (row["n_total"], row["n_groups"]) == (nn, k)
    assert abs(row["levene_w_milli"] - want) <= 1
    assert row["levene_w_milli"] >= 0


def test_power_user_curve_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    epoch = __import__("datetime").date(1970, 1, 1)
    active = {(r["user_id"], (r["ts"].date() - epoch).days) for r in ev}
    last = max(d for _, d in active)
    per_user = defaultdict(int)
    for u, d in active:
        if last - 27 <= d <= last:
            per_user[u] += 1
    hist = defaultdict(int)
    for n in per_user.values():
        hist[n] += 1
    got = {
        r["days_active"]: r["n_users"]
        for r in QUERIES["event_power_user_curve"](spark, SF_DIR).collect()
    }
    assert got == dict(hist)
    assert all(1 <= d <= 28 for d in got)


def test_stream_left_outer_matches_batch(spark):
    """Streaming left-outer with the watermark-flush sentinel must
    equal the batch LEFT JOIN exactly — including the null-padded
    unmatched purchases in the final 2h that only close because the
    sentinel advanced the watermark."""
    got = sorted(
        (r["purchase_id"], r["click_id"])
        for r in QUERIES["stream_left_outer_join"](spark, SF_DIR).collect()
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    purchases = [r for r in ev if r["event_type"] == "purchase"]
    clicks = [r for r in ev if r["event_type"] == "click"]
    want = []
    HOUR = __import__("datetime").timedelta(hours=1)
    for p in purchases:
        matched = False
        for cl in clicks:
            if cl["user_id"] == p["user_id"] and (
                p["ts"] - HOUR <= cl["ts"] <= p["ts"]
            ):
                want.append((p["event_id"], cl["event_id"]))
                matched = True
        if not matched:
            want.append((p["event_id"], None))
    assert got == sorted(want, key=lambda t: (t[0], t[1] is None, t[1] or 0))
    assert any(c is None for _, c in got)


def _copurchase_edges(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    per_order = defaultdict(set)
    for r in li:
        per_order[r["l_orderkey"]].add(r["l_partkey"])
    cooc = defaultdict(int)
    for parts in per_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                cooc[(ps[i], ps[j])] += 1
    return {
        (u, v): 1_000_000 // n for (u, v), n in cooc.items() if n >= 2
    }


def test_mst_boruvka_weight_matches_kruskal(spark):
    """Borůvka's forest must have the same component coverage, edge
    count (V - #components), acyclicity, and TOTAL WEIGHT as a
    sequential Kruskal replay (the forest itself need not be unique
    under duplicate weights; the weight is)."""
    edges = _copurchase_edges(spark)
    got = [
        (r["u"], r["v"], r["w"])
        for r in QUERIES["graph_mst_boruvka"](spark, SF_DIR).collect()
    ]
    for u, v, w in got:
        assert edges.get((u, v)) == w  # forest edges come from the graph
    # union-find Kruskal
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    kruskal_w = 0
    n_edges = 0
    for (u, v), w in sorted(edges.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            kruskal_w += w
            n_edges += 1
    assert sum(w for _, _, w in got) == kruskal_w
    assert len(got) == n_edges
    # acyclic: |edges| == |nodes| - |components| in the returned forest
    parent.clear()
    for u, v, _ in got:
        ru, rv = find(u), find(v)
        assert ru != rv  # adding a forest edge never closes a cycle
        parent[ru] = rv


def test_bollinger_breakout_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[(r["event_type"], r["ts"].date())] += round(r["value"] * 100)
    series = defaultdict(list)
    for (et, day), cents in sorted(daily.items()):
        series[et].append((day, cents))
    want = {}
    for et, pts in series.items():
        for i, (day, x) in enumerate(pts):
            wnd = [c for _, c in pts[max(0, i - 9):i]]
            n = len(wnd)
            if n < 2:
                want[(et, day)] = None
                continue
            s1, s2 = sum(wnd), sum(c * c for c in wnd)
            lhs = (n * x - s1) ** 2 * (n - 1)
            rhs = 4 * n * (n * s2 - s1 * s1)
            if lhs > rhs:
                want[(et, day)] = 1 if n * x > s1 else -1
            else:
                want[(et, day)] = 0
    got = {
        (r["event_type"], r["day"]): r["breakout"]
        for r in QUERIES["window_bollinger_breakout"](spark, SF_DIR).collect()
    }
    assert got == want
    assert set(got.values()) >= {0}  # sanity: at least interior points


def test_missing_ranges_cover_exact_complement(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    keys = sorted(
        {r["o_orderkey"] for r in orders
         if r["o_orderpriority"] == "1-URGENT"}
    )
    rows = QUERIES["window_missing_ranges"](spark, SF_DIR).collect()
    missing = set()
    for r in rows:
        assert r["n_missing"] == r["gap_end"] - r["gap_start"] + 1 > 0
        missing.update(range(r["gap_start"], r["gap_end"] + 1))
    inner = set(range(keys[0], keys[-1] + 1)) - set(keys)
    assert missing == inner


def test_runs_test_replay(spark):
    ev = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda r: (r["event_type"], r["ts"], r["event_id"]),
    )
    series = defaultdict(list)
    for r in ev:
        series[r["event_type"]].append(round(r["value"] * 2_000_000))
    got = {
        r["event_type"]: (r["n_runs"], r["n1"], r["n2"], r["z_milli"])
        for r in QUERIES["agg_runs_test"](spark, SF_DIR).collect()
    }
    for et, vals in series.items():
        sv = sorted(vals)
        n = len(sv)
        if n % 2:
            med2 = 2 * sv[n // 2]
        else:
            med2 = sv[n // 2 - 1] + sv[n // 2]
        signs = [1 if 2 * v > med2 else 0 for v in vals if 2 * v != med2]
        n1, n2 = sum(signs), len(signs) - sum(signs)
        n_runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        mu = 2.0 * n1 * n2 / (n1 + n2) + 1
        var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
               / ((n1 + n2) ** 2 * (n1 + n2 - 1)))
        z = round(1000.0 * (n_runs - mu) / math.sqrt(var))
        grow = got[et]
        assert (grow[0], grow[1], grow[2]) == (n_runs, n1, n2)
        assert abs(grow[3] - z) <= 1
