"""Round-5 second batch: exact integer PageRank, SCC/k-core oracles,
Mann-Kendall, Holt-Winters seasonal — differential + invariant tests."""

from __future__ import annotations

import math
from collections import defaultdict

from php_etl_spark.queries import QUERIES
from tests.conftest import SF_DIR


def _monthly_cents(spark):
    """Per-(nation, yyyymm) revenue cents, replayed driver-side."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    out = defaultdict(int)
    for r in orders:
        nm = nation[cust[r["o_custkey"]]]
        ym = r["o_orderdate"].year * 100 + r["o_orderdate"].month
        p = r["o_totalprice"] * 100
        out[(nm, ym)] += int(math.copysign(math.floor(abs(p) + 0.5), p))
    return out


def _milli(x: float) -> int:
    return int(math.copysign(math.floor(abs(x * 1000.0) + 0.5), x))


def test_holt_winters_matches_python_replay(spark):
    """Level/trend/season/forecast must equal a per-nation Python
    replay of the three coupled half-weight recurrences (m=12), to
    the exact milli integer."""
    got = {
        (r["n_name"], r["ym"]): (
            r["level_milli"], r["trend_milli"],
            r["season_milli"], r["forecast_milli"],
        )
        for r in QUERIES["ts_holt_winters"](spark, SF_DIR).collect()
    }
    monthly = _monthly_cents(spark)
    series = defaultdict(list)
    for (nm, ym), cents in monthly.items():
        series[nm].append((ym, float(cents)))

    m = 12
    n = 0
    for nm, rows in series.items():
        rows.sort()
        lev = trend = 0.0
        svals: list[float] = []
        for i, (ym, x) in enumerate(rows):
            if i == 0:
                lev, trend = x, 0.0
                svals = [0.0]
            else:
                t = len(svals) + 1
                sp = svals[t - m - 1] if t > m else 0.0
                new_l = 0.5 * (x - sp) + 0.5 * (lev + trend)
                trend = 0.5 * (new_l - lev) + 0.5 * trend
                lev = new_l
                svals.append(0.5 * (x - lev) + 0.5 * sp)
            t = len(svals)
            sf = svals[t - m] if t >= m else 0.0
            assert got[(nm, ym)] == (
                _milli(lev), _milli(trend),
                _milli(svals[t - 1]), _milli(lev + trend + sf),
            ), (nm, ym)
            n += 1
    assert n == len(got) and n > 0


def _hw_run(xs, m=12):
    lev = trend = 0.0
    svals: list[float] = []
    out = []
    for i, x in enumerate(xs):
        if i == 0:
            lev, trend = x, 0.0
            svals = [0.0]
        else:
            t = len(svals) + 1
            sp = svals[t - m - 1] if t > m else 0.0
            new_l = 0.5 * (x - sp) + 0.5 * (lev + trend)
            trend = 0.5 * (new_l - lev) + 0.5 * trend
            lev = new_l
            svals.append(0.5 * (x - lev) + 0.5 * sp)
        t = len(svals)
        sf = svals[t - m] if t >= m else 0.0
        out.append((lev, trend, svals[t - 1], lev + trend + sf))
    return out


def test_holt_winters_recurrence_invariants(spark):
    """With alpha=beta=gamma=1/2 the smoother is highly reactive, so a
    periodic series keeps a bounded one-step error — but two exact
    invariants hold: a constant series is tracked with ZERO error from
    t=1 on, and on a periodic series the late-season error shrinks vs
    the first season (the seasonal state absorbs part of the
    pattern)."""
    m = 12
    const = _hw_run([42.0] * 40, m)
    for lev, trend, s, fc in const:
        assert (lev, trend, s, fc) == (42.0, 0.0, 0.0, 42.0)

    pattern = [100.0, 50.0, 75.0, 200.0, 10.0, 0.0,
               -25.0, 300.0, 60.0, 90.0, 120.0, 40.0]
    xs = pattern * 30
    out = _hw_run(xs, m)
    errs = [abs(out[i][3] - xs[i + 1]) for i in range(len(xs) - 1)]
    assert max(errs[-m:]) < 0.6 * max(errs[:m])
    assert max(errs[-m:]) < max(abs(v) for v in pattern)


def test_mann_kendall_known_series(spark):
    """The driver result must match an exact pairwise replay, and a
    strictly increasing series must give tau = +1e6 by construction
    (sanity of the formula's scaling)."""
    got = {
        r["n_name"]: (r["n_months"], r["s_stat"], r["tau_ppm"])
        for r in QUERIES["window_mann_kendall"](spark, SF_DIR).collect()
    }
    monthly = _monthly_cents(spark)
    series = defaultdict(list)
    for (nm, ym), cents in monthly.items():
        series[nm].append((ym, cents))
    for nm, rows in series.items():
        rows.sort()
        vals = [v for _, v in rows]
        n = len(vals)
        s = sum(
            (1 if vals[j] > vals[i] else -1 if vals[j] < vals[i] else 0)
            for i in range(n) for j in range(i + 1, n)
        )
        tau = int(math.copysign(
            math.floor(abs(2e6 * s / (n * (n - 1))) + 0.5), s))
        assert got[nm] == (n, s, tau), nm
    # formula sanity: strictly increasing -> every pair +1 -> tau 1e6
    vals = list(range(10))
    s = sum(1 for i in range(10) for _ in range(i + 1, 10))
    assert round(2e6 * s / (10 * 9)) == 1_000_000


def test_lttb_small_series_pass_through(spark):
    from php_etl_spark.operators.downsample import lttb

    df = spark.createDataFrame(
        [(1, i, 10 * i, i * i) for i in range(5)],
        ["k", "id", "x", "y"],
    )
    got = sorted(
        (r["id"], r["x"], r["y"])
        for r in lttb(df, "k", "x", "y", "id", k=6).collect()
    )
    assert got == [(i, 10 * i, i * i) for i in range(5)]


def test_lttb_keeps_endpoints_and_counts(spark):
    from php_etl_spark.operators.downsample import lttb

    rows = [(u, u * 1000 + i, i, (i * 7919) % 101) for u in (1, 2)
            for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "id", "x", "y"])
    out = lttb(df, "k", "x", "y", "id", k=7).collect()
    by_key = defaultdict(list)
    for r in out:
        by_key[r["k"]].append((r["x"], r["id"], r["y"]))
    src = {(u, i): (i * 7919) % 101 for u in (1, 2) for i in range(50)}
    for u, pts in by_key.items():
        pts.sort()
        assert len(pts) == 7
        assert pts[0][0] == 0 and pts[-1][0] == 49  # endpoints kept
        xs = [p[0] for p in pts]
        assert xs == sorted(set(xs))  # strictly increasing, no dups
        for x, _, y in pts:
            assert src[(u, x)] == y  # selection is a subset, values intact


def test_lttb_picks_the_spike(spark):
    """A flat series with one huge spike in a middle bucket must keep
    the spike (it forms the largest triangle by construction)."""
    from php_etl_spark.operators.downsample import lttb

    ys = [0] * 30
    ys[17] = 10_000
    df = spark.createDataFrame(
        [(1, i, i, ys[i]) for i in range(30)], ["k", "id", "x", "y"]
    )
    got = {r["x"] for r in lttb(df, "k", "x", "y", "id", k=8).collect()}
    assert 17 in got and 0 in got and 29 in got


def test_isotonic_calibration_monotone_and_mass_preserving(spark):
    rows = sorted(
        QUERIES["ml_isotonic_calibration"](spark, SF_DIR).collect(),
        key=lambda r: r["score"],
    )
    assert rows
    fitted = [r["fitted_ppm"] for r in rows]
    assert fitted == sorted(fitted)  # isotonic in score
    assert all(0 <= f <= 1_000_000 for f in fitted)
    # PAVA preserves the weighted mean: sum(n*fitted) ~ 1e6*sum(pos)
    # (each pool's fitted is its own pos/n, rounded once per pool)
    lhs = sum(r["n"] * r["fitted_ppm"] for r in rows)
    rhs = 1_000_000 * sum(r["pos"] for r in rows)
    assert abs(lhs - rhs) <= sum(r["n"] for r in rows)  # <=0.5 ulp/pool
    # the empirical rate per level brackets the fit: isotonic fit of a
    # non-trivial series never escapes [min rate, max rate]
    rates = [1_000_000 * r["pos"] / r["n"] for r in rows]
    assert min(rates) - 1 <= min(fitted) and max(fitted) <= max(rates) + 1


def test_hll_portable_estimate_within_bound(spark):
    """256 registers -> standard error ~1.04/sqrt(256) = 6.5%; assert
    the raw estimate lands within 4 sigma of the exact count (the
    test corpus is far from the small-range regime where raw HLL
    biases high)."""
    row = QUERIES["sketch_hll_portable"](spark, SF_DIR).collect()[0]
    assert row["m"] == 256
    est = row["est_milli"] / 1000.0
    exact = row["exact_n"]
    assert exact > 0
    assert abs(est - exact) / exact < 0.26
    # zero registers only when the corpus is tiny vs 256 buckets
    assert 0 <= row["n_zero"] <= 256


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from pyspark.sql import functions as F

    from php_etl_spark.functions.sketches import (
        bloom_build, bloom_might_contain,
    )

    members = spark.range(0, 500).select(F.col("id").alias("k"))
    probes = spark.range(0, 1000).select(F.col("id").alias("k"))
    bl = bloom_build(members, "k")
    rows = bloom_might_contain(probes, "k", bl).collect()
    assert len(rows) == 1000
    fn = [r["k"] for r in rows if r["k"] < 500 and r["bloom_hit"] == 0]
    fp = [r["k"] for r in rows if r["k"] >= 500 and r["bloom_hit"] == 1]
    assert fn == []  # structural guarantee
    # expected fp rate (1-e^(-kn/m))^k ~ 2.9%; allow wide slack
    assert len(fp) < 50
    # the filter is 128 words of constant state
    assert bl.count() <= 128


def test_bloom_prefilter_equals_plain_anti_join(spark):
    from pyspark.sql import functions as F

    from php_etl_spark.functions.sketches import (
        bloom_build, bloom_might_contain,
    )

    members = spark.range(0, 300).select((F.col("id") * 3).alias("k"))
    probes = spark.range(0, 500).select(F.col("id").alias("k"))
    bl = bloom_build(members, "k")
    probed = bloom_might_contain(probes, "k", bl)
    fast = probed.filter(F.col("bloom_hit") == 0).select("k").unionAll(
        probed.filter(F.col("bloom_hit") == 1)
        .select("k")
        .join(members, "k", "left_anti")
    )
    plain = probes.join(members, "k", "left_anti")
    assert sorted(r["k"] for r in fast.collect()) == sorted(
        r["k"] for r in plain.collect()
    )


def test_pagerank_exact_sums_bounded_and_deterministic(spark):
    """Ranks are nano-units: total mass stays within (truncation-loss)
    of N*scale, and two runs give identical BIGINTs."""
    from php_etl_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1), (5, 1), (5, 4)], ["a", "b"]
    )
    r1 = {r["node"]: r["rank"]
          for r in G.pagerank_exact(edges, "a", "b", iterations=8).collect()}
    r2 = {r["node"]: r["rank"]
          for r in G.pagerank_exact(edges, "a", "b", iterations=8).collect()}
    assert r1 == r2
    scale = 10**9
    total = sum(r1.values())
    # each division truncates <1 unit per node per round: loose bound
    assert 5 * scale * 0.9 < total <= 5 * scale
    # node 5 has no in-edges: its rank is exactly the base term
    assert r1[5] == 15 * scale // 100 == min(r1.values())
