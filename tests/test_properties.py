"""Property-based tests (SURVEY.md §5.3): PHP-parity string
functions checked against a direct Python model of the reference's
semantics, and first-wins dedup invariants, over hypothesis-generated
inputs. Each example evaluates one small DataFrame; example counts
are kept low because every example is a Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from php_etl_spark.functions.strings import dedup_key, str_after, str_before
from php_etl_spark.operators.agg import first_wins_dedup

PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=24
)


def php_str_before(s: str, sep: str) -> str:
    # /root/reference/sdk/lib/str.php:11-17 — strpos 0 is falsy, so a
    # match at the start behaves like a miss
    p = s.find(sep)
    return "" if p <= 0 else s[:p]


def php_str_after(s: str, sep: str) -> str:
    # /root/reference/sdk/lib/str.php:25-31 — only a true miss is ''
    p = s.find(sep)
    return "" if p < 0 else s[p + len(sep):]


@PROP
@given(st.lists(ascii_text, min_size=1, max_size=16), st.sampled_from([",", "-", "ab", " ", "@"]))
def test_str_before_after_php_parity(spark, rows, sep):
    df = spark.createDataFrame([(r,) for r in rows], ["s"])
    got = df.select(
        str_before("s", sep).alias("b"), str_after("s", sep).alias("a")
    ).collect()
    for r, out in zip(rows, got):
        assert out.b == php_str_before(r, sep), (r, sep)
        assert out.a == php_str_after(r, sep), (r, sep)


@PROP
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["x", " x", "x ", "  x  ", "y", "7", " 7", "z"]),
            st.integers(min_value=0, max_value=99),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_first_wins_dedup_invariants(spark, rows):
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], ["k", "v", "pos"]
    )
    out = first_wins_dedup(df, keys=["k"], order_by=[F.col("pos")]).collect()

    def norm(k: str) -> str:
        # the reference's rule: numerics raw, strings trimmed
        try:
            float(k)
            return k
        except ValueError:
            return k.strip()

    # model: first row (by pos) per normalized key
    want: dict[str, tuple] = {}
    for i, (k, v) in enumerate(rows):
        want.setdefault(norm(k), (k, v, i))
    got = {norm(r.k): (r.k, r.v, r.pos) for r in out}
    assert got == want
    # idempotence: dedup of the deduped set is itself
    df2 = spark.createDataFrame(out, ["k", "v", "pos"])
    again = first_wins_dedup(df2, keys=["k"], order_by=[F.col("pos")]).collect()
    assert sorted(tuple(r) for r in again) == sorted(tuple(r) for r in out)


@PROP
@given(st.lists(st.one_of(ascii_text, st.integers(-1000, 1000).map(str)), min_size=1, max_size=16))
def test_dedup_key_trim_rule(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = [r[0] for r in df.select(dedup_key("s")).collect()]
    for v, g in zip(vals, got):
        try:
            float(v)
            assert g == v  # numeric: raw
        except ValueError:
            assert g == v.strip()  # string: trimmed


@PROP
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10_000),
                  st.sampled_from(["en", "de", "zh", "fr"])),
        min_size=1, max_size=30, unique_by=lambda t: t[0],
    ),
    st.sampled_from([0.0, 0.125, 0.25, 0.5, 0.75, 1.0]),
)
def test_stratified_mix_properties(spark, rows, rate):
    """For any corpus and binary-exact rate: the kept set is a subset,
    rate 0 keeps nothing, rate 1 keeps the whole stratum, and the gate
    is deterministic (same input → same keep set)."""
    from php_etl_spark.llm.sampling import stratified_mix

    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = stratified_mix(df, {"en": rate}, default_rate=0.0)
    ids = {r.doc_id for r in kept.collect()}
    en_ids = {d for d, l in rows if l == "en"}
    assert ids <= en_ids
    if rate == 0.0:
        assert ids == set()
    if rate == 1.0:
        assert ids == en_ids
    assert ids == {r.doc_id for r in stratified_mix(df, {"en": rate}, default_rate=0.0).collect()}


@PROP
@given(
    st.lists(st.integers(min_value=1, max_value=5_000), min_size=1, max_size=25),
    st.sampled_from([100, 1000, 4000]),
)
def test_pack_by_budget_properties(spark, costs, budget):
    """For any cost sequence: bins are monotone non-decreasing in pack
    order, bin of doc i equals floor(prefix_sum_before_i / budget),
    and every document is assigned exactly once."""
    from php_etl_spark.llm.sampling import pack_by_budget

    rows = [(i, c) for i, c in enumerate(costs)]
    df = spark.createDataFrame(rows, ["doc_id", "cost"])
    out = sorted(
        ((r.doc_id, r.bin) for r in pack_by_budget(
            df, budget=budget, cost_col="cost", order_col="doc_id", group_col=None
        ).collect())
    )
    assert len(out) == len(costs)
    prefix = 0
    for (doc_id, b), c in zip(out, costs):
        assert b == prefix // budget, (doc_id, b, prefix, budget)
        prefix += c


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@PROP
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8),
        min_size=1,
        max_size=8,
        unique=True,
    ),
)
def test_fuzzy_join_matches_brute_force(spark, lefts, rights):
    """Deletion-signature blocking must return EXACTLY the distance<=1
    pairs the brute-force cross join finds — no lost recall from
    blocking, no extra pairs past verification. Tiny alphabet forces
    dense near-collisions (the adversarial case for signatures)."""
    from php_etl_spark.operators.joins import fuzzy_join

    ldf = spark.createDataFrame(list(enumerate(lefts)), ["lid", "s"])
    rdf = spark.createDataFrame(list(enumerate(rights)), ["rid", "t"])
    got = {
        (r["lid"], r["rid"], r["dist"])
        for r in fuzzy_join(ldf, rdf, "lid", "s", "rid", "t").collect()
    }
    want = {
        (li, ri, _lev(s, t))
        for li, s in enumerate(lefts)
        for ri, t in enumerate(rights)
        if _lev(s, t) <= 1
    }
    assert got == want


@PROP
@given(
    st.lists(
        st.tuples(st.integers(1, 100)),  # costs; ids assigned by index
        min_size=1,
        max_size=24,
    ),
    st.integers(0, 400),
)
def test_select_by_budget_equals_global_window(spark, costs, budget):
    """The three-step bounded decomposition (score histogram → whole
    buckets → boundary-bucket window) must select EXACTLY the rows the
    single global window definition does: running cost over
    (score DESC, id ASC) <= budget. Random duplicate costs exercise
    the boundary bucket; budget 0 and over-budget edges included."""
    from php_etl_spark.llm.sampling import select_by_budget

    rows = [(i, c[0]) for i, c in enumerate(costs)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    got = {
        r["doc_id"]
        for r in select_by_budget(df, budget=budget).collect()
    }
    run = 0
    want = set()
    for i, c in sorted(rows, key=lambda r: (-r[1], r[0])):
        run += c
        if run <= budget:
            want.add(i)
        else:
            break
    assert got == want, (sorted(rows), budget)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 60),                 # boundary time
            st.sampled_from([1, -1]),           # open/close delta
            st.integers(0, 60),                 # tiebreak
        ),
        min_size=1,
        max_size=120,
    ),
    st.integers(1, 50),                         # bucket width
)
def test_segmented_prefix_sum_identity(points, width):
    """The algebra behind the segmented boundary sweep
    (agg_max_concurrent): max over the global (t, delta, tie)-ordered
    prefix sums EQUALS max over time-buckets of (exclusive bucket
    offset + local prefix max), for ANY bucket width — including
    equal timestamps at bucket boundaries, all-points-one-bucket, and
    width larger than the time span. This is the invariant that makes
    the distributed two-phase plan exact."""
    ordered = sorted(points, key=lambda p: (p[0], p[1], p[2]))
    run, best = 0, float("-inf")
    for _, d, _ in ordered:
        run += d
        best = max(best, run)

    buckets: dict[int, list[tuple[int, int, int]]] = {}
    for p in ordered:
        buckets.setdefault(p[0] // width, []).append(p)
    offset, seg_best = 0, float("-inf")
    for b in sorted(buckets):
        local, local_max = 0, float("-inf")
        for _, d, _ in buckets[b]:  # already (t, delta, tie)-ordered
            local += d
            local_max = max(local_max, local)
        seg_best = max(seg_best, offset + local_max)
        offset += local
    assert seg_best == best


@PROP
@given(st.lists(st.integers(0, 5000), min_size=1, max_size=60))
def test_bitmap_distinct_equals_exact(spark, ids):
    """The 63-bit word-packing distinct count is EXACT for any
    nonnegative id multiset (the agg_bitmap_distinct kernel)."""
    df = spark.createDataFrame([(i,) for i in ids], ["user_id"])
    got = (
        df.groupBy(F.expr("user_id DIV 63").alias("blk"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
            ).alias("word")
        )
        .agg(F.sum(F.bit_count("word")).alias("d"))
        .collect()[0]["d"]
    )
    assert got == len(set(ids))


def _zorder_deinterleave(z: int, k: int, bits: int) -> tuple[int, ...]:
    vals = [0] * k
    for i in range(bits):
        for j in range(k):
            vals[j] |= ((z >> (i * k + j)) & 1) << i
    return tuple(vals)


@PROP
@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=40,
    )
)
def test_zorder_value_is_bijective(spark, pairs):
    """The Morton interleave reconstructs both coordinates exactly —
    no two distinct (a, b) share a curve value."""
    from php_etl_spark.sources.maintenance import zorder_value

    df = spark.createDataFrame(pairs, ["a", "b"])
    got = df.select(
        "a", "b", zorder_value([F.col("a"), F.col("b")], bits=8).alias("z")
    ).collect()
    for r in got:
        assert _zorder_deinterleave(r.z, 2, 8) == (r.a, r.b)


@PROP
@given(
    st.lists(st.integers(1, 8), min_size=1, max_size=30),
    st.lists(st.integers(1, 8), min_size=1, max_size=30),
)
def test_mannwhitney_histogram_equals_bruteforce(spark, xs, ys):
    """2·U from the value-histogram formulation equals the pair-count
    definition 2·(#{x>y} + ties/2) on arbitrary small samples."""
    from pyspark.sql.window import Window

    rows = [(v, "R") for v in xs] + [(v, "A") for v in ys]
    df = spark.createDataFrame(rows, ["v", "g"])
    h = df.groupBy("v").agg(
        F.count(F.when(F.col("g") == "R", F.lit(1))).alias("na"),
        F.count(F.when(F.col("g") == "A", F.lit(1))).alias("nb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    got = (
        h.withColumn(
            "nb_below", F.coalesce(F.sum("nb").over(w), F.lit(0)).cast("long")
        )
        .agg(F.sum(F.col("na") * (2 * F.col("nb_below") + F.col("nb"))).alias("u2"))
        .collect()[0]["u2"]
    )
    brute = sum(2 for x in xs for y in ys if x > y) + sum(
        1 for x in xs for y in ys if x == y
    )
    assert got == brute


# ---------------------------------------------------------------------------
# Geo properties: the SQL-fragment encoders against Python models over
# hypothesis-generated micro-degree coordinates
# ---------------------------------------------------------------------------

from php_etl_spark.functions import geo as _geo  # noqa: E402

lat_micro = st.integers(min_value=-90_000_000, max_value=89_999_999)
lon_micro = st.integers(min_value=-180_000_000, max_value=179_999_999)


def _py_spread15(v: int) -> int:
    v &= 0x7FFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def _py_morton30(lat: int, lon: int) -> int:
    import math

    ix = math.floor((lon + 180_000_000) * 32768.0 / 360_000_000)
    iy = math.floor((lat + 90_000_000) * 32768.0 / 180_000_000)
    return _py_spread15(iy) | (_py_spread15(ix) << 1)


@PROP
@given(pts=st.lists(st.tuples(lat_micro, lon_micro), min_size=1, max_size=6))
def test_morton_and_geohash_match_python_model(spark, pts):
    df = spark.createDataFrame(pts, "glat LONG, glon LONG")
    m = _geo.morton30_sql("glat", "glon")
    rows = df.select(
        "glat", "glon",
        F.expr(m).alias("m"),
        F.expr(_geo.geohash6_sql(m)).alias("gh"),
    ).collect()
    for r in rows:
        ref = _py_morton30(r["glat"], r["glon"])
        assert r["m"] == ref
        assert r["gh"] == "".join(
            _geo.GEOHASH32[(ref >> (25 - 5 * i)) & 31] for i in range(6)
        )


@PROP
@given(
    pts=st.lists(st.tuples(lat_micro, lon_micro), min_size=1, max_size=6),
    tri=st.tuples(lat_micro, lon_micro, st.integers(1, 60_000_000)),
)
def test_convex_contains_matches_python_model(spark, pts, tri):
    # right triangle anchored at (y0, x0), CCW, clamped to the globe
    y0, x0, s = tri
    y1 = min(y0 + s, 89_999_999)
    x1 = min(x0 + s, 179_999_999)
    verts = [(y0, x0), (y0, x1), (y1, x0)]

    def py_contains(lat, lon):
        n = len(verts)
        for i in range(n):
            ay, ax = verts[i]
            by, bx = verts[(i + 1) % n]
            if (bx - ax) * (lat - ay) - (by - ay) * (lon - ax) < 0:
                return False
        return True

    df = spark.createDataFrame(pts, "glat LONG, glon LONG")
    rows = df.select(
        "glat", "glon",
        F.expr(_geo.convex_contains_sql("glat", "glon", verts)).alias("c"),
    ).collect()
    for r in rows:
        assert r["c"] == py_contains(r["glat"], r["glon"])


# ---------------------------------------------------------------------------
# Connected components: star contraction vs union-find on random graphs
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_star_contraction_matches_union_find(spark, edges):
    from php_etl_spark.llm.dedup import duplicate_clusters

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r["doc"]: r["cluster"] for r in duplicate_clusters(df).collect()
    }
    assert got == truth


# --- round-5 fifth session: heavy hitters + k-truss properties ---------


@PROP
@given(
    vals=st.lists(st.integers(min_value=0, max_value=8), min_size=1,
                  max_size=120),
    k=st.integers(min_value=2, max_value=8),
)
def test_heavy_hitters_exact_for_any_data(spark, vals, k):
    """The two-phase MG plan must return EXACTLY the >n/k set with
    exact counts, for any value distribution and any k."""
    from collections import Counter

    from php_etl_spark.operators.agg import heavy_hitters

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        (r["v"], r["n_rows"])
        for r in heavy_hitters(df.repartition(3), "v", k).collect()
    }
    c = Counter(vals)
    n = len(vals)
    want = {(v, m) for v, m in c.items() if m * k > n}
    assert got == want


@PROP
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=1, max_size=25,
    ),
    k=st.integers(min_value=3, max_value=5),
)
def test_k_truss_matches_reference_peel_random_graphs(spark, edges, k):
    from collections import defaultdict

    from php_etl_spark.operators.graph import k_truss

    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "a long, b long"
    )
    got = {
        (r["u"], r["v"]): r["support"]
        for r in k_truss(df, "a", "b", k).collect()
    }
    # reference peel on the canonicalized edge set
    und = {(min(a, b), max(a, b)) for a, b in edges}
    while True:
        adj = defaultdict(set)
        for u, v in und:
            adj[u].add(v)
            adj[v].add(u)
        sup = {(u, v): len(adj[u] & adj[v]) for u, v in und}
        kept = {e for e, s in sup.items() if s >= k - 2}
        if kept == und:
            break
        und = kept
    assert got == {e: sup[e] for e in und}
