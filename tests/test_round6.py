"""Round-6 additions: longest-duplicate-substring anchor chaining
(Lee et al. 2022 ExactSubstr, distributed), exact integer Lloyd
iteration, portable-LSH determinism — pinned against constructed
corpora with hand-computable answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from php_etl_spark.llm.dedup import longest_duplicate_substrings
from php_etl_spark.llm.similarity import (
    hyperplane_coefficients,
    kmeans_lloyd1_exact,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_longest_dup_substring_exact_length_and_positions(spark):
    common = " ".join(f"w{i}" for i in range(20))  # 20 shared tokens
    docs = _docs(
        spark,
        [
            (1, "x1 x2 x3 " + common + " y1 y2"),
            (2, "z1 " + common + " q1 q2 q3"),
            # shares only the first 19 tokens of the run with doc 1/2 —
            # below the min_tokens=20 floor, must not be reported
            (3, " ".join(f"w{i}" for i in range(19)) + " different tail"),
        ],
    )
    got = {
        (r.doc_a, r.doc_b): (r.a_start, r.b_start, r.dup_tokens)
        for r in longest_duplicate_substrings(docs, k=8, min_tokens=20).collect()
    }
    # 1-based token positions: doc1 run starts after 3 filler tokens,
    # doc2 after 1
    assert got == {(1, 2): (4, 2, 20)}


def test_longest_dup_substring_tie_breaks_smallest_start(spark):
    run_a = " ".join(f"a{i}" for i in range(10))
    run_b = " ".join(f"b{i}" for i in range(10))
    # both docs share two equal-length 10-token runs; the report must
    # pick the earliest a_start (then b_start) deterministically
    docs = _docs(
        spark,
        [
            (1, run_a + " x1 x2 " + run_b),
            (2, run_a + " y1 y2 y3 " + run_b),
        ],
    )
    rows = longest_duplicate_substrings(docs, k=4, min_tokens=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b, r.a_start, r.b_start, r.dup_tokens) == (1, 2, 1, 1, 10)


def test_longest_dup_substring_df_cap_drops_boilerplate(spark):
    # the same 12-token run in 4 documents: with max_df=2 every anchor
    # in the run exceeds the postings cap, so nothing is reported —
    # the boilerplate guard that keeps the join subquadratic at scale
    run = " ".join(f"c{i}" for i in range(12))
    docs = _docs(spark, [(i, f"u{i} " + run + f" v{i}") for i in range(4)])
    assert longest_duplicate_substrings(docs, k=8, min_tokens=10, max_df=2).count() == 0
    assert longest_duplicate_substrings(docs, k=8, min_tokens=10).count() == 6


def test_kmeans_lloyd1_checksums_match_python(spark):
    import math

    emb = [
        (i, [math.sin(i * 7.3 + d) * 0.3 for d in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(emb, ["vec_id", "embedding"])
    got = {r.cell: (r.n_members, r.sum_q, r.sum_sq_mod)
           for r in kmeans_lloyd1_exact(df, k=4).collect()}

    # straight-line Python replay of the integer contract
    P = 1_000_000_007
    q = {i: [round(x * 1_000_000) for x in v] for i, v in emb}
    rank = {i: (i % 1000003) * 2654435761 % 999999937 for i, _ in emb}
    seeds = sorted(q, key=lambda i: (rank[i], i))[:4]
    assign = {}
    for i, v in q.items():
        dists = [
            (sum((a - b) ** 2 for a, b in zip(v, q[s])), c + 1)
            for c, s in enumerate(seeds)
        ]
        assign[i] = min(dists)[1]
    want = {}
    for cell in range(1, 5):
        members = [q[i] for i in q if assign[i] == cell]
        if not members:
            continue
        sums = [sum(col) for col in zip(*members)]
        want[cell] = (
            len(members),
            sum(sums),
            sum((s % P) * (s % P) % P for s in sums),
        )
    assert got == want


def test_lsh_hyperplanes_are_portable_md5(spark):
    import hashlib

    cf = hyperplane_coefficients(spark, n_tables=2, n_planes=3, dim=4)
    assert len(cf) == 2 and len(cf[0]) == 3 and len(cf[0][0]) == 4
    h = hashlib.md5(b"plane:1:2:3").hexdigest()[:8]
    assert cf[1][2][3] == int(h, 16) % 2001 - 1000
    assert all(-1000 <= c <= 1000 for t in cf for p in t for c in p)


def test_exactsubstr_apply_removes_merged_spans(spark):
    import hashlib

    from php_etl_spark.llm.dedup import exactsubstr_dedup_apply

    run = " ".join(f"w{i}" for i in range(12))  # 12 shared tokens
    d1 = run + " tail1 tail2"
    d2 = "lead1 " + run + " tail3"
    docs = _docs(spark, [(1, d1), (2, d2), (3, "nothing shared here at all")])
    got = {
        r.doc_id: (r.n_tokens_before, r.n_tokens_removed, r.kept_md5)
        for r in exactsubstr_dedup_apply(docs, k=4, min_tokens=10).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 1 is the smaller id of the pair: keeps everything
    assert got[1] == (14, 0, md5(d1))
    # doc 2 loses the 12-token run, keeps lead1 + tail3
    assert got[2] == (14, 12, md5("lead1 tail3"))
    # doc 3 untouched
    assert got[3] == (5, 0, md5("nothing shared here at all"))


def test_exactsubstr_apply_merges_overlapping_spans(spark):
    import hashlib

    from php_etl_spark.llm.dedup import exactsubstr_dedup_apply

    # doc 3 shares tokens 1-10 with doc 1 and tokens 6-15 with doc 2:
    # overlapping spans in doc 3 must merge to one cut of 15 tokens
    toks = [f"w{i}" for i in range(15)]
    docs = _docs(
        spark,
        [
            (1, " ".join(toks[:10])),
            (2, " ".join(toks[5:])),
            (3, " ".join(toks) + " extra1 extra2"),
        ],
    )
    got = {
        r.doc_id: (r.n_tokens_before, r.n_tokens_removed, r.kept_md5)
        for r in exactsubstr_dedup_apply(docs, k=4, min_tokens=10).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got[1] == (10, 0, md5(" ".join(toks[:10])))
    assert got[2] == (10, 0, md5(" ".join(toks[5:])))
    assert got[3] == (17, 15, md5("extra1 extra2"))
