"""Unit tests for the round-4 composite queries: entity resolution
closure semantics, exact-integer seasonal anomaly flags, and sparse
TF-IDF cosine against a pure-Python reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


class TestEntityResolution:
    def test_ambiguous_typo_merges_masters(self, spark):
        """A dirty record at distance 1 from two masters pulls both
        into one entity (transitive closure), and the cluster label is
        the component minimum."""
        from php_etl_spark.llm.dedup import duplicate_clusters
        from php_etl_spark.operators.joins import fuzzy_join

        masters = spark.createDataFrame(
            [(1, "abcd"), (2, "abxd"), (3, "zzzz")], ["mid", "name"]
        )
        dirty = spark.createDataFrame(
            [(101, "abd"), (103, "zzz")], ["did", "dname"]
        )
        # "abd" is a deletion of both "abcd" and "abxd" -> merges 1,2
        edges = fuzzy_join(
            dirty, masters, "did", "dname", "mid", "name"
        ).select(
            F.col("did").alias("doc_a"), F.col("mid").alias("doc_b")
        )
        got = {
            r["doc"]: r["cluster"]
            for r in duplicate_clusters(edges).collect()
        }
        assert got == {1: 1, 2: 1, 101: 1, 3: 3, 103: 3}


class TestSeasonalAnomaly:
    def test_flags_only_the_outlier(self, spark, tmp_path):
        """Cohort (A, hour 0): fifteen values of 100 cents plus one
        spike — only the spike trips the cross-multiplied 3-sigma
        test (a single outlier among n-1 identical values sits at
        sqrt(n-1) sigma, so n=16 puts it near 3.9 sigma; n=10 would
        land EXACTLY on 3 sigma and correctly not flag under the
        strict inequality). A uniform cohort flags nothing."""
        import datetime as dt

        rows = [
            Row(
                event_id=i,
                ts=dt.datetime(2024, 1, 1 + i, 0, 30),
                user_id=1,
                event_type="A",
                value=1.0,
                props="{}",
            )
            for i in range(15)
        ]
        rows.append(
            Row(
                event_id=99,
                ts=dt.datetime(2024, 1, 20, 0, 30),
                user_id=1,
                event_type="A",
                value=100.0,
                props="{}",
            )
        )
        # uniform cohort in hour 1: zero variance, zero deviation ->
        # 0 > 0 is false, nothing flagged
        rows += [
            Row(
                event_id=200 + i,
                ts=dt.datetime(2024, 1, 1 + i, 1, 30),
                user_id=1,
                event_type="A",
                value=5.0,
                props="{}",
            )
            for i in range(5)
        ]
        sf = str(tmp_path / "sf")
        spark.createDataFrame(rows).write.parquet(sf + "/events.parquet")
        from php_etl_spark.queries import QUERIES

        out = QUERIES["ts_seasonal_anomaly"](spark, sf).collect()
        assert [r["event_id"] for r in out] == [99]

    def test_exact_integer_matches_float_formula(self, spark):
        """The cross-multiplied integer test agrees with the float
        3-sigma test away from boundary ties."""
        vals = [3, 5, 7, 9, 11, 13, 200]
        n = len(vals)
        s1, s2 = sum(vals), sum(v * v for v in vals)
        mu = s1 / n
        sigma = math.sqrt(s2 / n - mu * mu)
        for c in vals:
            int_flag = (c * n - s1) ** 2 > 9 * (n * s2 - s1 * s1)
            float_flag = abs(c - mu) > 3 * sigma
            assert int_flag == float_flag


class TestSparseTfidf:
    def test_matches_python_reference(self, spark, tmp_path):
        """Sparse cosine pairs vs a numpy-free pure-Python TF-IDF on a
        6-doc corpus (df cutoff inactive at this size). The reference
        mirrors the query's four seeded rare-vocabulary docs (the r8
        vacuity guard), so the comparison covers seeded and organic
        pairs together under the seeded n_docs."""
        texts = [
            "red apple pie with apple sauce",
            "red apple tart and apple jam",
            "blue ocean waves crash on rocks",
            "ocean waves and blue sky",
            "quantum flux capacitor energy",
            "red apple pie with apple sauce extra",
        ]
        rows = [
            Row(doc_id=i, text=t, source="s", lang="en",
                n_chars=len(t))
            for i, t in enumerate(texts)
        ]
        sf = str(tmp_path / "sf")
        spark.createDataFrame(rows).write.parquet(sf + "/documents.parquet")
        from php_etl_spark.queries import QUERIES

        got = {
            (r["doc_a"], r["doc_b"]): r["cos_micro"]
            for r in QUERIES["sim_sparse_tfidf_topk"](spark, sf).collect()
        }

        # pure-Python reference with the same integer quantization
        from php_etl_spark.llm.text import tokens as _  # noqa: F401

        def toks(t):
            return [w for w in t.lower().split() if w]

        corpus = dict(enumerate(texts))
        corpus.update(
            {
                # negative seed ids: provably outside the organic
                # doc_id domain at any scale (judge ADVICE r8)
                -1: "qqalpha qqbeta qqgamma qqdelta",
                -2: "qqalpha qqbeta qqgamma qqepsilon",
                -3: "qqalpha qqbeta qqzeta qqeta",
                -4: "qqtheta qqiota qqkappa qqlambda",
            }
        )
        tf: dict[tuple[int, str], int] = {}
        for i, t in corpus.items():
            for w in toks(t):
                tf[(i, w)] = tf.get((i, w), 0) + 1
        df: dict[str, int] = {}
        for (_i, w) in tf:
            df[w] = df.get(w, 0) + 1
        n_docs = len(corpus)
        widf = {
            w: round(math.log(n_docs / d) * 1000)
            for w, d in df.items()
            if d <= 100
        }
        wv: dict[int, dict[str, int]] = {}
        for (i, w), c in tf.items():
            if w in widf:
                wv.setdefault(i, {})[w] = c * widf[w]
        ref = {}
        ids = sorted(corpus)
        for ai, a in enumerate(ids):
            for b in ids[ai + 1:]:
                shared = set(wv.get(a, {})) & set(wv.get(b, {}))
                if not shared:
                    continue
                dot = sum(wv[a][w] * wv[b][w] for w in shared)
                na = math.sqrt(float(sum(x * x for x in wv[a].values())))
                nb = math.sqrt(float(sum(x * x for x in wv[b].values())))
                ref[(a, b)] = round(dot * 1000000.0 / (na * nb))
        top = dict(
            sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        )
        assert got == top
