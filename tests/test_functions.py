"""Reference-parity tests for the string helpers.

Expected values follow PHP semantics at
/root/reference/sdk/lib/str.php (str_before falsy-strpos: separator
at position 0 behaves like a miss) and
/root/reference/sdk/src/ETLTask.php:50-52 (trim-normalized dedup keys
with numeric exemption).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from php_etl_spark.functions import str_before, str_after, dedup_key, email_valid


def _vals(spark, data, fn):
    df = spark.createDataFrame([(d,) for d in data], ["s"])
    return [r.out for r in df.select(fn(F.col("s")).alias("out")).collect()]


def test_str_before_basic(spark):
    assert _vals(spark, ["a-b-c"], lambda c: str_before(c, "-")) == ["a"]


def test_str_before_missing_sep(spark):
    assert _vals(spark, ["abc"], lambda c: str_before(c, "-")) == [""]


def test_str_before_sep_at_start_php_falsy_bug(spark):
    # PHP strpos returns 0 → treated falsy → '' (str.php:13-16)
    assert _vals(spark, ["-abc"], lambda c: str_before(c, "-")) == [""]


def test_str_after_basic(spark):
    assert _vals(spark, ["a-b-c"], lambda c: str_after(c, "-")) == ["b-c"]


def test_str_after_missing_sep(spark):
    assert _vals(spark, ["abc"], lambda c: str_after(c, "-")) == [""]


def test_str_after_sep_at_start(spark):
    assert _vals(spark, ["-abc"], lambda c: str_after(c, "-")) == ["abc"]


def test_str_after_multichar_sep(spark):
    assert _vals(spark, ["x::y::z"], lambda c: str_after(c, "::")) == ["y::z"]


def test_dedup_key_trims_strings(spark):
    assert _vals(spark, ["A MODIFIER   "], dedup_key) == ["A MODIFIER"]


def test_dedup_key_keeps_numeric_raw(spark):
    # numeric-looking values are NOT trimmed in the reference cache
    df = spark.createDataFrame([("42",), (" 42 ",)], ["s"])
    out = [r.k for r in df.select(dedup_key(F.col("s")).alias("k")).collect()]
    assert out[0] == "42"
    # ' 42 ' is numeric per try_cast → kept raw (PHP is_numeric accepts
    # leading/trailing whitespace variants loosely; raw-keep matches)
    assert out[1] == " 42 "


def test_email_valid(spark):
    ok = _vals(spark, ["a.b@example.com", "bad@", "no-at.example.com"], email_valid)
    assert ok == [True, False, False]


def test_cms_one_sided_and_merge_invariant(spark):
    from php_etl_spark.functions import sketches as SK

    data = spark.createDataFrame(
        [(f"k{i % 37}",) for i in range(2000)] + [("hot",)] * 500, ["v"]
    )
    exact = {r["v"]: r["n"] for r in data.groupBy("v").agg(
        F.count("*").alias("n")).collect()}

    sketch = SK.cms_build(data, "v", depth=4, width=256)
    items = data.select("v").distinct()
    est = {r["item"]: r["est"] for r in SK.cms_estimate(
        sketch, items, "v", depth=4, width=256).collect()}
    # one-sided: never undercounts
    assert all(est[k] >= exact[k] for k in exact), (est, exact)
    # wide-enough sketch: hot key estimated tightly (<= 1% slack here)
    assert est["hot"] <= exact["hot"] + 0.01 * 2500

    # merge(two halves) == sketch(whole): counters are algebraic
    h1 = data.filter(F.xxhash64("v") % 2 == 0)
    h2 = data.filter(F.xxhash64("v") % 2 != 0)
    merged = SK.cms_merge(
        SK.cms_build(h1, "v", depth=4, width=256),
        SK.cms_build(h2, "v", depth=4, width=256),
    )
    whole = {(r["row"], r["bucket"]): r["cnt"] for r in sketch.collect()}
    parts = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert whole == parts


def test_cdc_apply_semantics(spark):
    from php_etl_spark.operators.scd import cdc_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "val"]
    )
    changes = spark.createDataFrame(
        # id 1: update then DELETE (delete is latest, seq 2) -> gone
        [(1, "a2", "U", 1), (1, "a3", "D", 2),
         # id 2: two updates -> latest (seq 5) wins
         (2, "b2", "U", 4), (2, "b3", "U", 5),
         # id 4: fresh insert
         (4, "d", "I", 7)],
        ["id", "val", "op", "seq"],
    )
    got = {
        (r["id"], r["val"])
        for r in cdc_apply(base, changes, ["id"], ["seq"]).collect()
    }
    assert got == {(2, "b3"), (3, "c"), (4, "d")}
