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
