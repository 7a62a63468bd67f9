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
