"""materialize(): config-driven lineage cut (local / persist /
checkpoint) — the cluster-safe replacement for bare localCheckpoint
in iterative and pre-swap paths."""

from __future__ import annotations

import pytest

from php_etl_spark.materialize import CONF_KEY, materialize, unmaterialize


@pytest.fixture()
def _restore_mode(spark):
    prev = spark.conf.get(CONF_KEY, "local")
    yield
    spark.conf.set(CONF_KEY, prev)


def _frame(spark):
    return spark.range(100).selectExpr("id", "id * 2 AS doubled")


def test_local_mode_default(spark, _restore_mode):
    spark.conf.set(CONF_KEY, "local")
    out = materialize(_frame(spark))
    assert out.count() == 100
    assert out.filter("doubled = 10").count() == 1


def test_persist_mode(spark, _restore_mode):
    spark.conf.set(CONF_KEY, "persist")
    df = _frame(spark)
    out = materialize(df)
    # blocks are pinned on the persisted source frame; the returned
    # frame is rebuilt over its RDD so the SQL lineage is truncated
    # (iterative operators would otherwise grow the plan
    # exponentially and OOM the analyzer)
    src = out._php_etl_persisted_source
    assert src.storageLevel.useMemory or src.storageLevel.useDisk
    assert out.count() == 100
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" not in plan
    unmaterialize(out)
    assert not (src.storageLevel.useMemory or src.storageLevel.useDisk)


def test_checkpoint_mode(spark, _restore_mode, tmp_path):
    spark.conf.set(CONF_KEY, "checkpoint")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck"))
    out = materialize(_frame(spark))
    assert out.count() == 100
    # lineage is truncated: the plan no longer contains the Range scan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" not in plan


def test_invalid_mode_raises(spark, _restore_mode):
    spark.conf.set(CONF_KEY, "bogus")
    with pytest.raises(ValueError):
        materialize(_frame(spark))


def test_persist_mode_under_iterative_clusters(spark, _restore_mode):
    """duplicate_clusters runs its iteration under persist-mode
    materialization — the cluster-safe path — and still converges."""
    from php_etl_spark.llm.dedup import duplicate_clusters

    spark.conf.set(CONF_KEY, "persist")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        ["doc_a", "doc_b"],
    )
    got = {
        (r["doc"], r["cluster"]) for r in duplicate_clusters(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }
