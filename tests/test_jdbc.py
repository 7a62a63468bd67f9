"""JDBC sink tests (SURVEY.md §2.1 S7/S8/S9/S11) against embedded
Derby — the single-JVM stand-in for the reference's MySQL destination
(/root/reference/sdk/lib/db.php:250-296, 327-346).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from php_etl_spark.plans.runner import run_pipeline
from php_etl_spark.plans.spec import PipelineSpec
from php_etl_spark.sources import jdbc as J


def _conn(name):
    return J.derby_conn(name)


def test_jdbc_append_roundtrip(spark):
    conn = _conn("t_append")
    df = spark.range(50).selectExpr("id", "concat('row', id) as label")
    J.jdbc_overwrite(df, conn, "t1")
    J.jdbc_append(df.filter("id < 10"), conn, "t1")
    back = J.read_jdbc_table(spark, conn, "t1")
    assert back.count() == 60
    assert sorted(back.columns) == ["id", "label"]


def test_jdbc_upsert_merge_semantics(spark):
    conn = _conn("t_upsert")
    seed = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], ["k", "name", "v"]
    )
    J.jdbc_overwrite(seed, conn, "dst")
    J.jdbc_upsert(spark, updates, conn, "dst", ["k"])
    back = {
        r["k"]: (r["name"], r["v"])
        for r in J.read_jdbc_table(spark, conn, "dst").collect()
    }
    # matched key 2 takes the update, 1/3 survive, 4 inserts
    assert back == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30), 4: ("d", 40)}
    # staging table is dropped after the merge
    with pytest.raises(Exception):
        J.read_jdbc_table(spark, conn, "dst_staging").collect()


def test_jdbc_delete_reinsert(spark):
    conn = _conn("t_refresh")
    seed = spark.createDataFrame(
        [(1, "old"), (1, "old2"), (2, "keep")], ["k", "tag"]
    )
    replacement = spark.createDataFrame([(1, "new")], ["k", "tag"])
    J.jdbc_overwrite(seed, conn, "dst")
    J.jdbc_delete_reinsert(spark, replacement, conn, "dst", ["k"])
    rows = sorted(
        (r["k"], r["tag"])
        for r in J.read_jdbc_table(spark, conn, "dst").collect()
    )
    # BOTH rows with k=1 deleted, single replacement inserted
    assert rows == [(1, "new"), (2, "keep")]


def test_pipeline_spec_with_jdbc_destination(spark, tmp_path):
    """A pipeline spec whose 'to' connection is JDBC runs end-to-end:
    scan parquet → mapping → dedup → batched JDBC insert; the re-run
    anti-joins against the JDBC destination so it stays idempotent."""
    src = tmp_path / "src"
    spark.createDataFrame(
        [(1, "Alice "), (2, "Alice"), (3, "Bob")], ["id", "name"]
    ).write.parquet(str(src / "people"))
    conn = _conn("t_pipeline")
    spec = PipelineSpec.from_dict(
        {
            "connections": {
                "from": {"type": "parquet", "path": str(src)},
                "to": conn,
            },
            "tables": [
                {
                    "flow": "people -> persons",
                    "columns": {"person_id": "[id]", "full_name": "[name]"},
                    "unique": ["full_name"],
                    "order_by": ["id"],
                }
            ],
        }
    )
    res = run_pipeline(spark, spec)
    # trim-normalized dedup: 'Alice ' and 'Alice' collapse first-wins
    assert res[0].rows_written == 2
    back = J.read_jdbc_table(spark, conn, "persons")
    assert sorted(r["person_id"] for r in back.collect()) == [1, 3]
    # idempotent re-run: anti-join against the JDBC destination
    res2 = run_pipeline(spark, spec)
    assert res2[0].rows_written == 0
    assert back.count() == 2


def test_retry_recovers_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("connection refused")
        return "ok"

    assert J.with_retry(flaky, attempts=5, backoff_s=0, sleep=lambda _: None) == "ok"
    assert calls["n"] == 3


def test_retry_exhausts_and_raises():
    def always_down():
        raise OSError("connection refused")

    with pytest.raises(RuntimeError, match="exhausted 3 attempts"):
        J.with_retry(always_down, attempts=3, backoff_s=0, sleep=lambda _: None)


def test_retry_backoff_schedule():
    """db_connect parity: bounded attempts with a fixed wait between
    them (/root/reference/sdk/lib/db.php:336-345)."""
    waits = []

    def never():
        raise OSError("down")

    with pytest.raises(RuntimeError):
        J.with_retry(
            never, attempts=4, backoff_s=1.0, multiplier=2.0, sleep=waits.append
        )
    assert waits == [1.0, 2.0, 4.0]


def test_bulk_extract_partitioned_roundtrip(spark, tmp_path):
    """S6: partitioned JDBC extract → parquet staging → batched
    import into a second database; contents survive both legs."""
    from php_etl_spark.sources import bulk as B

    src = _conn("bulk_src")
    rows = [(i, f"name_{i}", float(i) * 1.5) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["id", "name", "amount"])
    J.jdbc_append(df, src, "people")

    staged = B.bulk_extract(
        spark, src, {"people": "id"}, str(tmp_path / "staging"), num_partitions=4
    )
    staged_df = spark.read.parquet(staged["people"])
    # range-partitioned read: multiple input partitions, same rows
    assert staged_df.count() == 100
    assert staged_df.rdd.getNumPartitions() > 1
    assert {r["id"] for r in staged_df.collect()} == set(range(1, 101))

    dst = _conn("bulk_dst")
    loaded = B.bulk_import(spark, str(tmp_path / "staging"), dst, ["people"])
    assert loaded == {"people": 100}
    back = J.read_jdbc_table(spark, dst, "people")
    assert back.count() == 100


def test_bulk_extract_unpartitioned_small_dim(spark, tmp_path):
    from php_etl_spark.sources import bulk as B

    src = _conn("bulk_dim")
    df = spark.createDataFrame([(1, "eu"), (2, "us")], ["k", "zone"])
    J.jdbc_append(df, src, "zones")
    staged = B.bulk_extract(spark, src, {"zones": None}, str(tmp_path / "st"))
    assert spark.read.parquet(staged["zones"]).count() == 2


def test_backup_and_restore_destination(spark, tmp_path):
    """O8: pre-run snapshot of destination tables; restore brings the
    pre-migration contents back after a bad write."""
    from php_etl_spark.sources import bulk as B

    dest = _conn("bulk_backup")
    df = spark.createDataFrame([(1, "keep"), (2, "keep2")], ["id", "v"])
    J.jdbc_append(df, dest, "t1")

    bdir = B.backup_destination(
        spark, dest, ["t1"], str(tmp_path / "backups"), stamp=1234
    )
    assert bdir.endswith("1234")
    # destructive migration writes garbage
    J.jdbc_overwrite(
        spark.createDataFrame([(9, "bad")], ["id", "v"]), dest, "t1"
    )
    assert J.read_jdbc_table(spark, dest, "t1").count() == 1
    B.restore_destination(spark, dest, bdir, ["t1"])
    restored = {(r["id"], r["v"]) for r in J.read_jdbc_table(spark, dest, "t1").collect()}
    assert restored == {(1, "keep"), (2, "keep2")}


def test_create_dsn_and_config_mapping():
    """S12 parity with create_dsn/SQLConnectionFactory
    (/root/reference/sdk/lib/db.php:106-134)."""
    assert J.create_dsn("h", "d") == "jdbc:mysql://h:3306/d"
    assert (
        J.create_dsn("box", "app", "pgsql", 5433, "UTF8")
        == "jdbc:postgresql://box:5433/app?characterEncoding=UTF8"
    )
    conn = J.connection_from_config(
        {"driver": "mysql", "host": "db1", "dbname": "etl",
         "user": "u", "password": "p", "batchsize": 250}
    )
    assert conn["url"] == "jdbc:mysql://db1:3306/etl"
    assert conn["options"] == {"user": "u", "password": "p"}
    assert conn["batchsize"] == 250
    # ready-made DSN passes through untouched
    ready = J.connection_from_config({"url": "jdbc:derby:memory:x", "user": "a"})
    assert ready["url"] == "jdbc:derby:memory:x"
    assert ready["options"]["user"] == "a"


def test_pipeline_spec_reference_style_db_config(spark, tmp_path):
    """A spec whose 'to' connection uses the reference's db fields
    (driver/host/dbname) normalizes to a JDBC connection; with a
    ready-made Derby url it runs end-to-end."""
    spec = PipelineSpec.from_dict(
        {
            "connections": {
                "from": {"type": "parquet", "path": "/root/testdata/sf0.001"},
                "to": {
                    "url": "jdbc:derby:memory:spec_cfg;create=true",
                    "driver": "derby",
                    "options": {"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
                },
            },
            "tables": [
                {
                    "flow": "region -> region_out",
                    "columns": ["rk <- [r_regionkey]", "rn <- [r_name]"],
                    "unique": ["rk"],
                }
            ],
        }
    )
    conn = spec.conn_for(spec.tables[0], "to")
    assert conn["type"] == "jdbc" and conn["url"].startswith("jdbc:derby")
    results = run_pipeline(spark, spec)
    assert results[0].rows_written == 5
    assert J.read_jdbc_table(spark, conn, "region_out").count() == 5
