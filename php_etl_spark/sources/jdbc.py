"""JDBC write sink + connection retry (SURVEY.md §2.1 S7/S8/S9/S11).

The reference's whole purpose is writing to MySQL: batched multi-VALUES
INSERTs (/root/reference/sdk/lib/db.php:250-274), per-key UPDATEs
(/root/reference/sdk/lib/db.php:285-296), and a bounded connect-retry
loop (/root/reference/sdk/lib/db.php:327-346 — 7 attempts, 3 s apart).

Spark-first mapping:

- **Batched insert** → ``df.write.jdbc`` with ``batchsize``: each
  partition opens one connection and issues prepared-statement batches —
  exactly ``db_insert_many`` but partition-parallel, so at cluster scale
  N executors stream simultaneously instead of one PHP process.
- **Upsert / delete-reinsert** → stage the update set into a side table
  with the same parallel writer, then one transactional
  ``DELETE matching keys; INSERT … SELECT`` on the database (driver-side
  JDBC through the JVM gateway). The heavy lifting (shipping rows) is
  distributed; the key-match is set-based SQL the database optimizes —
  not a per-row round trip. Dialect MERGE (MySQL ``ON DUPLICATE KEY``,
  Postgres ``ON CONFLICT``) plugs in via ``dialect=``.
- **Retry/backoff** → ``with_retry`` wraps driver-side connects; reader/
  writer surface ``connectTimeout`` and friends via ``options``.

Tests use Apache Derby embedded (jar ships with Spark) — single-JVM
only, so it stands in for MySQL in ``local[*]``; on a cluster the same
code runs against any networked JDBC URL.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from typing import Any, TypeVar

from pyspark.sql import DataFrame, SparkSession

T = TypeVar("T")

# db_connect retries 7 times, 3 s apart (/root/reference/sdk/lib/db.php:336-345)
DEFAULT_ATTEMPTS = 7
DEFAULT_BACKOFF_S = 3.0


def with_retry(
    fn: Callable[[], T],
    attempts: int = DEFAULT_ATTEMPTS,
    backoff_s: float = DEFAULT_BACKOFF_S,
    multiplier: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Bounded retry with (optionally growing) backoff around a flaky
    action. Mirrors ``db_connect`` semantics: try, wait, retry, give up
    after ``attempts`` with the last error."""
    delay = backoff_s
    last: Exception | None = None
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — caller decides retryability
            last = exc
            if attempt == attempts - 1:
                break
            sleep(delay)
            delay *= multiplier
    raise RuntimeError(
        f"exhausted {attempts} attempts: {last}"
    ) from last


def _jdbc_writer(df: DataFrame, conn: dict[str, Any], table: str):
    writer = (
        df.write.format("jdbc")
        .option("url", conn["url"])
        .option("dbtable", table)
        .option("batchsize", str(conn.get("batchsize", 1000)))
    )
    for k, v in conn.get("options", {}).items():
        writer = writer.option(k, str(v))
    return writer


def jdbc_append(df: DataFrame, conn: dict[str, Any], table: str) -> None:
    """S7/S8: batched multi-row insert. Creates the table on first
    write (mode=append creates if absent), then prepared-statement
    batches of ``batchsize`` per partition."""
    _jdbc_writer(df, conn, table).mode("append").save()


def jdbc_overwrite(df: DataFrame, conn: dict[str, Any], table: str) -> None:
    writer = _jdbc_writer(df, conn, table).mode("overwrite")
    if conn.get("truncate"):
        writer = writer.option("truncate", "true")
    writer.save()


def _driver_connection(spark: SparkSession, conn: dict[str, Any]):
    """Open a driver-side java.sql connection (for DDL/DML the
    DataFrame writer can't express), with bounded retry."""
    jvm = spark.sparkContext._jvm
    props = jvm.java.util.Properties()
    for k, v in conn.get("options", {}).items():
        props.setProperty(str(k), str(v))
    if "driver" in conn.get("options", {}):
        jvm.java.lang.Class.forName(conn["options"]["driver"])

    def connect():
        return jvm.java.sql.DriverManager.getConnection(conn["url"], props)

    return with_retry(
        connect,
        attempts=int(conn.get("retry_attempts", DEFAULT_ATTEMPTS)),
        backoff_s=float(conn.get("retry_backoff_s", 0.1)),
    )


def jdbc_execute(
    spark: SparkSession,
    conn: dict[str, Any],
    statements: Sequence[str],
    transactional: bool = True,
) -> None:
    """Run SQL statements on the database from the driver, in one
    transaction when ``transactional`` (O5 parity: the reference wraps
    per-record work in BEGIN/COMMIT,
    /root/reference/sdk/migrate_employeur.php:196-219)."""
    jconn = _driver_connection(spark, conn)
    try:
        if transactional:
            jconn.setAutoCommit(False)
        stmt = jconn.createStatement()
        try:
            for sql in statements:
                stmt.execute(sql)
        finally:
            stmt.close()
        if transactional:
            jconn.commit()
    except Exception:
        if transactional:
            try:
                jconn.rollback()
            except Exception:  # noqa: BLE001 — preserve original error
                pass
        raise
    finally:
        jconn.close()


def _tid(name: str) -> str:
    """Table identifier, UNQUOTED: Spark's JDBC writer interpolates
    ``dbtable`` raw into CREATE TABLE, so the database has already
    case-folded it (Derby → upper); quoting here would miss it."""
    if not name.replace("_", "").isalnum():
        raise ValueError(f"unsafe SQL table identifier: {name!r}")
    return name


def _qid(name: str) -> str:
    """Column identifier, double-QUOTED: Spark's writer quotes column
    names via the JDBC dialect when creating the table, so they are
    case-preserved and must be matched quoted."""
    return '"' + name.replace('"', '""') + '"'


def jdbc_upsert(
    spark: SparkSession,
    updates: DataFrame,
    conn: dict[str, Any],
    table: str,
    keys: Sequence[str],
    delete_only_matched: bool = True,
) -> None:
    """S9/J7 upsert against a JDBC destination.

    1. Stage ``updates`` into ``<table>_staging`` with the distributed
       batched writer (the scale-heavy part).
    2. One transactional ``DELETE`` of matched keys + ``INSERT … SELECT``
       from staging — set-based, executed by the database engine.

    With ``delete_only_matched=False`` the DELETE removes every
    destination row whose key appears in staging *before* inserting the
    full staging set — identical, so the flag is semantic documentation;
    both paths implement merge = (existing ⟕ anti keys) ∪ updates,
    matching ``merge_frames`` (../writers.py) so parquet and JDBC sinks
    share one definition of upsert.
    """
    staging = f"{table}_staging"
    jdbc_overwrite(updates, conn, staging)
    cols = ", ".join(_qid(c) for c in updates.columns)
    # no DELETE alias: Derby rejects bare correlation names and MySQL
    # <8 rejects aliases in single-table DELETE — the unaliased
    # table-qualified form is the portable one
    key_match = " AND ".join(
        f"s.{_qid(k)} = {_tid(table)}.{_qid(k)}" for k in keys
    )
    delete_sql = (
        f"DELETE FROM {_tid(table)} WHERE EXISTS "
        f"(SELECT 1 FROM {_tid(staging)} s WHERE {key_match})"
    )
    insert_sql = (
        f"INSERT INTO {_tid(table)} ({cols}) "
        f"SELECT {cols} FROM {_tid(staging)}"
    )
    jdbc_execute(spark, conn, [delete_sql, insert_sql])
    jdbc_execute(spark, conn, [f"DROP TABLE {_tid(staging)}"], transactional=False)


def jdbc_delete_reinsert(
    spark: SparkSession,
    replacement: DataFrame,
    conn: dict[str, Any],
    table: str,
    keys: Sequence[str],
) -> None:
    """S10/J8 delete-then-reinsert refresh
    (/root/reference/sdk/migrate_assures.php:205-236): on a JDBC
    destination this is exactly the upsert plan — delete every row
    whose key appears in the replacement set, insert the replacements."""
    jdbc_upsert(spark, replacement, conn, table, keys)


def read_jdbc_table(
    spark: SparkSession, conn: dict[str, Any], table: str
) -> DataFrame:
    """Read-back helper with the same option surface (S12 +
    ``connectTimeout`` per S11)."""
    reader = spark.read.format("jdbc").option("url", conn["url"]).option(
        "dbtable", table
    )
    for k, v in conn.get("options", {}).items():
        reader = reader.option(k, str(v))
    return reader.load()


def derby_conn(name: str, home: str = "/tmp/php_etl_spark_derby") -> dict[str, Any]:
    """Connection config for an embedded in-memory Derby database —
    the test stand-in for the reference's MySQL (single-JVM only)."""
    return {
        "type": "jdbc",
        "url": f"jdbc:derby:memory:{name};create=true",
        "options": {"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
        "batchsize": 500,
    }


# PDO-driver → JDBC scheme + default port (create_dsn parity,
# /root/reference/sdk/lib/db.php:106-112: "$driver:host=$host;
# port=$port;dbname=$db;charset=$charset")
_JDBC_SCHEMES = {
    "mysql": ("mysql", 3306),
    "mariadb": ("mariadb", 3306),
    "pgsql": ("postgresql", 5432),
    "postgresql": ("postgresql", 5432),
    "sqlsrv": ("sqlserver", 1433),
    "derby": ("derby", None),
}


def create_dsn(
    host: str,
    db: str,
    driver: str = "mysql",
    port: int | None = None,
    charset: str | None = None,
) -> str:
    """S12: the reference's PDO DSN builder re-expressed as a JDBC
    URL. ``create_dsn('h', 'd', 'mysql', 3306)`` →
    ``jdbc:mysql://h:3306/d`` (+ charset as a query param where the
    driver takes one)."""
    scheme, default_port = _JDBC_SCHEMES.get(driver, (driver, None))
    p = port or default_port
    netloc = f"{host}:{p}" if p else host
    url = f"jdbc:{scheme}://{netloc}/{db}"
    if charset:
        url += f"?characterEncoding={charset}"
    return url


def connection_from_config(cfg: dict[str, Any]) -> dict[str, Any]:
    """S12: reference-style connection config (driver/host/port/dbname/
    user/password, sdk/src/SQLConnectionFactory.php:43-53) → this
    engine's JDBC connection dict. A pre-built ``url`` passes through
    (the reference likewise accepts a ready DSN,
    db.php:129 ``$dsn_or_host``)."""
    url = cfg.get("url") or create_dsn(
        cfg["host"],
        cfg.get("dbname", cfg.get("db", "")),
        cfg.get("driver", "mysql"),
        cfg.get("port"),
        cfg.get("charset"),
    )
    options = dict(cfg.get("options", {}))
    for k in ("user", "password"):
        if cfg.get(k) is not None:
            options[k] = cfg[k]
    out = {"type": "jdbc", "url": url, "options": options}
    if "batchsize" in cfg:
        out["batchsize"] = cfg["batchsize"]
    return out
