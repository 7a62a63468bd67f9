"""SparkSession factory with scale-oriented defaults.

The reference engine has no runtime tuning beyond hard-coded batch
sizes (/root/reference/sdk/process.php:137 batches 500 keys per
worker process). Here partitioning/parallelism is Spark's job; we
pick defaults that hold from local[32] tests up to a large cluster:
AQE on (runtime coalescing + skew-join splitting), a shuffle
partition count sized to the local core count but overridable, and
Arrow enabled for the few pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "php-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults are chosen for scale-out behavior:

    - ``spark.sql.adaptive.enabled``: runtime re-planning — coalesces
      tiny shuffle partitions, converts sort-merge to broadcast when a
      side turns out small, splits skewed partitions.
    - ``spark.sql.adaptive.skewJoin.enabled``: the salting fallback the
      reference never needed (its "partitioner" was a 500-key batch
      spawner, /root/reference/sdk/process.php:129-147).
    - Arrow for pandas UDF exchange (vectorized Python boundary).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # local mode defaults to a 1 GiB JVM heap — far too small for
        # 32 concurrent tasks; static conf, applies on first creation
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")
        )
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); Spark ≥4.x reads it
        # as TIMESTAMP_NTZ (the legacy nanosAsLong conf is a no-op
        # there) and the catalog normalizes it to TimestampType.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if os.environ.get("SPARK_GRAFT_METRICS") and not getattr(
        spark, "_php_etl_stream_metrics", False
    ):
        # O6 observability: stream progress (per-batch rows/sec) into
        # the metrics JSONL alongside the runner's per-table records.
        # getOrCreate reuses sessions — attach once, not per call.
        from php_etl_spark.observability import attach_streaming_metrics

        attach_streaming_metrics(spark)
        spark._php_etl_stream_metrics = True
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship the engine package to Python workers (``addPyFile`` — the
    runtime form of ``spark-submit --py-files``). Executors unpickle
    UDF closures that reference module-level helpers by module path;
    without this, a driver running from another directory hits
    ``ModuleNotFoundError: php_etl_spark`` inside mapInPandas."""
    import zipfile

    import php_etl_spark

    pkg_dir = os.path.dirname(os.path.abspath(php_etl_spark.__file__))
    zip_path = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "php_etl_spark_pyfiles.zip"
    )
    newest_src = max(
        (
            os.path.getmtime(os.path.join(root, fn))
            for root, _dirs, files in os.walk(pkg_dir)
            for fn in files
            if fn.endswith(".py")
        ),
        default=0.0,
    )
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < newest_src:
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        arc = os.path.join(
                            "php_etl_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, arc)
        os.replace(tmp, zip_path)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception as exc:  # noqa: BLE001 — inspect, don't swallow
        # re-adding the same zip in one session is benign; anything
        # else (stopped context, unreadable zip) silently disabling
        # worker shipping would resurface ModuleNotFoundError in
        # executors — surface it
        msg = str(exc).lower()
        if "already" in msg and ("registered" in msg or "added" in msg or "exists" in msg):
            return
        raise


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine runtime confs to an externally-created session.

    The verification driver hands us its own SparkSession; settable
    runtime confs are applied here so catalog reads behave the same.
    """
    _ship_package(spark)
    for k, v in [
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS)),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — catalog has a fallback
    return spark
