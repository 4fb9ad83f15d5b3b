"""Spark session factory.

Replaces the reference's session factories
(reference ``pyspark_ingestion/spark.py:10-48``) which hardcoded 8g
memory, ``spark.sql.shuffle.partitions=40`` and a JDBC driver classpath.
Modern equivalents: AQE handles shuffle-partition sizing at runtime, the
session timezone is pinned to UTC so timestamp semantics are stable
across engines, and Arrow is enabled for any pandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark_session(
    app_name: str = "pyspark-ingestion-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    At 100 TB scale the same conf works under YARN/K8s masters: AQE
    coalesces shuffle partitions and handles skew joins, dynamic
    partition overwrite makes incremental re-runs idempotent, and the
    broadcast threshold lets Catalyst pick broadcast-hash joins for dim
    tables automatically.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # same truthiness + integer guard as the master branch: an empty
        # or non-numeric SPARK_GRAFT_CPUS (e.g. '' or '*') must fall back,
        # not crash int() before the session even builds
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # parquet timestamps without isAdjustedToUTC read as plain TIMESTAMP
        # (UTC instants, since the session TZ is pinned) rather than
        # TIMESTAMP_NTZ — keeps unix_millis/window/watermark semantics uniform
        # regardless of which writer produced the lake files
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # lake layout parity: YEAR=/MONTH=/WEEK= partition values stay strings
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
