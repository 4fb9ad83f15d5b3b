"""Queries pinning the reference's operator semantics (SURVEY §2.3-2.4).

The reference's fixture tables (SAP date/time strings, email columns)
don't exist in the driver testdata, so each query *derives* the
reference-shaped input from the star schema first (e.g. formats
``o_orderdate`` into SAP ``'yyyyMMdd'``/``'HHmmss'`` strings), then
applies the native operator under test. Both sides of the derivation are
SQL-expressible, so the DuckDB oracle checks end-to-end values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_ingestion_spark.functions.scalar import (
    iso_week_string,
    month_string,
    partition_date,
    sap_timestamp,
    sha256_pseudonymize,
    stringify,
    year_string,
)
from pyspark_ingestion_spark.queries import query
from pyspark_ingestion_spark.sources.readers import load_table

#: mid-range watermark used by the incremental-filter queries (P2)
WATERMARK = "2024-01-15 00:00:00"


@query(
    "f1_sap_timestamp",
    oracle="""
    SELECT
        o_orderkey,
        strftime(o_orderdate, '%Y%m%d') AS erdat,
        strftime(o_orderdate, '%H%M%S') AS erzet,
        CAST(strptime(strftime(o_orderdate, '%Y%m%d') || strftime(o_orderdate, '%H%M%S'),
                      '%Y%m%d%H%M%S') AS TIMESTAMP) AS ts_ref
    FROM orders
    """,
)
def f1_sap_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — SAP composite date+time strings → timestamp (reference config.py:18-36).

    Derives the SAP-shaped string columns, then parses them back with the
    native ``to_timestamp(concat(...))`` rewrite of the reference's
    ``custom_date`` Python UDF.
    """
    o = load_table(spark, sf_dir, "orders")
    shaped = o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd").alias("erdat"),
        F.date_format("o_orderdate", "HHmmss").alias("erzet"),
    )
    return shaped.withColumn("ts_ref", sap_timestamp("erdat", "erzet"))


@query(
    "f2_f3_year_month_partitions",
    oracle="""
    SELECT
        o_orderkey,
        CAST(year(o_orderdate)  AS VARCHAR) AS year,
        CAST(month(o_orderdate) AS VARCHAR) AS month
    FROM orders
    """,
)
def f2_f3_year_month_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3 — YEAR/MONTH partition strings, non-zero-padded (reference config.py:38-39)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        year_string("o_orderdate").alias("year"),
        month_string("o_orderdate").alias("month"),
    )


@query(
    "f4_iso_week_partitions",
    oracle="""
    SELECT
        event_id,
        CAST(year(ts) AS VARCHAR) AS year,
        CAST(weekofyear(ts) AS VARCHAR) AS week
    FROM events
    """,
)
def f4_iso_week_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — ISO week partition string, the c1 system's YEAR/WEEK layout (reference config.py:89-92)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        year_string("ts").alias("year"),
        iso_week_string("ts").alias("week"),
    )


@query(
    "f5_sha256_pseudonymize",
    oracle="""
    SELECT
        c_custkey,
        sha256(c_name) AS name_sha,
        sha256(CASE WHEN c_custkey % 20 = 0 THEN NULL ELSE c_name END) AS name_sha_nullsafe
    FROM customer
    """,
)
def f5_sha256_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — SHA-256 PII pseudonymization, NULL-safe (reference config.py:68-77).

    The second column hashes a ~5%-NULL variant to pin NULL→NULL.
    """
    c = load_table(spark, sf_dir, "customer")
    nullable = F.when(F.col("c_custkey") % 20 == 0, F.lit(None)).otherwise(F.col("c_name"))
    return c.select(
        "c_custkey",
        sha256_pseudonymize("c_name").alias("name_sha"),
        sha256_pseudonymize(nullable).alias("name_sha_nullsafe"),
    )


@query(
    "f6_stringify_cast",
    oracle="""
    SELECT
        c_custkey,
        CAST(c_acctbal > 0 AS VARCHAR) AS is_pro,
        CAST(c_nationkey AS VARCHAR)   AS nation_str
    FROM customer
    """,
)
def f6_stringify_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — stringify cast; booleans render 'true'/'false' (reference config.py:81-85)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        stringify(F.col("c_acctbal") > 0).alias("is_pro"),
        stringify("c_nationkey").alias("nation_str"),
    )


@query(
    "p1_p2_incremental_filter",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE ts IS NOT NULL
      AND ts > TIMESTAMP '{WATERMARK}'
    """,
)
def p1_p2_incremental_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2 — NOT NULL guard + incremental watermark predicate.

    Parity: reference ingestion.py:54 (isNotNull) + config.py:37,52,88
    (``ref > last_value``). Both predicates are UDF-free, so they push
    all the way into the source scan (SURVEY §4 O-GAP1 — the headline
    efficiency win: at 100 TB only new rows are ever read).
    """
    e = load_table(spark, sf_dir, "events")
    return e.filter(
        F.col("ts").isNotNull() & (F.col("ts") > F.lit(WATERMARK).cast("timestamp"))
    ).select("event_id", "ts", "user_id", "event_type")


@query(
    "p3_column_projection",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def p3_column_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — columns_to_import projection (reference config.py:63-66); prunes the scan."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name", "c_mktsegment")


@query(
    "a1_max_watermark",
    oracle="""
    SELECT strftime(max(ts), '%Y-%m-%dT%H:%M:%S.%fZ') AS ref_last_value
    FROM events
    """,
)
def a1_max_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+F7 — MAX(ref) formatted as the sync-file watermark string.

    Parity: reference ingestion.py:89-95 + constants.py:26 format
    ``%Y-%m-%dT%H:%M:%S.%fZ`` (6-digit microseconds).
    """
    e = load_table(spark, sf_dir, "events")
    return e.agg(
        F.date_format(F.max("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("ref_last_value")
    )


@query(
    "a2_count_new_rows",
    oracle=f"SELECT count(*) AS n_new FROM events WHERE ts > TIMESTAMP '{WATERMARK}'",
)
def a2_count_new_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 — batch-size count / emptiness gate (reference ingestion.py:73-77)."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("ts") > F.lit(WATERMARK).cast("timestamp")).agg(
        F.count(F.lit(1)).alias("n_new")
    )


@query(
    "f8_partition_date_view",
    oracle="""
    SELECT
        l_orderkey,
        l_linenumber,
        CAST(strptime(lpad(CAST(year(l_shipdate) AS VARCHAR), 4, '0')
                   || lpad(CAST(month(l_shipdate) AS VARCHAR), 2, '0')
                   || lpad(CAST(day(l_shipdate) AS VARCHAR), 2, '0'), '%Y%m%d') AS DATE)
            AS partition_date
    FROM lineitem
    """,
)
def f8_partition_date_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/K6 — CVAS partition_date view: string partition cols → DATE.

    Parity: reference athena.py:77-83
    (``CAST(date_parse(concat(year,month,day),'%Y%m%d') AS date)``),
    rebuilt from the non-padded partition strings the lake layout uses.
    """
    l = load_table(spark, sf_dir, "lineitem")
    shaped = l.select(
        "l_orderkey",
        "l_linenumber",
        year_string("l_shipdate").alias("year"),
        month_string("l_shipdate").alias("month"),
        F.dayofmonth("l_shipdate").cast("string").alias("day"),
    )
    return shaped.select(
        "l_orderkey",
        "l_linenumber",
        partition_date("year", "month", "day").alias("partition_date"),
    )
