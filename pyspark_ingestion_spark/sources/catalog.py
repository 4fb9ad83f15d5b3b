"""Catalog / DDL surface — native Spark SQL replacing the reference's
Athena helper (reference aws/athena.py:11-83, which templated Presto SQL
strings and shipped them to AWS).

Every operation is ``spark.sql`` against the session catalog, so parse →
analyze → optimize → execute happens in Catalyst; on a cluster the same
calls work against Hive Metastore / Glue via the usual catalog config.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ctas(
    spark: SparkSession,
    table: str,
    select_statement: str,
    location: str | None = None,
    partition_columns: list[str] | None = None,
    file_format: str = "parquet",
    compression: str | None = None,
) -> None:
    """CREATE TABLE AS SELECT (parity: reference athena.py:61-74 CTAS builder).

    Spark DDL puts PARTITIONED BY / LOCATION before AS; compression
    rides as a table property understood by the datasource.
    """
    parts = [f"CREATE TABLE {table}", f"USING {file_format}"]
    opts = []
    if compression:
        opts.append(f"compression '{compression}'")
    if opts:
        parts.append(f"OPTIONS ({', '.join(opts)})")
    if partition_columns:
        parts.append(f"PARTITIONED BY ({', '.join(partition_columns)})")
    if location:
        parts.append(f"LOCATION '{location}'")
    parts.append(f"AS {select_statement}")
    spark.sql("\n".join(parts))


def cvas_partition_date(
    spark: SparkSession,
    source_table: str,
    view_name: str,
    year_col: str = "year",
    month_col: str = "month",
    day_col: str = "day",
) -> None:
    """CREATE VIEW adding a ``partition_date`` DATE column reassembled from
    string partition columns (parity: reference athena.py:77-83 —
    ``CAST(date_parse(concat(year,month,day),'%Y%m%d') AS date)``)."""
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY VIEW {view_name} AS
        SELECT *,
               to_date(concat(lpad({year_col}, 4, '0'),
                              lpad({month_col}, 2, '0'),
                              lpad({day_col}, 2, '0')), 'yyyyMMdd') AS partition_date
        FROM {source_table}
        """
    )


def repair_table(spark: SparkSession, table: str) -> None:
    """MSCK REPAIR TABLE — discover partitions written outside the catalog
    (parity: reference athena.py:31-34)."""
    spark.sql(f"MSCK REPAIR TABLE {table}")


def drop_table(spark: SparkSession, table: str, purge: bool = False) -> None:
    """DROP TABLE IF EXISTS (parity: reference athena.py:36-39; PURGE skips trash)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}" + (" PURGE" if purge else ""))


def register_lake_table(
    spark: SparkSession,
    table: str,
    location: str,
    file_format: str = "parquet",
) -> DataFrame:
    """Register an existing partitioned lake directory as an external table
    and discover its partitions — the read-side of the lake layout the
    ingestion pipeline writes."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} USING {file_format} LOCATION '{location}'"
    )
    try:
        spark.sql(f"MSCK REPAIR TABLE {table}")
    except Exception as e:
        # only the "table isn't partitioned" case is benign; metastore or
        # permission failures must surface, not masquerade as an empty table
        msg = str(e).upper()
        if "PARTITION" not in msg:
            raise
    return spark.table(table)
