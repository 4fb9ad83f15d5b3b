"""Catalog / DDL surface — native Spark SQL replacing the reference's
Athena helper (reference aws/athena.py:11-83, which templated Presto SQL
strings and shipped them to AWS).

Every operation is ``spark.sql`` against the session catalog, so parse →
analyze → optimize → execute happens in Catalyst; on a cluster the same
calls work against Hive Metastore / Glue via the usual catalog config.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_IDENT_RE = re.compile(r"^[A-Za-z0-9_]+(\.[A-Za-z0-9_]+)*$")


def _qident(name: str) -> str:
    """Validate a (possibly dotted) identifier and backtick-quote each part.

    DDL here is assembled from settings-provided names (the CLI feeds
    table names straight from JSON), so names are validated against a
    conservative pattern and quoted — a malformed or hostile name fails
    loud instead of breaking or rewriting the statement.
    """
    if not isinstance(name, str) or not _IDENT_RE.match(name):
        raise ValueError(f"invalid SQL identifier {name!r}")
    return ".".join(f"`{p}`" for p in name.split("."))


def _qlocation(location: str) -> str:
    """Escape a path for a single-quoted SQL string literal."""
    if "\n" in location or "\r" in location:
        raise ValueError(f"invalid location {location!r}")
    return location.replace("'", "''")


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
    parts = [f"CREATE TABLE {_qident(table)}", f"USING {_qident(file_format)}"]
    opts = []
    if compression:
        # same validated-interpolation rule as _qident/_qlocation: codec
        # names are plain words; anything else (e.g. a quote) would
        # rewrite the statement instead of failing loud
        if not _IDENT_RE.match(compression):
            raise ValueError(f"invalid compression codec {compression!r}")
        opts.append(f"compression '{compression}'")
    if opts:
        parts.append(f"OPTIONS ({', '.join(opts)})")
    if partition_columns:
        cols = ", ".join(_qident(c) for c in partition_columns)
        parts.append(f"PARTITIONED BY ({cols})")
    if location:
        parts.append(f"LOCATION '{_qlocation(location)}'")
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
        CREATE OR REPLACE TEMPORARY VIEW {_qident(view_name)} AS
        SELECT *,
               to_date(concat(lpad({_qident(year_col)}, 4, '0'),
                              lpad({_qident(month_col)}, 2, '0'),
                              lpad({_qident(day_col)}, 2, '0')), 'yyyyMMdd') AS partition_date
        FROM {_qident(source_table)}
        """
    )


def repair_table(spark: SparkSession, table: str) -> None:
    """MSCK REPAIR TABLE — discover partitions written outside the catalog
    (parity: reference athena.py:31-34)."""
    spark.sql(f"MSCK REPAIR TABLE {_qident(table)}")


def drop_table(spark: SparkSession, table: str, purge: bool = False) -> None:
    """DROP TABLE IF EXISTS (parity: reference athena.py:36-39; PURGE skips trash)."""
    spark.sql(f"DROP TABLE IF EXISTS {_qident(table)}" + (" PURGE" if purge else ""))


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
        f"CREATE TABLE IF NOT EXISTS {_qident(table)} USING {_qident(file_format)} "
        f"LOCATION '{_qlocation(location)}'"
    )
    try:
        spark.sql(f"MSCK REPAIR TABLE {_qident(table)}")
    except Exception as e:
        # only the "table isn't partitioned" case is benign; metastore or
        # permission failures must surface, not masquerade as an empty table
        msg = str(e).upper()
        if "PARTITION" not in msg:
            raise
    return spark.table(table)
