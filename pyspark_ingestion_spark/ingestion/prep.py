"""Per-source-system preparation pipelines.

Parity: reference ``config.py:14-105`` — each source system gets a
``prepare(df, table_settings, sync) -> (df, partition_columns)`` step
that derives the incremental-reference column, applies the watermark
filter, derives partition columns, and applies PII treatment. The
reference did all of this with row-at-a-time Python UDFs; every
derivation here is a native Column expression, which keeps the watermark
predicate pushdown-eligible (SURVEY §4 O-GAP1/O-GAP2) — the difference
between scanning new rows vs. the whole source at 100 TB.

Systems (names follow the reference):
- ``sap``  — composite 'yyyyMMdd'+'HHmmss' string date/time → ref
  timestamp; YEAR/MONTH partitions (reference config.py:14-43)
- ``lims`` — ref column already a timestamp; YEAR/MONTH partitions
  (reference config.py:46-56)
- ``c1``   — column projection, watermark on LASTMODIFIEDDATE,
  email SHA-256, boolean stringify, YEAR/WEEK partitions
  (reference config.py:59-92)
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_ingestion_spark.functions.scalar import (
    iso_week_string,
    month_string,
    sap_timestamp,
    sha256_pseudonymize,
    stringify,
    year_string,
)
from pyspark_ingestion_spark.ingestion.watermark import Watermark

YEAR_COL = "YEAR"
MONTH_COL = "MONTH"
WEEK_COL = "WEEK"


@dataclass
class TableSettings:
    """Declarative per-table settings (reference constants.py:9-24 keys)."""

    ref_column: str
    ref_first_value: str = "1970-01-01T00:00:00.000000Z"
    date_column: str | None = None
    time_column: str | None = None
    columns_to_import: list[str] | None = None
    pii_sha256_columns: list[str] = field(default_factory=list)
    stringify_columns: list[str] = field(default_factory=list)
    fetchsize: int = 10_000


PrepResult = tuple[DataFrame, list[str]]
PrepFn = Callable[[DataFrame, TableSettings, Watermark], PrepResult]


def _watermark_filter(df: DataFrame, ref: str, wm: Watermark) -> DataFrame:
    """P1+P2: drop NULL refs, keep rows strictly above the last watermark.

    Both predicates are UDF-free so Catalyst pushes them into the source
    scan (JDBC WHERE clause / parquet row-group stats).
    """
    boundary: dt.datetime = wm.as_datetime()
    return df.filter(F.col(ref).isNotNull() & (F.col(ref) > F.lit(boundary)))


def prepare_sap(df: DataFrame, ts: TableSettings, wm: Watermark) -> PrepResult:
    """SAP: derive ref timestamp from date+time strings, YEAR/MONTH partitions."""
    if not (ts.date_column and ts.time_column):
        raise ValueError("sap preparation requires date_column and time_column")
    out = df.withColumn(ts.ref_column, sap_timestamp(ts.date_column, ts.time_column))
    out = _watermark_filter(out, ts.ref_column, wm)
    out = out.withColumn(YEAR_COL, year_string(ts.ref_column)).withColumn(
        MONTH_COL, month_string(ts.ref_column)
    )
    return out, [YEAR_COL, MONTH_COL]


def prepare_lims(df: DataFrame, ts: TableSettings, wm: Watermark) -> PrepResult:
    """LIMS: ref is already a timestamp; YEAR/MONTH partitions.

    Partitions derive from ``ts.date_column`` when set, falling back to
    the ref column — the reference filters on ref_column but lays the
    lake out on the settings' DATE_COLUMN (reference config.py:48-55),
    and the two may differ.
    """
    out = _watermark_filter(df, ts.ref_column, wm)
    part_src = ts.date_column or ts.ref_column
    out = out.withColumn(YEAR_COL, year_string(part_src)).withColumn(
        MONTH_COL, month_string(part_src)
    )
    return out, [YEAR_COL, MONTH_COL]


def prepare_c1(df: DataFrame, ts: TableSettings, wm: Watermark) -> PrepResult:
    """C1: projection → watermark → PII sha256 → stringify → YEAR/WEEK partitions."""
    out = df
    if ts.columns_to_import:
        out = out.select(*ts.columns_to_import)
    out = _watermark_filter(out, ts.ref_column, wm)
    for c in ts.pii_sha256_columns:
        if c in out.columns:
            out = out.withColumn(c, sha256_pseudonymize(c))
    for c in ts.stringify_columns:
        if c in out.columns:
            out = out.withColumn(c, stringify(c))
    out = out.withColumn(YEAR_COL, year_string(ts.ref_column)).withColumn(
        WEEK_COL, iso_week_string(ts.ref_column)
    )
    return out, [YEAR_COL, WEEK_COL]


#: system → preparation dispatch (reference config.py:100-105)
PREP_REGISTRY: dict[str, PrepFn] = {
    "sap": prepare_sap,
    "lims": prepare_lims,
    "c1": prepare_c1,
}


def prepare(system: str, df: DataFrame, ts: TableSettings, wm: Watermark) -> PrepResult:
    try:
        fn = PREP_REGISTRY[system]
    except KeyError:
        raise ValueError(f"unknown system {system!r}; known: {sorted(PREP_REGISTRY)}")
    return fn(df, ts, wm)
