"""Table profiling — ANALYZE-style column statistics in one pass.

An ingestion engine that lands tables into a lake needs per-column
statistics: row/null/distinct counts and min/max bounds (the min/max of
the reference's ``ref_column`` IS its incremental watermark, cf.
/root/reference/pyspark_ingestion/ingestion/ingestion.py:62-78 which
computes ``F.max`` of the reference column after load). Profiling also
feeds partition sizing and join-strategy decisions at 100 TB.

Everything is computed in ONE aggregation pass: Spark plans multiple
``count_distinct`` columns via an Expand node (k-fold row multiplication
before the partial aggregate), so the input is still scanned once —
preferable to k separate jobs. Profile k is per-call bounded (profile
the columns you need, not SELECT *).

Min/max are surfaced as strings so one long-format result covers
heterogeneous column types; callers needing typed bounds query the
column directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One row of statistics per requested column.

    Returns (column_name, n_rows, n_nonnull, n_distinct, min_value,
    max_value) — min/max cast to string. Single aggregation job; the
    long format comes from an explode over the one aggregated row.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows"),
            F.col(f"__nn_{c}").alias("n_nonnull"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        for c in columns
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
