"""Local replica of the driver's correctness gate.

For every registered query with an oracle: run the Spark DataFrame and
the DuckDB SQL on the same parquet tables, then compare row count,
column names, and order-insensitive values (floats to 9 sig digits so
legitimate cross-engine last-bit noise doesn't flag; queries are
expected to round their aggregates anyway).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from pyspark_ingestion_spark.queries import all_queries
from pyspark_ingestion_spark.sources.readers import TABLES

_SPECS = sorted(all_queries().items())


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return 0.0
        return round(v, 9 - int(math.floor(math.log10(abs(v)))) - 1) if abs(v) > 1e-300 else 0.0
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def _pandas_kind(values):
    """Emulate the pandas dtype kind a column of collected cells gets
    under a toPandas/duckdb-.df() conversion: ints stay 'i' only while
    null-free; any null or float makes the column 'f'. The driver
    compares results through pandas, so an int64-vs-float64 split
    between Spark and DuckDB (e.g. a DuckDB HUGEINT aggregate) hashes
    '3' vs '3.0' and fails even when the values are equal."""
    import decimal

    kind, saw_null = None, False
    for v in values:
        if v is None:
            saw_null = True
        elif isinstance(v, bool):
            return None  # bools never coerce against numerics here
        elif isinstance(v, int):
            kind = kind or "i"
        elif isinstance(v, (float, decimal.Decimal)):
            kind = "f"
        else:
            return None  # non-numeric column — not a coercion hazard
    if kind == "i" and saw_null:
        kind = "f"
    return kind


def _driver_pandas_hazards(name, sdf, spark_rows, duck_pdf):
    """Checks that replicate how the driver (not our fetchall-based
    compare) sees a result: via pandas DataFrames."""
    from pyspark.sql import types as T

    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name}: complex-typed output columns {complex_cols} — the driver's "
        "pandas row-sort raises 'unhashable type' on array/map/struct cells; "
        "flatten to scalar columns"
    )

    cols = list(sdf.columns)
    for i, col in enumerate(cols):
        if col not in duck_pdf.columns:
            continue
        s_kind = _pandas_kind([r[i] for r in spark_rows])
        d_dtype = duck_pdf[col].dtype
        d_kind = d_dtype.kind if d_dtype.kind in ("i", "u", "f") else None
        if d_kind == "u":
            d_kind = "i"
        if s_kind and d_kind and s_kind != d_kind:
            raise AssertionError(
                f"{name}.{col}: Spark pandas kind '{s_kind}' vs DuckDB dtype "
                f"{d_dtype} — equal values would still hash-mismatch in the "
                "driver (int 3 vs float 3.0); CAST the oracle (or the query) "
                "so both sides land on the same pandas dtype"
            )


@pytest.mark.parametrize("name,spec", _SPECS, ids=[n for n, _ in _SPECS])
def test_query_matches_oracle(name, spec, spark, sf_dir):
    sdf = spec.fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    if spec.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert isinstance(spark_rows, list)
        return

    con = _duck_con(sf_dir)
    duck_pdf = con.execute(spec.oracle).df()
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    _driver_pandas_hazards(name, sdf, spark_rows, duck_pdf)

    s_cols, s_vals = _normalize(spark_cols, spark_rows)
    d_cols, d_vals = _normalize(duck_cols, duck_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_vals) == len(d_vals), f"{name}: rowcount {len(s_vals)} vs {len(d_vals)}"
    mismatches = [(a, b) for a, b in zip(s_vals, d_vals) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row diffs; first: {mismatches[:3]}"


# ---------------------------------------------------------------------------
# Driver-session replica: the driver's SparkSession does NOT disable parquet
# TIMESTAMP_NTZ inference (our get_spark_session does), so event-time columns
# arrive as TIMESTAMP_NTZ there. Everything touching withWatermark /
# unix_millis must cope. Round 2 lost 3 streaming queries to exactly this.
# ---------------------------------------------------------------------------

_NTZ_SENSITIVE = [
    "streaming_tumbling",
    "streaming_session",
    "streaming_late_data_watermark",
    "streaming_dedup_watermark",
    "streaming_stream_stream_join",
    "streaming_stateful_user_totals",
    "streaming_static_join",
    "funnel_view_to_purchase",
    "join_asof",
    "join_range",
    "window_time_range_agg",
    "scd2_user_state",
    "interpolate_linear",
    "cep_view_click_purchase",
    "ewma_user_value",
    "join_point_in_time",
    "join_point_in_time_asof",
    "join_asof_nearest",
]


@pytest.mark.parametrize("name", [n for n in _NTZ_SENSITIVE if n in dict(_SPECS)])
def test_query_runs_under_ntz_inference(name, spark, sf_dir):
    spec = dict(_SPECS)[name]
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        rows = spec.fn(spark, sf_dir).collect()
        assert isinstance(rows, list)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
