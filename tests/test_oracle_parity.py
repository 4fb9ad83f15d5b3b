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
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    s_cols, s_vals = _normalize(spark_cols, spark_rows)
    d_cols, d_vals = _normalize(duck_cols, duck_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_vals) == len(d_vals), f"{name}: rowcount {len(s_vals)} vs {len(d_vals)}"
    mismatches = [(a, b) for a, b in zip(s_vals, d_vals) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row diffs; first: {mismatches[:3]}"
