"""Physical-plan discipline tests — the 100 TB scale contract.

Correctness says the values match; these tests pin *how* Spark executes:
filters reach the parquet scan, scans prune columns, dim joins
broadcast, hot paths contain no Python evaluation nodes.
"""

from __future__ import annotations

import pytest

from pyspark_ingestion_spark.plans.explain import (
    formatted_plan,
    has_pushed_filter,
    python_eval_nodes,
    read_schema_columns,
    shuffle_count,
    uses_broadcast_join,
)
from pyspark_ingestion_spark.queries import all_queries

_REGISTRY = all_queries()

#: queries that intentionally cross into Python (Arrow-batched decode)
_PANDAS_OK = {"multimodal_decode", "multimodal_frame_sample"}

#: queries that run/collect eagerly or stream — plan introspection n/a
_SKIP = {"ddl_ctas_roundtrip", "ddl_partitioned_lake_msck",
         "streaming_tumbling", "streaming_late_data_watermark",
         "streaming_session", "streaming_dedup_watermark",
         "streaming_stateful_user_totals"}


def test_q1_filter_pushed_and_columns_pruned(spark, sf_dir):
    df = _REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    assert has_pushed_filter(df, "l_shipdate"), formatted_plan(df)
    cols = read_schema_columns(df)
    assert "l_comment" not in cols  # not in schema at all, but guard the idea
    # only the 7 referenced columns are read, not the full 11-column table
    assert {"l_partkey", "l_suppkey", "l_orderkey"}.isdisjoint(cols), cols


def test_incremental_filter_pushed_to_scan(spark, sf_dir):
    df = _REGISTRY["p1_p2_incremental_filter"].fn(spark, sf_dir)
    # both the isNotNull guard and the watermark comparison reach the scan
    plan = formatted_plan(df)
    assert "PushedFilters" in plan and "IsNotNull" in plan, plan


def test_q5_broadcasts_dimensions(spark, sf_dir):
    df = _REGISTRY["q5_local_supplier_volume"].fn(spark, sf_dir)
    assert uses_broadcast_join(df)


def test_no_python_eval_in_native_queries(spark, sf_dir):
    offenders = {}
    for name, spec in _REGISTRY.items():
        if name in _PANDAS_OK or name in _SKIP:
            continue
        nodes = python_eval_nodes(spec.fn(spark, sf_dir))
        if nodes:
            offenders[name] = nodes
    assert not offenders, f"Python eval nodes in native pipelines: {offenders}"


def test_multimodal_uses_arrow_batches_only(spark, sf_dir):
    nodes = python_eval_nodes(_REGISTRY["multimodal_decode"].fn(spark, sf_dir))
    assert nodes == ["MapInPandas"], nodes  # Arrow-batched, not row-pickled


def test_topk_is_single_shuffle(spark, sf_dir):
    df = _REGISTRY["window_topk_per_group"].fn(spark, sf_dir)
    assert shuffle_count(df) <= 1, formatted_plan(df)


def test_real_decoder_is_explicit_stub(spark, sf_dir):
    from pyspark_ingestion_spark.operators.multimodal import _decode_real

    with pytest.raises(NotImplementedError):
        _decode_real(b"bytes")
