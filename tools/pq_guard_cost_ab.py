"""Micro A/B (r13, VERDICT r12 item 1): cost of the per-row
assert_true dim guard on the scan-side PQ encode expression.

Interleaved arms over the sf0.1 embeddings: the full ivf_pq_assign
projection (cell + codes) with expected_dim set (guarded — the
production form) vs expected_dim=None (unguarded), forced with an
aggregate so nothing driver-side dominates.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark_ingestion_spark.session import get_spark_session  # noqa: E402

spark = get_spark_session(app_name="guard-cost-ab")
from pyspark.sql import functions as F  # noqa: E402

from pyspark_ingestion_spark.operators.similarity import (  # noqa: E402
    centroid_rows_of,
    codebook_rows_of,
    ivf_cell_expr,
    kmeans_centroids,
    pq_codebooks,
    pq_codes_expr,
)
from pyspark_ingestion_spark.sources.readers import (  # noqa: E402
    load_table,
    spread_input,
)

e = load_table(spark, "/root/testdata/sf0.1", "embeddings")
d = e.select(F.size("embedding").alias("d")).first()["d"]
cents = kmeans_centroids(e, n_centroids=16, seed=42)
cb = pq_codebooks(e, n_sub=8, k_codes=32, seed=42)
c_rows, cb_rows = centroid_rows_of(cents), codebook_rows_of(cb)
ew = spread_input(e.select("vec_id", "embedding"))


def encode(expected):
    t0 = time.perf_counter()
    ew.select(
        ivf_cell_expr("embedding", c_rows).alias("cell"),
        pq_codes_expr("embedding", cb_rows, 8, expected_dim=expected).alias(
            "codes"
        ),
    ).agg(
        F.sum("cell").alias("sc"),
        F.sum(F.element_at("codes", 1)).alias("s0"),
    ).collect()
    return round(time.perf_counter() - t0, 3)


encode(d)  # warm JIT on the guarded shape
for i in range(4):
    g = encode(d)
    u = encode(None)
    print(f"pass {i}: guarded={g} unguarded={u}", flush=True)
spark.stop()
