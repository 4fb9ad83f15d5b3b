"""Trained-IVF ANN guarantees the SQL oracle can't express.

``ann_ivf_kmeans_topk`` is rows-only at the driver (KMeans has no SQL
oracle), so its real contract is pinned here: seeded determinism,
recall@5 against exact brute-force ground truth, and exactness when
nprobe covers every cell.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.01"


def _queries(e):
    return e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_kmeans_centroids_deterministic(spark, sf_dir):
    from pyspark_ingestion_spark.operators.similarity import kmeans_centroids
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, kmeans_centroids(e, n_centroids=8, seed=7).collect()))
    b = sorted(map(tuple, kmeans_centroids(e, n_centroids=8, seed=7).collect()))
    assert a == b
    # sampled training path is deterministic too (hash sample, not df.sample)
    c = sorted(
        map(tuple, kmeans_centroids(e, n_centroids=4, seed=7, sample_fraction=0.5).collect())
    )
    d = sorted(
        map(tuple, kmeans_centroids(e, n_centroids=4, seed=7, sample_fraction=0.5).collect())
    )
    assert c == d


@pytest.mark.skipif(not os.path.isdir(SF001), reason="sf0.01 testdata absent")
def test_ivf_kmeans_recall_at_5(spark):
    """Trained centroids + nprobe=8/16 reach recall@5 ≥ 0.8 vs brute force."""
    from pyspark_ingestion_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, SF001, "embeddings")
    q = _queries(e)
    truth = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(e, q, k=5).collect()}
    cents = kmeans_centroids(e, n_centroids=16, seed=42)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(e, q, k=5, centroids=cents, nprobe=8).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, f"recall@5 = {recall:.3f}"


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """nprobe = n_centroids probes every cell ⇒ exactly the brute-force
    result (same rounding and tie-break) — the recall dial tops out at
    exact search, which pins both the probe join and the ranking."""
    from pyspark_ingestion_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    q = _queries(e)
    cents = kmeans_centroids(e, n_centroids=4, seed=42)
    exact = sorted(map(tuple, brute_force_topk(e, q, k=5).collect()))
    full = sorted(map(tuple, ivf_topk(e, q, k=5, centroids=cents, nprobe=4).collect()))
    assert full == exact
