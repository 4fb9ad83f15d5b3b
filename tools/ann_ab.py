"""ANN tier A/B at 100k vectors: brute force vs sign-bucket LSH vs
trained IVF (MLlib KMeans centroids) — query throughput AND recall@5,
so the recall/compute trade of each tier is a measured fact rather than
a docstring claim. Results recorded in SCALING.md.

Run: python tools/ann_ab.py [n_vectors]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from tools.stress_scale import make_embeddings
    from pyspark_ingestion_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
        sign_bucket_topk,
    )
    from pyspark_ingestion_spark.session import get_spark_session

    spark = get_spark_session(app_name="ann-ab")
    spark.sparkContext.setLogLevel("ERROR")

    e = make_embeddings(spark, n).persist()
    e.count()
    queries = e.filter(F.col("vec_id") % 500 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).persist()
    nq = queries.count()
    print(f"corpus={n:,} queries={nq}", flush=True)

    def run(label, thunk):
        t0 = time.perf_counter()
        res = thunk().select("query_id", "neighbor_id").persist()
        res.count()
        dt = time.perf_counter() - t0
        return label, res, dt

    tiers = [run("brute force (exact)", lambda: brute_force_topk(e, queries, k=5))]
    truth = tiers[0][1]
    tiers.append(run("sign-bucket LSH (8 bits)",
                     lambda: sign_bucket_topk(e, queries, k=5, n_dims=8)))

    t0 = time.perf_counter()
    cents = kmeans_centroids(e, n_centroids=64, sample_fraction=0.1).persist()
    cents.count()
    fit = time.perf_counter() - t0
    print(f"kmeans fit (64 centroids, 10% sample): {fit:.1f}s  (one-off per corpus generation)",
          flush=True)
    for nprobe in (1, 4):
        tiers.append(run(f"trained IVF (64 cells, nprobe={nprobe})",
                         lambda np=nprobe: ivf_topk(e, queries, k=5, centroids=cents,
                                                    nprobe=np)))

    # production layout: corpus cells precomputed once at ingest
    from pyspark_ingestion_spark.operators.similarity import assign_ivf_cells
    t0 = time.perf_counter()
    e_cells = assign_ivf_cells(e, cents, "vec_id", "embedding").persist()
    e_cells.count()
    print(f"corpus cell assignment (one-off at ingest): {time.perf_counter()-t0:.1f}s",
          flush=True)
    tiers.append(run("trained IVF nprobe=1, pre-assigned corpus",
                     lambda: ivf_topk(e_cells, queries, k=5, centroids=cents, nprobe=1, preassigned=True)))

    # IVF-PQ: codebook fit + corpus encode are one-offs at ingest; the
    # query tier scores codes only (asymmetric distance), never vectors
    from pyspark_ingestion_spark.operators.similarity import ivf_pq_topk, pq_codebooks, pq_encode
    t0 = time.perf_counter()
    cb = pq_codebooks(e, n_sub=16, k_codes=32, sample_fraction=0.1).persist()
    cb.count()
    print(f"pq codebook fit (16x32, 10% sample): {time.perf_counter()-t0:.1f}s  (one-off)",
          flush=True)
    t0 = time.perf_counter()
    e_pq = e_cells.select("vec_id", "cell").join(
        pq_encode(e, cb, n_sub=16), "vec_id").persist()
    e_pq.count()
    print(f"pq corpus encode (one-off at ingest): {time.perf_counter()-t0:.1f}s", flush=True)
    for nprobe in (4, 16):
        tiers.append(run(f"IVF-PQ (64 cells, 16x32 codes, nprobe={nprobe})",
                         lambda np=nprobe: ivf_pq_topk(
                             e_pq, queries, cents, cb, k=5, nprobe=np,
                             n_sub=16, k_codes=32, preassigned=True)))
    # exact re-rank over the PQ candidate pool: the production recall fix
    e_pq_v = e_pq.join(e, "vec_id").persist()
    e_pq_v.count()
    tiers.append(run("IVF-PQ nprobe=16 + exact rerank(50)",
                     lambda: ivf_pq_topk(
                         e_pq_v, queries, cents, cb, k=5, nprobe=16,
                         n_sub=16, k_codes=32, preassigned=True, rerank=50)))

    n_truth = truth.count()
    for label, res, dt in tiers:
        hits = truth.join(res, ["query_id", "neighbor_id"]).count()
        print(f"  {label:<34s} {dt:6.2f}s  recall@5={hits/n_truth:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
