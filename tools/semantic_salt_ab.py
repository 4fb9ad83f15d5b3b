"""A/B: SEMANTIC cross-side admission bucket caps — drop vs salt vs
uncapped (r13, VERDICT r12 item 3; the embedding twin of
salt_admission_ab.py).

Measures `embedding_batch_rejects` on a corpus carrying a PLANTED
popular semantic cluster — cluster vectors share one sign bucket and
sit at cosine ~1 of each other (the post-ReLU/biased-embedding
degeneracy the cap exists for) — against a batch of novel vectors plus
near-cluster ones. Three arms per run:

- uncapped — exact recall, per-batch-doc candidate work LINEAR in the
  cluster size;
- drop (`bucket_cap_mode="drop"`) — bounded work, but the planted
  near-dups sail through admission (their whole bucket dropped);
- salt (`bucket_cap_mode="salt"`) — bounded work AND recovered recall:
  the bucket salt-splits into ceil(n/cap) sub-buckets, each batch doc
  probes `min(n_salts, probe_salts)` of them.

Reported per arm: planted-near-dup recall, total rejects, warm
wall-clock.

Run: python tools/semantic_salt_ab.py [corpus_n] [cluster_n] [batch_n] [planted_n] [cap] [probe_salts]
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DIM = 16


def main() -> None:
    corpus_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cluster_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    batch_n = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    planted_n = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    cap = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    probe_salts = int(sys.argv[6]) if len(sys.argv) > 6 else 4

    from pyspark_ingestion_spark.operators.similarity import (
        embedding_batch_rejects,
    )
    from pyspark_ingestion_spark.session import get_spark_session

    spark = get_spark_session(app_name="semantic-salt-ab")
    base = [float(2 + (i % 5)) for i in range(DIM)]

    def near_cluster(r):
        # tiny positive-preserving jitter: same sign bucket, cosine ~1
        return [v + r.uniform(-0.05, 0.05) for v in base]

    def novel(r):
        return [r.uniform(-4.0, 4.0) for _ in range(DIM)]

    tmp = tempfile.mkdtemp(prefix="semantic_salt_ab_")
    try:
        rc = random.Random(5)
        corpus_rows = [(i, near_cluster(rc)) for i in range(cluster_n)] + [
            (i, novel(rc)) for i in range(cluster_n, corpus_n)
        ]
        spark.createDataFrame(
            corpus_rows, "vec_id long, embedding array<double>"
        ).repartition(8).write.mode("overwrite").parquet(f"{tmp}/corpus")
        corpus = spark.read.parquet(f"{tmp}/corpus")
        rb = random.Random(99)
        batch_rows = [(10 * corpus_n + i, novel(rb)) for i in range(batch_n)] + [
            (20 * corpus_n + i, near_cluster(rb)) for i in range(planted_n)
        ]
        batch = spark.createDataFrame(
            batch_rows, "vec_id long, embedding array<double>"
        ).coalesce(2)
        planted = {20 * corpus_n + i for i in range(planted_n)}

        arms = [
            ("uncapped", {}),
            ("drop", dict(max_bucket_size=cap)),
            ("salt", dict(max_bucket_size=cap, bucket_cap_mode="salt",
                          probe_salts=probe_salts)),
        ]
        for name, kw in arms:
            for _ in range(2):  # second run = warm (JIT + footer caches)
                t0 = time.perf_counter()
                got = {
                    r["vec_id"]
                    for r in embedding_batch_rejects(
                        corpus, batch, threshold=0.95, n_dims=8, **kw
                    ).collect()
                }
                sec = time.perf_counter() - t0
            print(
                f"{name:9s} rejects={len(got):4d} "
                f"planted_recall={len(got & planted)}/{planted_n} "
                f"warm_sec={sec:.2f}"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
