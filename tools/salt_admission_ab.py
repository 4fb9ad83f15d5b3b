"""A/B: cross-side admission bucket caps — drop vs salt vs uncapped.

Measures `incremental_lsh_rejects` on a corpus carrying a PLANTED
popular near-dup cluster (every band bucket the cluster touches is
oversized at the cap) against a batch containing both novel docs and
near-dups of the cluster. Three arms per run:

- uncapped (`max_bucket_size=None`) — exact recall, per-doc candidate
  work LINEAR in the cluster size (the quadratic the cap exists for);
- drop (`bucket_cap_mode="drop"`) — bounded work, but the planted
  near-dups sail through admission (every shared bucket dropped);
- salt (`bucket_cap_mode="salt"`, r12) — bounded work AND recovered
  recall: corpus buckets salt-split into ceil(n/cap) sub-buckets, each
  batch doc probes `min(n_salts, probe_salts)` of them.

Reported per arm: planted-near-dup recall (x/planted), total rejects,
and warm wall-clock. The r12 SCALING.md row (20k corpus, 2,000-doc
cluster, cap=16, probe_salts=4: drop 0/50 @ 4.4 s, salt 50/50 @ 7.1 s,
uncapped 50/50 @ 8.8 s) came from this harness's defaults.

Run: python tools/salt_admission_ab.py [corpus_n] [cluster_n] [batch_n] [planted_n] [cap] [probe_salts]
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


def main() -> None:
    corpus_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    cluster_n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    batch_n = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    planted_n = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    cap = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    probe_salts = int(sys.argv[6]) if len(sys.argv) > 6 else 4

    from pyspark_ingestion_spark.operators.dedup import incremental_lsh_rejects
    from pyspark_ingestion_spark.session import get_spark_session

    spark = get_spark_session(app_name="salt-admission-ab")
    words = [f"w{i}" for i in range(8000)]
    cluster_text = " ".join(random.Random(7).choices(words, k=40))

    def docs(nn, seed, start):
        r = random.Random(seed)
        return [
            (i, " ".join(r.choices(words, k=40)))
            for i in range(start, start + nn)
        ]

    tmp = tempfile.mkdtemp(prefix="salt_ab_")
    try:
        corpus_rows = [(i, cluster_text) for i in range(cluster_n)] + docs(
            corpus_n - cluster_n, 5, cluster_n
        )
        spark.createDataFrame(
            corpus_rows, "doc_id long, text string"
        ).repartition(8).write.mode("overwrite").parquet(f"{tmp}/corpus")
        corpus = spark.read.parquet(f"{tmp}/corpus")
        batch_rows = docs(batch_n, 99, 10 * corpus_n) + [
            (20 * corpus_n + i, cluster_text) for i in range(planted_n)
        ]
        batch = spark.createDataFrame(
            batch_rows, "doc_id long, text string"
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
                    r["doc_id"]
                    for r in incremental_lsh_rejects(
                        corpus, batch, "doc_id", "text", n=3, num_hashes=8,
                        band_size=2, threshold_num=1, threshold_den=2,
                        max_doc_freq=None, **kw
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
