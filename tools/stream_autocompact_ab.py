"""A/B: hotlog streaming admission over a LONG stream — in-sink
auto-compaction vs never compacting.

The hotlog index accumulates one partition per batch in three tables
(bands / dfcnt / hot); without compaction the per-batch read path pays
`_read_latest_bands`' version-depth max over every partition and
`_apply_hot_transitions`' scan of O(batches) dfcnt delta partitions —
costs that grow with stream LENGTH, not batch size. The `compact_every`
sink folds them back into the base partition every N committed batches,
inside the same foreachBatch serialization domain, so per-batch cost
should stay FLAT. This harness measures exactly that: same batches, same
admission results, one arm compacting every N batches (the compaction
time is charged to the batch that runs it, as in the real sink), one arm
never compacting. Results recorded in SCALING.md.

Run: python tools/stream_autocompact_ab.py [corpus_n] [batches] [batch_rows] [words_per_doc] [compact_every]
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

WORDS = [f"w{i}" for i in range(8000)]


def make_rows(n, seed, start=0, k=40):
    rnd = random.Random(seed)
    rows = []
    for i in range(start, start + n):
        body = " ".join(rnd.choices(WORDS, k=k))
        rows.append((i, body))
        if rnd.random() < 0.05 and rows:
            ws = rows[rnd.randrange(len(rows))][1].split()
            ws[rnd.randrange(len(ws))] = rnd.choice(WORDS)
            rows.append((i + 1_000_000, " ".join(ws)))
    return rows


def main():
    corpus_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    words_per_doc = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    every = int(sys.argv[5]) if len(sys.argv) > 5 else 8

    from pyspark_ingestion_spark.operators.dedup import release_shingle_caches
    from pyspark_ingestion_spark.session import get_spark_session
    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_dedup_batch_indexed,
        compact_admission_index,
    )

    spark = get_spark_session(app_name="stream-autocompact-ab")
    spark.sparkContext.setLogLevel("ERROR")
    kwargs = dict(id_col="doc_id", text_col="text", n=3, num_hashes=8,
                  band_size=2, threshold_num=1, threshold_den=2,
                  max_doc_freq=25, max_bucket_size=None, index_mode="hotlog")
    base_dir = "/tmp/stream_autocompact_ab"
    shutil.rmtree(base_dir, ignore_errors=True)
    spark.createDataFrame(
        make_rows(corpus_n, seed=5, k=words_per_doc),
        "doc_id long, text string",
    ).repartition(32).write.mode("overwrite").parquet(f"{base_dir}/base")
    base = spark.read.parquet(f"{base_dir}/base")
    batches = [
        spark.createDataFrame(
            make_rows(batch_rows, seed=100 + b, start=corpus_n + b * 10_000,
                      k=words_per_doc),
            "doc_id long, text string",
        ).coalesce(4).persist()
        for b in range(n_batches)
    ]
    for b in batches:
        b.count()

    print(f"== hotlog, corpus n={corpus_n:,}, {n_batches} batches x "
          f"~{batch_rows}, {words_per_doc} words/doc, compact_every={every}",
          flush=True)
    times = {}
    for arm in ("none", "auto"):
        out = f"{base_dir}/out_{arm}"
        idx = f"{base_dir}/index_{arm}"
        times[arm] = []
        for bid, bdf in enumerate(batches):
            t0 = time.perf_counter()
            note = ""
            if arm == "auto" and bid > 0 and bid % every == 0:
                # the sink's sequence and LSM policy: MINOR every `every`
                # batches (fold only the deltas since the last segment),
                # MAJOR every 8x that (collapse segments into the base)
                mode = "major" if bid % (8 * every) == 0 else "minor"
                removed = compact_admission_index(spark, idx, mode=mode)
                note = f"  [{mode} {removed}]"
            _admit_dedup_batch_indexed(bdf, bid, base, out, idx, **kwargs)
            release_shingle_caches()
            dt = time.perf_counter() - t0
            times[arm].append(dt)
            print(f"  {arm:<5} batch {bid:2d}: {dt:6.2f}s{note}", flush=True)

    a = {r["doc_id"]
         for r in spark.read.parquet(f"{base_dir}/out_none").select("doc_id").collect()}
    b = {r["doc_id"]
         for r in spark.read.parquet(f"{base_dir}/out_auto").select("doc_id").collect()}
    print(f"  admitted equal: {a == b} ({len(a)} docs)", flush=True)
    q = max(1, n_batches // 4)
    for arm in ("none", "auto"):
        t = times[arm]
        head, tail = t[1:1 + q], t[-q:]
        print(f"  {arm:<5} mean batches 1-{q}: {sum(head)/len(head):5.2f}s | "
              f"last {q}: {sum(tail)/len(tail):5.2f}s | total {sum(t):6.1f}s",
              flush=True)
    shutil.rmtree(base_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
