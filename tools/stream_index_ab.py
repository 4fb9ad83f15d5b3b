"""A/B: streaming dedup admission — per-batch recompute vs incremental index.

Measures the per-micro-batch wall-clock of the two `stream_dedup_admission`
forms (`_admit_dedup_batch` = re-derive the corpus band table from
base ∪ admitted each batch; `_admit_dedup_batch_indexed` = read back the
incrementally maintained postings/bands index) at two base-corpus sizes.
The recompute form's per-batch cost re-shingles the corpus TEXT (parse +
explode + md5 + two shuffles) and should grow with the corpus; the
indexed form's per-batch cost is the batch itself + index read-back
(one map-side-combined aggregate over narrow posting rows + a band
join). Same admission results by construction (equivalence pinned in
tests/test_streaming.py); this harness measures the cost asymmetry the
index exists for. Results recorded in SCALING.md.

Run: python tools/stream_index_ab.py [small_corpus] [big_corpus] [batches] [batch_rows]
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


def make_rows(n, seed, start=0):
    rnd = random.Random(seed)
    rows = []
    for i in range(start, start + n):
        body = " ".join(rnd.choices(WORDS, k=40))
        rows.append((i, body))
        # ~5% of batch docs are near-dups of an EARLIER id so admission
        # really rejects something (the corpus join is not a no-op)
        if rnd.random() < 0.05 and rows:
            ws = rows[rnd.randrange(len(rows))][1].split()
            ws[rnd.randrange(len(ws))] = rnd.choice(WORDS)
            rows.append((i + 1_000_000, " ".join(ws)))
    return rows


def main():
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    batch_rows = int(sys.argv[4]) if len(sys.argv) > 4 else 300

    from pyspark_ingestion_spark.operators.dedup import release_shingle_caches
    from pyspark_ingestion_spark.session import get_spark_session
    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_dedup_batch,
        _admit_dedup_batch_indexed,
    )

    spark = get_spark_session(app_name="stream-index-ab")
    spark.sparkContext.setLogLevel("ERROR")
    kwargs = dict(id_col="doc_id", text_col="text", n=3, num_hashes=8,
                  band_size=2, threshold_num=1, threshold_den=2,
                  max_doc_freq=25, max_bucket_size=None)
    base_dir = "/tmp/stream_ab"

    for corpus_n in (small, big):
        shutil.rmtree(base_dir, ignore_errors=True)
        base = spark.createDataFrame(
            make_rows(corpus_n, seed=5), "doc_id long, text string"
        ).repartition(32).persist()
        base.count()
        batches = [
            spark.createDataFrame(
                make_rows(batch_rows, seed=100 + b, start=corpus_n + b * 10_000),
                "doc_id long, text string",
            ).coalesce(4).persist()
            for b in range(n_batches)
        ]
        for b in batches:
            b.count()

        print(f"== base corpus n={corpus_n:,}, {n_batches} batches x ~{batch_rows}",
              flush=True)
        out_r = f"{base_dir}/out_recompute"
        for bid, bdf in enumerate(batches):
            t0 = time.perf_counter()
            _admit_dedup_batch(bdf, bid, base, out_r, **kwargs)
            print(f"  recompute batch {bid}: {time.perf_counter() - t0:6.2f}s",
                  flush=True)
        release_shingle_caches()

        out_i = f"{base_dir}/out_indexed"
        idx = f"{base_dir}/index"
        t0 = time.perf_counter()
        _admit_dedup_batch_indexed(batches[0], 0, base, out_i, idx, **kwargs)
        print(f"  indexed   batch 0: {time.perf_counter() - t0:6.2f}s "
              "(includes one-time base bootstrap)", flush=True)
        for bid, bdf in enumerate(batches[1:], start=1):
            t0 = time.perf_counter()
            _admit_dedup_batch_indexed(bdf, bid, base, out_i, idx, **kwargs)
            print(f"  indexed   batch {bid}: {time.perf_counter() - t0:6.2f}s",
                  flush=True)
        release_shingle_caches()

        # sanity: both forms admitted the same doc set
        a = {r["doc_id"] for r in spark.read.parquet(out_r).select("doc_id").collect()}
        b = {r["doc_id"] for r in spark.read.parquet(out_i).select("doc_id").collect()}
        print(f"  admitted equal: {a == b} ({len(a)} docs)", flush=True)
        base.unpersist()
        for x in batches:
            x.unpersist()
    shutil.rmtree(base_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
