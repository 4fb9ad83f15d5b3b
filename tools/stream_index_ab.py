"""A/B/C: streaming dedup admission — recompute vs indexed (both modes).

Measures the per-micro-batch wall-clock of the `stream_dedup_admission`
forms at two base-corpus sizes: `_admit_dedup_batch` (re-derive the
corpus band table from base ∪ admitted each batch),
`_admit_dedup_batch_indexed(index_mode="fingerprint")` (read back the
postings/bands index; hot set + staleness re-derived per batch from the
postings), and `index_mode="hotlog"` (df-delta + hot-transition log —
the read path runs no corpus-wide aggregate at all). Same admission
results by construction (equivalence pinned in tests/test_streaming.py);
this harness measures the cost asymmetry the index exists for. Results
recorded in SCALING.md.

Run: python tools/stream_index_ab.py [small_corpus] [big_corpus] [batches] [batch_rows] [words_per_doc]
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
    words_per_doc = int(sys.argv[5]) if len(sys.argv) > 5 else 40

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
        # the base corpus lives on PARQUET and is re-read per batch, like
        # production — an in-memory persisted base would hide exactly the
        # per-batch corpus-text scan + hash + shuffle cost the indexed
        # form exists to remove (first A/B cut made that mistake: the
        # recompute arm looked artificially cheap)
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

        print(f"== base corpus n={corpus_n:,}, {n_batches} batches x "
              f"~{batch_rows}, {words_per_doc} words/doc", flush=True)
        out_r = f"{base_dir}/out_recompute"
        for bid, bdf in enumerate(batches):
            t0 = time.perf_counter()
            _admit_dedup_batch(bdf, bid, base, out_r, **kwargs)
            # the real sink releases per micro-batch; mirroring it keeps the
            # recompute arm from amortizing its corpus shingle cache across
            # batches (the first A/B cut let it, understating recompute cost)
            release_shingle_caches()
            print(f"  recompute batch {bid}: {time.perf_counter() - t0:6.2f}s",
                  flush=True)

        outs = {}
        for mode in ("fingerprint", "hotlog"):
            out_i = f"{base_dir}/out_{mode}"
            idx = f"{base_dir}/index_{mode}"
            outs[mode] = out_i
            t0 = time.perf_counter()
            _admit_dedup_batch_indexed(batches[0], 0, base, out_i, idx,
                                       index_mode=mode, **kwargs)
            release_shingle_caches()
            print(f"  {mode:<11} batch 0: {time.perf_counter() - t0:6.2f}s "
                  "(includes one-time base bootstrap)", flush=True)
            for bid, bdf in enumerate(batches[1:], start=1):
                t0 = time.perf_counter()
                _admit_dedup_batch_indexed(bdf, bid, base, out_i, idx,
                                           index_mode=mode, **kwargs)
                release_shingle_caches()
                print(f"  {mode:<11} batch {bid}: {time.perf_counter() - t0:6.2f}s",
                      flush=True)

        # sanity: all forms admitted the same doc set
        a = {r["doc_id"] for r in spark.read.parquet(out_r).select("doc_id").collect()}
        for mode, out_i in outs.items():
            b = {r["doc_id"]
                 for r in spark.read.parquet(out_i).select("doc_id").collect()}
            print(f"  admitted equal ({mode}): {a == b} ({len(a)} docs)", flush=True)
        for x in batches:
            x.unpersist()
    shutil.rmtree(base_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
