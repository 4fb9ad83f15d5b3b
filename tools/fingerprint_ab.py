"""A/B: streaming fingerprint (perceptual) admission — recompute vs indexed.

Measures the per-micro-batch wall-clock of `stream_fingerprint_admission`'s
two forms at two base-corpus sizes: the recompute arm re-DECODES and
re-hashes (base ∪ admitted-so-far) payloads every batch, the indexed arm
reads back the 16-byte-per-item fprints index and decodes only the batch.
Admission results are equal by construction (equivalence pinned in
tests/test_streaming.py); this harness measures the cost asymmetry the
index exists for — decode is the dominant term, and the index makes it
run exactly once per item. Results recorded in SCALING.md.

Run: python tools/fingerprint_ab.py [small_corpus] [big_corpus] [batches] [batch_rows]

Images are 12x300 px (3,600-byte planes): big enough that per-item decode
— the term the index amortizes — dominates Spark job overhead at local
scale, matching the sink's production economics.
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


def make_texts(n, seed, start=0, length=3600):
    rnd = random.Random(seed)
    return [
        (start + i, "".join(chr(rnd.randrange(32, 127)) for _ in range(length)))
        for i in range(n)
    ]


def corpus_text(i, length=3600):
    """Deterministic pseudo-random corpus image plane — reproducible on
    BOTH sides: driver-side here (near-dup construction), Spark-side in
    `corpus_df` (bulk generation without driver-side string building)."""
    import hashlib

    return (hashlib.sha256(str(i).encode()).hexdigest() * 57)[:length]


def batch_texts(n, seed, start, corpus_n):
    """Batch rows: fresh random images + ~5% near-duplicates of corpus
    images (3-char local edit — inside the radius-7 band budget) so the
    admission join really rejects something."""
    rnd = random.Random(seed)
    rows = make_texts(n, seed, start=start)
    for i in range(n // 20):
        t = corpus_text(rnd.randrange(corpus_n))
        rows.append((start + n + i, "@@@" + t[3:]))
    return rows


def main():
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    batch_rows = int(sys.argv[4]) if len(sys.argv) > 4 else 200

    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.operators.multimodal import (
        image_dhash,
        synthesize_bmp_payload,
    )
    from pyspark_ingestion_spark.session import get_spark_session
    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_fingerprint_batch_indexed,
        _admit_fingerprint_batch_recompute,
    )

    spark = get_spark_session(app_name="fingerprint-ab")
    spark.sparkContext.setLogLevel("ERROR")
    base_dir = "/tmp/fingerprint_ab"
    hash_cols = ("dh_hi", "dh_lo")

    def synth(rows):
        return synthesize_bmp_payload(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id", "text", width=12,
        )

    for corpus_n in (small, big):
        shutil.rmtree(base_dir, ignore_errors=True)
        # base payloads generated SPARK-SIDE (sha256-hex planes — the
        # driver only ever materializes the handful sampled for
        # near-dups), written to PARQUET and re-read (and re-decoded)
        # per batch by the recompute arm, like production
        corpus_df = spark.range(corpus_n).select(
            F.col("id").alias("doc_id"),
            F.expr(
                "substring(repeat(sha2(cast(id as string), 256), 57), 1, 3600)"
            ).alias("text"),
        )
        synthesize_bmp_payload(
            corpus_df, "doc_id", "text", width=12
        ).repartition(32).write.mode("overwrite").parquet(f"{base_dir}/base")
        base = spark.read.parquet(f"{base_dir}/base")
        batches = [
            synth(
                batch_texts(batch_rows, 100 + b, corpus_n + b * 10_000,
                            corpus_n)
            ).coalesce(4).persist()
            for b in range(n_batches)
        ]
        for b in batches:
            b.count()

        print(f"== base corpus n={corpus_n:,}, {n_batches} batches x "
              f"~{batch_rows + batch_rows // 20} images", flush=True)
        out_r = f"{base_dir}/out_recompute"
        for bid, bdf in enumerate(batches):
            t0 = time.perf_counter()
            # the SAME module-level recompute arm the sink runs — an
            # inline copy here could silently diverge from what it
            # claims to benchmark
            _admit_fingerprint_batch_recompute(
                bdf, bid, base, out_r, hash_fn=image_dhash,
                hash_cols=hash_cols, id_col="doc_id", radius=7,
            )
            print(f"  recompute batch {bid}: {time.perf_counter() - t0:6.2f}s",
                  flush=True)

        out_i, idx = f"{base_dir}/out_indexed", f"{base_dir}/index"
        for bid, bdf in enumerate(batches):
            t0 = time.perf_counter()
            _admit_fingerprint_batch_indexed(
                bdf, bid, base, out_i, idx, hash_fn=image_dhash,
                hash_cols=hash_cols, id_col="doc_id", radius=7,
            )
            note = " (includes one-time base bootstrap)" if bid == 0 else ""
            print(f"  indexed   batch {bid}: {time.perf_counter() - t0:6.2f}s"
                  f"{note}", flush=True)

        a = {r["doc_id"] for r in spark.read.parquet(out_r).select("doc_id").collect()}
        b = {r["doc_id"] for r in spark.read.parquet(out_i).select("doc_id").collect()}
        total = n_batches * (batch_rows + batch_rows // 20)
        print(f"  admitted equal: {a == b} ({len(a)}/{total} docs admitted)",
              flush=True)
        for x in batches:
            x.unpersist()
    shutil.rmtree(base_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
