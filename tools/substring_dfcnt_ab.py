"""A/B: substring streaming admission hot-window lookup — dfcnt ledger
(r8) vs corpus-wide aggregate over the windows table (the r7 weak flag).

With ``max_window_df`` set, the pre-r8 read path ran
``windows.groupBy(wh).count_distinct(doc)`` over the ENTIRE windows
index every micro-batch — a shuffle whose input grows with the corpus,
the exact cost class the LSH hotlog ledger eliminated for the Jaccard
index. The r8 path resolves hotness from the narrow ``dfcnt`` ledger
restricted to the batch's own window hashes (broadcast semi-join: the
ledger is scanned, never shuffled; the aggregate is batch-bounded).
This harness runs the SAME batches against the SAME index twice — one
arm per lookup strategy (the delta writes are identical, so index state
is shared-shape) — verifies identical admissions, and prints per-batch
wall-clock. Results recorded in SCALING.md (r8).

Run: python tools/substring_dfcnt_ab.py [corpus_n] [batches] [batch_rows] [compact_every]
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

WORDS = [f"word{i:04d}" for i in range(6000)]
BOILERPLATE = [
    "subscribe to our newsletter for the latest updates and offers",
    "all rights reserved reproduction without permission is prohibited",
    "click here to accept cookies and continue to the full article",
    "the views expressed are those of the author alone and not the site",
]


def make_rows(n, seed, start=0, k=40):
    """Word-soup docs; ~30% carry a boilerplate sentence (shared 20+ char
    substrings across MANY docs — the windows the df cap must drop) and
    ~5% verbatim-quote a 6-word span of an earlier doc (true rejects)."""
    rnd = random.Random(seed)
    rows = []
    for i in range(start, start + n):
        ws = rnd.choices(WORDS, k=k)
        if rnd.random() < 0.30:
            pos = rnd.randrange(len(ws))
            ws[pos:pos] = rnd.choice(BOILERPLATE).split()
        body = " ".join(ws)
        rows.append((i, body))
        if rnd.random() < 0.05 and len(rows) > 1:
            src = rows[rnd.randrange(len(rows) - 1)][1].split()
            j = rnd.randrange(max(1, len(src) - 6))
            quote = " ".join(src[j:j + 6])
            filler = " ".join(rnd.choices(WORDS, k=k // 2))
            rows.append((i + 1_000_000, f"{filler} {quote}"))
    return rows


def main():
    corpus_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    every = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from pyspark_ingestion_spark.session import get_spark_session
    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_substring_batch_indexed,
        compact_substring_index,
    )

    spark = get_spark_session(app_name="substring-dfcnt-ab")
    spark.sparkContext.setLogLevel("ERROR")
    args = dict(id_col="doc_id", text_col="text", k=20, min_len=20,
                max_window_df=10, sample_mod=None)
    base_dir = "/tmp/substring_dfcnt_ab"
    shutil.rmtree(base_dir, ignore_errors=True)
    spark.createDataFrame(
        make_rows(corpus_n, seed=5), "doc_id long, text string"
    ).repartition(32).write.mode("overwrite").parquet(f"{base_dir}/base")
    base = spark.read.parquet(f"{base_dir}/base")
    batches = [
        spark.createDataFrame(
            make_rows(batch_rows, seed=100 + b, start=corpus_n + b * 10_000),
            "doc_id long, text string",
        ).coalesce(4).persist()
        for b in range(n_batches)
    ]
    for b in batches:
        b.count()

    print(f"== substring admission, corpus n={corpus_n:,}, {n_batches} "
          f"batches x ~{batch_rows}, k=20 cap=10, compact_every={every}",
          flush=True)
    times = {}
    for arm, ledger in (("aggregate", False), ("ledger", True)):
        out = f"{base_dir}/out_{arm}"
        idx = f"{base_dir}/index_{arm}"
        times[arm] = []
        for bid, bdf in enumerate(batches):
            t0 = time.perf_counter()
            note = ""
            if bid > 0 and bid % every == 0:
                mode = "major" if bid % (8 * every) == 0 else "minor"
                removed = compact_substring_index(spark, idx, mode=mode)
                note = f"  [{mode} {removed}]"
            _admit_substring_batch_indexed(
                bdf, bid, base, out, idx, use_dfcnt_ledger=ledger, **args
            )
            dt = time.perf_counter() - t0
            times[arm].append(dt)
            print(f"  {arm:<9} batch {bid:2d}: {dt:6.2f}s{note}", flush=True)

    a = {r["doc_id"]
         for r in spark.read.parquet(f"{base_dir}/out_aggregate").select("doc_id").collect()}
    b = {r["doc_id"]
         for r in spark.read.parquet(f"{base_dir}/out_ledger").select("doc_id").collect()}
    print(f"  admitted equal: {a == b} ({len(a)} docs)", flush=True)
    q = max(1, n_batches // 4)
    for arm in ("aggregate", "ledger"):
        t = times[arm]
        head, tail = t[1:1 + q], t[-q:]
        print(f"  {arm:<9} mean batches 1-{q}: {sum(head)/len(head):5.2f}s | "
              f"last {q}: {sum(tail)/len(tail):5.2f}s | total {sum(t):6.1f}s",
              flush=True)
    shutil.rmtree(base_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
