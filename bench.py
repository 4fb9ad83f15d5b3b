"""Benchmark entry point — the driver runs this per round.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

De-noising (round 5): each query runs ``$SPARK_GRAFT_BENCH_RUNS``
times (default 3) interleaved round-robin — run 1 of every query,
then run 2 of every query, ... — so a transient machine-load spike
hits one *run* of each query rather than all runs of one query.
The reported per-query number is the MIN across runs (closest to the
code's intrinsic cost; OS noise only ever adds time), with median and
the raw runs carried alongside in ``queries_detail`` so the judge can
see the spread. Totals (``value`` and ``r1_comparable_total``) are
sums of the per-query mins, comparable to the single-run totals of
rounds 1-4 (a single run is an unbiased draw >= the min, so earlier
rounds' totals are upper bounds of the same quantity).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

HEADLINE = [
    # TPC-H-style relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q10_returned_items",
    # LLM-data pipeline ops
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_sign_bucket_topk",
    "corpus_clean_pipeline",
    # LLM training-prep surface (r4: round-over-round visibility beyond
    # TPC-H — anchors are the r4-measured values in BENCH_r04.json)
    "corpus_full_pipeline",
    "dedup_semantic_keep_one",
    "word_cooccurrence_pmi",
    # event-time analytics
    "window_session",
    # round-5 expensive families, inside the regression gate from r6 on
    # (their own anchor round is r6 — excluded from r1_comparable_total)
    "dedup_substring_spans",
    "ann_ivf_pq_topk",
    # round-6 graph / record-linkage families (anchor round r6, excluded
    # from r1_comparable_total like the r5 additions; triangle_count_
    # copurchase is deliberately NOT a headliner — same graph family as
    # pagerank but ~2× its cost, low extra regression signal per second)
    "pagerank_copurchase",
    "entity_canonical_keep_one",
    # round-10 multimodal decode anchor (anchor round r10, excluded from
    # r1_comparable_total): full MJPEG-in-AVI synth + per-frame JPEG
    # decode — the engine's heaviest CPU-bound scan stage, newly on the
    # numpy fast path + core-count partitioning; a codec or parallelism
    # regression shows up here first
    "multimodal_video_frame_stats",
]


def _stream_admission_batches(
    spark, corpus_n: int = 5_000, n_batches: int = 4, batch_rows: int = 200,
    words_per_doc: int = 40,
) -> list[float]:
    """Per-batch wall-clock of hotlog indexed streaming admission on a
    fixed deterministic workload — the sink body of
    ``stream_dedup_admission(index_mode="hotlog")``, which equivalence
    tests pin to the recompute form. Returns the steady-state batch
    times (batch 0 pays the one-time bootstrap and is dropped)."""
    import random
    import shutil
    import tempfile

    from pyspark_ingestion_spark.operators.dedup import release_shingle_caches
    from pyspark_ingestion_spark.streaming.pipeline import _admit_dedup_batch_indexed

    words = [f"w{i}" for i in range(8000)]

    def rows(n, seed, start):
        rnd = random.Random(seed)
        return [
            (i, " ".join(rnd.choices(words, k=words_per_doc)))
            for i in range(start, start + n)
        ]

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        spark.createDataFrame(
            rows(corpus_n, seed=5, start=0), "doc_id long, text string"
        ).repartition(8).write.mode("overwrite").parquet(f"{tmp}/base")
        base = spark.read.parquet(f"{tmp}/base")
        kwargs = dict(id_col="doc_id", text_col="text", n=3, num_hashes=8,
                      band_size=2, threshold_num=1, threshold_den=2,
                      max_doc_freq=25, max_bucket_size=None,
                      index_mode="hotlog")
        times = []
        for bid in range(n_batches):
            bdf = spark.createDataFrame(
                rows(batch_rows, seed=100 + bid, start=corpus_n + bid * 10_000),
                "doc_id long, text string",
            ).coalesce(2)
            t0 = time.perf_counter()
            _admit_dedup_batch_indexed(
                bdf, bid, base, f"{tmp}/out", f"{tmp}/index", **kwargs
            )
            release_shingle_caches()
            times.append(round(time.perf_counter() - t0, 3))
        return times[1:]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stream_substring_batches(
    spark, corpus_n: int = 3_000, n_batches: int = 4, batch_rows: int = 150,
    words_per_doc: int = 40,
) -> list[float]:
    """Per-batch wall-clock of INDEXED substring streaming admission
    (dfcnt ledger, k=20, cap=10) on a fixed deterministic workload — the
    sink body of ``stream_substring_admission(index_path=...)``, which
    equivalence tests pin to the recompute form. ~30% of docs carry a
    boilerplate sentence so the df cap (and therefore the r8 ledger
    read path) is actually exercised. Returns steady-state batch times
    (batch 0 pays the one-time windowing bootstrap and is dropped)."""
    import random
    import shutil
    import tempfile

    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_substring_batch_indexed,
    )

    words = [f"w{i}" for i in range(8000)]
    boiler = [
        "subscribe to our newsletter for the latest updates and offers",
        "all rights reserved reproduction without permission is prohibited",
    ]

    def rows(n, seed, start):
        rnd = random.Random(seed)
        out = []
        for i in range(start, start + n):
            ws = rnd.choices(words, k=words_per_doc)
            if rnd.random() < 0.3:
                pos = rnd.randrange(len(ws))
                ws[pos:pos] = rnd.choice(boiler).split()
            out.append((i, " ".join(ws)))
        return out

    tmp = tempfile.mkdtemp(prefix="bench_substream_")
    try:
        spark.createDataFrame(
            rows(corpus_n, seed=5, start=0), "doc_id long, text string"
        ).repartition(8).write.mode("overwrite").parquet(f"{tmp}/base")
        base = spark.read.parquet(f"{tmp}/base")
        args = dict(id_col="doc_id", text_col="text", k=20, min_len=20,
                    max_window_df=10, sample_mod=None)
        times = []
        for bid in range(n_batches):
            bdf = spark.createDataFrame(
                rows(batch_rows, seed=100 + bid, start=corpus_n + bid * 10_000),
                "doc_id long, text string",
            ).coalesce(2)
            t0 = time.perf_counter()
            _admit_substring_batch_indexed(
                bdf, bid, base, f"{tmp}/out", f"{tmp}/index", **args
            )
            times.append(round(time.perf_counter() - t0, 3))
        return times[1:]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stream_fingerprint_batches(
    spark, corpus_n: int = 5_000, n_batches: int = 4, batch_rows: int = 200,
) -> list[float]:
    """Per-batch wall-clock of INDEXED perceptual fingerprint streaming
    admission (image dHash, radius 7) on a fixed deterministic workload
    — the sink body of ``stream_fingerprint_admission(index_path=...)``,
    which equivalence tests pin to the recompute form. ~5% of each
    batch's images are near-duplicates of corpus images (3-char local
    edit) so the Hamming verify really rejects. Returns steady-state
    batch times (batch 0 pays the one-time base decode bootstrap and is
    dropped)."""
    import random
    import shutil
    import tempfile

    from pyspark_ingestion_spark.operators.multimodal import (
        image_dhash,
        synthesize_bmp_payload,
    )
    from pyspark_ingestion_spark.streaming.pipeline import (
        _admit_fingerprint_batch_indexed,
    )

    def texts(n, seed, start=0):
        rnd = random.Random(seed)
        return [
            (start + i,
             "".join(chr(rnd.randrange(32, 127)) for _ in range(360)))
            for i in range(n)
        ]

    corpus_texts = texts(corpus_n, seed=5)

    def synth(rows, parts):
        return synthesize_bmp_payload(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id", "text", width=12,
        ).coalesce(parts)

    tmp = tempfile.mkdtemp(prefix="bench_fpstream_")
    try:
        synth(corpus_texts, 8).write.mode("overwrite").parquet(f"{tmp}/base")
        base = spark.read.parquet(f"{tmp}/base")
        times = []
        for bid in range(n_batches):
            rnd = random.Random(100 + bid)
            rows = texts(batch_rows, 100 + bid, start=corpus_n + bid * 10_000)
            rows += [
                (corpus_n + bid * 10_000 + batch_rows + i,
                 "@@@" + corpus_texts[rnd.randrange(corpus_n)][1][3:])
                for i in range(batch_rows // 20)
            ]
            bdf = synth(rows, 2)
            t0 = time.perf_counter()
            _admit_fingerprint_batch_indexed(
                bdf, bid, base, f"{tmp}/out", f"{tmp}/index",
                hash_fn=image_dhash, hash_cols=("dh_hi", "dh_lo"),
                id_col="doc_id", radius=7,
            )
            times.append(round(time.perf_counter() - t0, 3))
        return times[1:]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _ivf_pq_split(spark, sf_dir: str) -> tuple[float, float]:
    """ann_ivf_pq_topk with the FIT (KMeans centroid + 8 PQ codebook
    trainings — an ingest-time one-off in production) timed separately
    from the QUERY path (ADC scoring + exact rerank — the part that runs
    per search and that the 2× regression gate should watch). Same
    parameters as the registry query; both stages' sum is reported under
    the original anchor name for series continuity (r8, VERDICT r7
    item 7). The fits are eager (MLlib .fit + driver-side codebook rows),
    so timing the calls captures the full fit cost."""
    from pyspark_ingestion_spark.operators.similarity import (
        ivf_pq_topk,
        kmeans_centroids,
        pq_codebooks,
    )
    from pyspark_ingestion_spark.sources.readers import load_table

    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    t0 = time.perf_counter()
    cents = kmeans_centroids(e, n_centroids=16, seed=42)
    cb = pq_codebooks(e, n_sub=8, k_codes=32, seed=42)
    fit_s = round(time.perf_counter() - t0, 3)
    queries = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t1 = time.perf_counter()
    ivf_pq_topk(
        e, queries, cents, cb, k=5, nprobe=8, n_sub=8, k_codes=32, rerank=20
    ).collect()
    query_s = round(time.perf_counter() - t1, 3)
    return fit_s, query_s


#: per-stage detail rows: reported in `queries` for visibility but NOT
#: added into the totals (their sum already rides under the parent
#: anchor name)
_DETAIL_ONLY = {"ann_ivf_pq_fit", "ann_ivf_pq_query", "calibration_cpu"}

#: reference wall-time of the calibration job (r9 anchor: min of 3 runs
#: on the round-9 build machine). The cross-round regression gate reads
#: the NORMALIZED series: raw_sec / (calibration_sec / _CAL_REF_SEC) —
#: r8's verdict measured every untouched query drifting +13–45% in one
#: round from machine weather alone, so raw cross-round deltas under
#: ~1.5x are not attributable to code without this correction.
_CAL_REF_SEC = 3.0


def _calibration_job(spark) -> float:
    """Fixed CPU-bound machine-conditions probe: a deterministic
    in-memory aggregate (12B-row range → xxhash64 → sum across 64
    partitions), zero I/O, zero shuffle beyond the final 64-row
    combine — its wall-time moves with CPU contention/thermals/VM
    placement, not with any query's plan. Interleaved into every bench
    run round like a query; min-of-runs reported (JIT warms on run 1)."""
    t0 = time.perf_counter()
    spark.range(0, 12_000_000_000, 1, 64).selectExpr(
        "sum(xxhash64(id) % 1000003) as h"
    ).collect()
    return round(time.perf_counter() - t0, 3)


#: reference wall-time of the IO/shuffle calibration job (r11 anchor:
#: the in-context reading on the round-11 build machine — the probe
#: runs once after the query passes, where it reads ~2.3 s; a
#: dedicated tight loop warms to ~1.6 s, but the anchor must match the
#: context the probe actually runs in or same-machine runs would show
#: a phantom 1.45x scale). The streaming
#: batch metrics are dominated by many small Spark jobs + ledger
#: parquet writes — a machine-sensitivity profile the CPU-only probe
#: provably misses: the r10 hotlog '+39 % regression' reproduced with
#: UNCHANGED r9 code on the r11 machine (16 s fresh / 12.8 s warm vs
#: the r9 driver's 9.0 s) while the CPU probe read near-flat, so the
#: drift was environment, not code (SCALING.md r11). This probe times
#: the same work shape (partitioned parquet write + read + shuffled
#: aggregate, 3×) so the stream tier normalizes by the resource class
#: it actually stresses.
_IO_CAL_REF_SEC = 2.3


def _calibration_io_job(spark) -> float:
    """IO/shuffle machine-conditions probe for the streaming tier: three
    rounds of partitioned parquet write → read → shuffled aggregate on
    deterministic synthetic rows (~24 MB total) — the hotlog batch's
    work profile in miniature, zero dependence on the sf dir."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="bench_cal_io_")
    try:
        t0 = time.perf_counter()
        for i in range(3):
            (
                spark.range(0, 1_000_000, 1, 8)
                .select((F.col("id") % 1000).alias("k"), F.col("id").alias("v"))
                .repartition(8, "k")
                .write.mode("overwrite")
                .parquet(f"{tmp}/t{i}")
            )
            spark.read.parquet(f"{tmp}/t{i}").groupBy("k").agg(
                F.sum("v")
            ).collect()
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    from pyspark_ingestion_spark.queries import all_queries
    from pyspark_ingestion_spark.session import get_spark_session

    spark = get_spark_session(app_name="pyspark-ingestion-spark-bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]
    # warm-up: JVM + parquet footer caches, so timings measure the plan not startup
    registry[names[0]].fn(spark, sf_dir).collect()

    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(n_runs):
        # machine-conditions probe rides every round-robin pass like a query
        runs.setdefault("calibration_cpu", []).append(_calibration_job(spark))
        for name in names:
            if name == "ann_ivf_pq_topk":
                fit_s, query_s = _ivf_pq_split(spark, sf_dir)
                runs.setdefault("ann_ivf_pq_fit", []).append(fit_s)
                runs.setdefault("ann_ivf_pq_query", []).append(query_s)
                runs[name].append(round(fit_s + query_s, 3))
                continue
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).collect()
            runs[name].append(round(time.perf_counter() - t0, 3))

    # streaming steady-state (r7): hotlog indexed admission seconds/BATCH
    # at FIXED corpus/batch sizes (deterministic synthetic docs — the
    # metric tracks the read/write path's cost, not the sf dir), so a
    # regression in the streaming tier is visible to the driver instead
    # of living only in one-off SCALING.md A/Bs. Batch 0 (one-time index
    # bootstrap) is excluded; the reported number is the min over the
    # steady-state batches, consistent with the min-of-runs convention.
    # the batch loops run AFTER the query passes, so the streaming
    # section gets its own weather reading (r11) — on the IO/shuffle
    # probe, the resource class the batch loops actually stress (the
    # CPU probe provably missed the r10 machine drift; see
    # _IO_CAL_REF_SEC)
    stream_cal = _calibration_io_job(spark)
    runs["stream_admission_hotlog_batch"] = _stream_admission_batches(spark)
    # r8: the substring member's steady-state batch enters the gate too,
    # now that its hot-window lookup rides the dfcnt ledger instead of a
    # corpus-wide aggregate (anchor round r8)
    runs["stream_substring_ledger_batch"] = _stream_substring_batches(spark)
    # r9: the multimodal member's steady-state batch (image dHash
    # admission on the fprints index; anchor round r9)
    runs["stream_fingerprint_batch"] = _stream_fingerprint_batches(spark)

    timings = {n: min(rs) for n, rs in runs.items()}
    detail = {
        n: {
            "min": min(rs),
            "median": round(statistics.median(rs), 3),
            "runs": rs,
        }
        for n, rs in runs.items()
    }

    total = round(
        sum(v for n, v in timings.items() if n not in _DETAIL_ONLY), 3
    )
    # calibration-normalized series (r9, VERDICT r8 item 4; r11 made it
    # PER-PASS, VERDICT r10 item 2): the r10 driver run showed bursty
    # weather that a single min-of-runs scale under-corrects (its
    # calibration MEDIANS were 11% slower than r9's while the min-based
    # scale moved 1.6%, and every untouched query drifted +14–39%). The
    # calibration job already rides every round-robin pass, so each
    # query RUN is now divided by ITS OWN pass's scale before the min —
    # a slow pass inflates its calibration reading and its query runs
    # together, and the min picks the best weather-corrected run. The
    # streaming batch loops execute after the passes and get their own
    # probe (stream_cal). Lists not aligned to passes fall back to the
    # median scale. scale > 1 = slower conditions than the r9 reference.
    cal_runs = runs["calibration_cpu"]
    scales = [c / _CAL_REF_SEC for c in cal_runs]
    med_scale = statistics.median(scales)
    stream_scale = stream_cal / _IO_CAL_REF_SEC
    stream_names = {
        "stream_admission_hotlog_batch",
        "stream_substring_ledger_batch",
        "stream_fingerprint_batch",
    }

    def _norm(name: str, rs: list[float]) -> float:
        if name in stream_names:
            return min(r / stream_scale for r in rs)
        if len(rs) == len(scales):
            return min(r / s for r, s in zip(rs, scales))
        return min(rs) / med_scale

    cal = timings["calibration_cpu"]
    scale = round(med_scale, 4)
    normalized = {
        n: round(_norm(n, rs), 3)
        for n, rs in runs.items()
        if n != "calibration_cpu"
    }
    # the headline set GREW in r4 (+corpus_full_pipeline, +dedup_semantic_
    # keep_one, +word_cooccurrence_pmi); this subtotal keeps the r1-r3
    # 11-query series comparable round-over-round without freezing the set
    r3_set = [n for n in names if n not in (
        "corpus_full_pipeline", "dedup_semantic_keep_one", "word_cooccurrence_pmi",
        "dedup_substring_spans", "ann_ivf_pq_topk",
        "pagerank_copurchase", "entity_canonical_keep_one",
        "multimodal_video_frame_stats",
        "stream_admission_hotlog_batch", "stream_substring_ledger_batch",
        "stream_fingerprint_batch")]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_detail": detail,
                "bench_runs": n_runs,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
                "r1_comparable_total": round(sum(timings[n] for n in r3_set), 3),
                "calibration": {
                    "sec": cal,
                    "ref_sec": _CAL_REF_SEC,
                    "scale": scale,
                    "runs": runs["calibration_cpu"],
                    "per_pass_scales": [round(s, 4) for s in scales],
                    "stream_io_sec": stream_cal,
                    "stream_io_ref_sec": _IO_CAL_REF_SEC,
                    "stream_scale": round(stream_scale, 4),
                    "mode": "per-pass (r11)",
                },
                "queries_normalized": normalized,
                "r1_comparable_total_normalized": round(
                    sum(normalized[n] for n in r3_set), 3
                ),
                "value_normalized": round(
                    sum(v for n, v in normalized.items() if n not in _DETAIL_ONLY),
                    3,
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
