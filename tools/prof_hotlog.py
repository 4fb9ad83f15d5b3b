"""Per-stage profile of one hotlog admission micro-batch (guide §1):
replicates `_admit_dedup_batch_indexed(index_mode="hotlog")` stage by
stage with timers, on the bench's exact fixture (corpus 5000, batch
200, words/doc 40, n=3, k=8, band=2, cap=25) so the split tells us
where the ~4.5-5.5 s steady-state batch goes. Stages:

  S0 source checkpoint      (eager localCheckpoint of the batch)
  S1 rejects PLAN           (build + analyze/optimize, no action)
  S2 rejects EXEC           (admitted eager checkpoint = rejects run)
  S3 admitted text write    (sequential here; overlapped in the sink)
  S4 postings write
  S5 dfcnt delta write      (_apply_hot_transitions first half)
  S6 transitions rest       (prev agg + newly_hot + hot write + probe)
  S7 bands build + write

Run: python tools/prof_hotlog.py [n_batches]
"""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import random

from pyspark.sql import functions as F


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from pyspark_ingestion_spark.operators.dedup import (
        _shingle_table,
        release_shingle_caches,
    )
    from pyspark_ingestion_spark.session import get_spark_session
    from pyspark_ingestion_spark.sources.localtable import local_rows_df
    from pyspark_ingestion_spark.sources.writers import overwrite_partitions
    from pyspark_ingestion_spark.streaming.pipeline import (
        _IDX_BANDS,
        _IDX_DFCNT,
        _IDX_HOT,
        _IDX_POSTINGS,
        _index_band_rows,
        _indexed_rejects_hotlog,
        init_dedup_admission_index,
    )

    spark = get_spark_session(app_name="prof-hotlog")
    tmp = tempfile.mkdtemp(prefix="prof_hotlog_")
    words = [f"w{i}" for i in range(8000)]
    corpus_n, batch_rows, words_per_doc = 5_000, 200, 40

    def rows(n, seed, start):
        rnd = random.Random(seed)
        return [
            (i, " ".join(rnd.choices(words, k=words_per_doc)))
            for i in range(start, start + n)
        ]

    spark.createDataFrame(
        rows(corpus_n, seed=5, start=0), "doc_id long, text string"
    ).repartition(8).write.mode("overwrite").parquet(f"{tmp}/base")
    base = spark.read.parquet(f"{tmp}/base")
    kw = dict(id_col="doc_id", text_col="text", n=3, num_hashes=8,
              band_size=2, threshold_num=1, threshold_den=2,
              max_doc_freq=25, max_bucket_size=None)
    index_path = f"{tmp}/index"
    out_path = f"{tmp}/out"

    init_dedup_admission_index(
        base, index_path, id_col="doc_id", text_col="text", n=3,
        num_hashes=8, band_size=2, max_doc_freq=25, index_mode="hotlog",
    )

    try:
        for bid in range(n_batches):
            bdf = local_rows_df(
                spark,
                rows(batch_rows, seed=100 + bid, start=corpus_n + bid * 10_000),
                "doc_id long, text string",
            ).coalesce(2)
            t = {}
            tb0 = time.perf_counter()

            t0 = time.perf_counter()
            batch = bdf.select("doc_id", "text").localCheckpoint(eager=True)
            t["S0_src_ckpt"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            rejects, sb = _indexed_rejects_hotlog(
                spark, batch, index_path, bid, "doc_id", 3, 8, 2, 1, 2,
                25, None, text_col="text",
            )
            adm_plan = batch.join(F.broadcast(rejects), "doc_id", "left_anti")
            # force analysis+optimization+physical planning, no execution
            adm_plan._jdf.queryExecution().executedPlan()
            t["S1_rejects_plan"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            admitted = adm_plan.localCheckpoint(eager=True)
            t["S2_rejects_exec"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            overwrite_partitions(
                admitted.withColumn("__batch_id", F.lit(bid)),
                out_path, ["__batch_id"],
            )
            t["S3_text_write"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            adm_posts = _shingle_table(admitted, "doc_id", "text", 3)
            overwrite_partitions(
                adm_posts.withColumn("__batch_id", F.lit(bid)),
                f"{index_path}/{_IDX_POSTINGS}", ["__batch_id"],
            )
            t["S4_postings_write"] = time.perf_counter() - t0

            # _apply_hot_transitions split in two: dfcnt write | the rest
            t0 = time.perf_counter()
            batch_cnt = adm_posts.groupBy("shingle").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            overwrite_partitions(
                batch_cnt.withColumn("__batch_id", F.lit(bid)),
                f"{index_path}/{_IDX_DFCNT}", ["__batch_id"],
            )
            t["S5_dfcnt_write"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            cap = 25
            written_cnt = (
                spark.read.parquet(f"{index_path}/{_IDX_DFCNT}")
                .withColumn("__batch_id", F.col("__batch_id").cast("long"))
            )
            prev = (
                written_cnt.filter(F.col("__batch_id") != bid)
                .join(F.broadcast(batch_cnt.select("shingle")), "shingle")
                .groupBy("shingle")
                .agg(F.sum("cnt").alias("prev"))
            )
            newly_hot = (
                batch_cnt.join(prev, "shingle", "left")
                .withColumn("prev", F.coalesce(F.col("prev"), F.lit(0)))
                .filter((F.col("prev") <= cap) & (F.col("prev") + F.col("cnt") > cap))
                .select("shingle")
                .localCheckpoint(eager=False)
            )
            overwrite_partitions(
                newly_hot.withColumn("__batch_id", F.lit(bid)),
                f"{index_path}/{_IDX_HOT}", ["__batch_id"],
            )
            crossed = bool(newly_hot.head(1))
            t["S6_transitions"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            admitted_ids = admitted.select(F.col("doc_id").alias("doc"))
            band_rows = _index_band_rows(
                sb.join(admitted_ids, "doc"), admitted_ids, 8, 2
            )
            assert not crossed, "fixture never crosses the cap"
            overwrite_partitions(
                band_rows.withColumn("__batch_id", F.lit(bid)),
                f"{index_path}/{_IDX_BANDS}", ["__batch_id"],
            )
            t["S7_bands_write"] = time.perf_counter() - t0

            release_shingle_caches()
            total = time.perf_counter() - tb0
            parts = " ".join(f"{k}={v:.3f}" for k, v in t.items())
            print(f"batch {bid}: total={total:.3f} {parts}", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
