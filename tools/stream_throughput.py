"""Structured Streaming throughput receipt: rows/sec sustained by the
file-source → watermark → tumbling-window-aggregate → memory-sink chain
at local[32], across micro-batch sizes (maxFilesPerTrigger).

The dial under test is BATCH SIZE: tiny micro-batches measure per-batch
scheduling overhead (the latency end of the latency/throughput trade),
big ones amortize it toward batch-job throughput. Numbers recorded in
SCALING.md.

Run: python tools/stream_throughput.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

N_ROWS = 2_000_000
N_FILES = 64


def main():
    from pyspark_ingestion_spark.session import get_spark_session

    spark = get_spark_session(app_name="stream-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    src = tempfile.mkdtemp(prefix="stream_src_")
    try:
        spark.range(N_ROWS).select(
            F.timestamp_micros((F.lit(1_700_000_000_000_000) +
                                F.col("id") * 1_000_000)).alias("ts"),
            (F.col("id") % 50_000).alias("user_id"),
            (F.col("id") % 997).cast("double").alias("value"),
        ).repartition(N_FILES).write.mode("overwrite").parquet(src)

        schema = spark.read.parquet(src).schema
        for files_per_trigger in (1, 8, 64):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", files_per_trigger)
                .parquet(src)
                .withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "1 hour"), "user_id")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
            )
            name = f"sink_{files_per_trigger}"
            t0 = time.perf_counter()
            q = (stream.writeStream.outputMode("update")
                 .format("memory").queryName(name)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            dt = time.perf_counter() - t0
            batches = len(q.recentProgress)
            print(f"maxFilesPerTrigger={files_per_trigger:>2d}  "
                  f"{dt:6.2f}s  {N_ROWS/dt/1e6:5.2f}M rows/s  "
                  f"micro-batches={batches}", flush=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
