"""Structured Streaming tests: file-sink ingest, session windows, dedup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark_ingestion_spark.streaming.pipeline import (
    read_stream_table,
    run_stream_to_memory,
    sessionized,
    stream_ingest_partitioned,
    tumbling_counts,
)


def test_stream_ingest_partitioned_exactly_once(spark, sf_dir, tmp_path):
    """Checkpointed file-sink ingest; re-running with the same checkpoint
    must not duplicate data (the streaming replacement for sync.json)."""
    out = str(tmp_path / "lake" / "events")
    ckpt = str(tmp_path / "ckpt" / "events")

    stream = read_stream_table(spark, sf_dir, "events").withColumn(
        "YEAR", F.year("ts").cast("string")
    )
    stream_ingest_partitioned(stream, out, ckpt, partition_columns=["YEAR"])

    n_static = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    first = spark.read.parquet(out).count()
    assert first == n_static
    assert os.path.isdir(os.path.join(out, "YEAR=2024"))

    # second increment: no new source files → no new rows (offsets in checkpoint)
    stream2 = read_stream_table(spark, sf_dir, "events").withColumn(
        "YEAR", F.year("ts").cast("string")
    )
    stream_ingest_partitioned(stream2, out, ckpt, partition_columns=["YEAR"])
    assert spark.read.parquet(out).count() == n_static


def test_streaming_session_windows_match_batch(spark, sf_dir):
    """Session windows computed over a stream equal the batch computation."""
    stream = read_stream_table(spark, sf_dir, "events")
    streamed = run_stream_to_memory(sessionized(stream), output_mode="complete")

    from pyspark_ingestion_spark.sources.readers import load_table

    batch = sessionized(load_table(spark, sf_dir, "events"))
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).isEmpty() and batch.exceptAll(streamed).isEmpty()


def test_streaming_drop_duplicates_within_watermark(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark removes re-deliveries of the same event id."""
    # duplicate the source: two copies of every event
    dup_dir = str(tmp_path / "dups")
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "events").limit(200)
    e.unionAll(e).coalesce(1).write.parquet(dup_dir)

    schema = spark.read.parquet(dup_dir).schema
    stream = spark.readStream.schema(schema).parquet(dup_dir)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    result = run_stream_to_memory(deduped, output_mode="append")
    assert result.count() == 200
    assert result.groupBy("event_id").count().filter("count > 1").isEmpty()


def test_tumbling_counts_total_preserved(spark, sf_dir):
    from pyspark_ingestion_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "events")
    agg = tumbling_counts(e, "1 hour")
    assert agg.agg(F.sum("n")).first()[0] == e.count()


def test_foreach_batch_overwrite_sink(spark, sf_dir, tmp_path):
    """foreachBatch + dynamic partition overwrite: replaying the stream
    with a FRESH checkpoint (simulated replay) rewrites partitions
    instead of duplicating rows."""
    out = str(tmp_path / "fb_lake")
    stream = read_stream_table(spark, sf_dir, "events").withColumn(
        "YEAR", F.year("ts").cast("string")
    )
    from pyspark_ingestion_spark.streaming.pipeline import stream_foreach_batch_overwrite

    stream_foreach_batch_overwrite(stream, out, str(tmp_path / "ck1"), ["YEAR"])
    n = spark.read.parquet(out).count()
    assert n == spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # replay everything (new checkpoint → batch re-delivered) — overwrite
    # keeps the sink idempotent where plain append would double it
    stream2 = read_stream_table(spark, sf_dir, "events").withColumn(
        "YEAR", F.year("ts").cast("string")
    )
    stream_foreach_batch_overwrite(stream2, out, str(tmp_path / "ck2"), ["YEAR"])
    assert spark.read.parquet(out).count() == n


def test_stream_cdc_upsert_applies_changes(spark, tmp_path):
    """CDC feed applied through real Structured Streaming foreachBatch:
    latest-wins per key + tombstones, same result as the batch merge."""
    from pyspark_ingestion_spark.ingestion.cdc import cdc_upsert
    from pyspark_ingestion_spark.sources.writers import write_partitioned
    from pyspark_ingestion_spark.streaming.pipeline import stream_cdc_upsert

    feed_dir = str(tmp_path / "feed")
    base = spark.createDataFrame(
        [(1, "a-v1", 100, "2019", False), (3, "c-v1", 100, "2020", False)],
        "id long, val string, ver long, YEAR string, deleted boolean",
    )
    lake = str(tmp_path / "lake")
    write_partitioned(base.drop("deleted"), lake, partition_columns=["YEAR"],
                      mode="overwrite", compression="snappy")

    changes = spark.createDataFrame(
        [(1, "a-v2", 200, "2019", False),
         (2, "b-v1", 200, "2019", False),
         (3, None, 200, "2020", True)],
        "id long, val string, ver long, YEAR string, deleted boolean",
    )
    changes.write.parquet(feed_dir)

    stream = spark.readStream.schema(changes.schema).parquet(feed_dir)
    stream_cdc_upsert(
        stream, lake, checkpoint=str(tmp_path / "ckpt"),
        key_cols=["id"], order_cols=["ver"], partition_columns=["YEAR"],
        delete_col="deleted",
    )
    out = {r["id"]: r["val"] for r in spark.read.parquet(lake).collect()}
    assert out == {1: "a-v2", 2: "b-v1"}  # 3 tombstoned

    # equivalent batch merge produces the same lake
    lake2 = str(tmp_path / "lake2")
    write_partitioned(base.drop("deleted"), lake2, partition_columns=["YEAR"],
                      mode="overwrite", compression="snappy")
    cdc_upsert(spark, changes, lake2, key_cols=["id"], order_cols=["ver"],
               partition_columns=["YEAR"], delete_col="deleted")
    out2 = {r["id"]: r["val"] for r in spark.read.parquet(lake2).collect()}
    assert out2 == out
