"""CDC upsert into a partitioned parquet lake — MERGE semantics without
a transactional table format.

The reference's lake had append-only ingestion with no update story;
real CDC feeds (Debezium-style row images) need upsert + delete. On a
plain-file lake the unit of atomic replacement is the partition, so the
merge is: restrict to the partitions the batch touches, latest-wins per
key, dynamic-partition-overwrite exactly those partitions back.
Untouched partitions are never read or rewritten — at 100 TB the cost
scales with the delta's partition footprint, not the table.

For multi-writer tables or snapshot isolation use a table format
(Delta/Iceberg/Hudi); this operator covers the single-writer pipeline
the ingestion loop already assumes (same contract as its idempotent
watermark batches).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_ingestion_spark.operators.relational import dedupe_latest
from pyspark_ingestion_spark.sources.writers import (
    overwrite_partitions,
    partition_path_segment as _partition_path_segment,
)


def cdc_upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    order_cols: list[str],
    partition_columns: list[str],
    file_format: str = "parquet",
    delete_col: str | None = None,
) -> None:
    """Merge a CDC batch into the lake at ``path``: insert-or-update
    latest-wins by ``key_cols`` ordered by ``order_cols``; rows whose
    ``delete_col`` is true are tombstones that remove the key.

    Ties on ``order_cols`` resolve toward the incoming batch (an update
    re-stating the current version must win over the stored row, or a
    re-run would flip-flop). The merged frame is ``localCheckpoint``ed
    before the write because Spark refuses to overwrite a path its own
    plan still scans.

    CONTRACT — partition values must be IMMUTABLE per key: the merge
    reads only the partitions present in the batch, so an update that
    MOVES a key to a different partition value cannot see (or remove)
    the key's stored row in its old partition — the lake would hold the
    key twice. Likewise a tombstone removes the key only from the
    partition value it carries. This is the standard constraint of
    partition-scoped CDC on plain files (partition on stable columns:
    creation date, tenant, region — never on mutable attributes); keys
    that genuinely change partition need a delete in the old partition
    + insert in the new, or a transactional table format.
    """
    # the batch's partition footprint — small by construction (a CDC
    # delta touches few partitions); this is the only driver-side list
    touched = [tuple(r) for r in updates.select(*partition_columns).distinct().collect()]
    if not touched:
        return

    upd = updates.withColumn("__src", F.lit(1))
    try:
        base = spark.read.format(file_format).load(path)
        part_filter = reduce(
            lambda a, b: a | b,
            [
                reduce(
                    lambda x, y: x & y,
                    [F.col(c) == F.lit(v) for c, v in zip(partition_columns, vals)],
                )
                for vals in touched
            ],
        )
        base = base.filter(part_filter).withColumn("__src", F.lit(0))
        merged = base.unionByName(upd, allowMissingColumns=True)
    except Exception as e:
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        merged = upd

    order = [F.col(c).desc() for c in order_cols] + [F.col("__src").desc()]
    latest = dedupe_latest(merged, key_cols, order)
    if delete_col is not None and delete_col in latest.columns:
        latest = latest.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    latest = latest.drop("__src").localCheckpoint(eager=True)
    overwrite_partitions(
        latest, path, partition_columns=partition_columns, file_format=file_format
    )

    # dynamic overwrite replaces only partitions PRESENT in the written
    # frame — a partition whose every key was tombstoned produces no
    # rows, so its old files would silently survive. Drop emptied
    # partition directories explicitly (Hadoop FS → works on any scheme).
    remaining = {
        tuple(r) for r in latest.select(*partition_columns).distinct().collect()
    }
    emptied = [vals for vals in touched if tuple(vals) not in remaining]
    if emptied:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for vals in emptied:
            sub = "/".join(
                _partition_path_segment(c, v)
                for c, v in zip(partition_columns, vals)
            )
            jpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{sub}")
            fs = jpath.getFileSystem(conf)
            fs.delete(jpath, True)
