"""Partitioned lake writers.

Parity: reference ``write_partitioned`` (spark.py:51-75) — repartition on
the partition columns then ``partitionBy`` write, gzip default, csv with
header and no quoting, avro via the external databricks package. Here
avro is builtin, and idempotent incremental loads come from dynamic
partition overwrite instead of the reference's append + GCS-rename hack
(reference ingestion.py:125-134, SURVEY §4 O-GAP6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_FORMATS = {"parquet", "csv", "json", "orc", "avro"}

#: characters Spark/Hive percent-escape in partition directory names
#: (ExternalCatalogUtils.escapePathName; verified against actual written
#: dirs on 4.1.2: 'a:b'→'a%3Ab', 'a/b'→'a%2Fb', 'a#b'→'a%23b',
#: 'a%b'→'a%25b'; plain spaces are NOT escaped)
_PATH_ESCAPE = set('"#%\'*/:=?\\\x7f{[]^') | {chr(c) for c in range(0x20)}


def partition_path_segment(col: str, v) -> str:
    """One ``col=value`` path segment exactly as Spark writes it —
    percent-escaped specials, ``__HIVE_DEFAULT_PARTITION__`` for
    NULL/empty. Raw ``str(v)`` would diverge on exactly those values
    (a delete would silently miss the directory; a python-side write
    would lay out a directory the JVM readers/overwriters don't match).
    Shared by the CDC delete path and the pure-python avro writer so
    both engines agree on the lake layout byte-for-byte."""
    if v is None or str(v) == "":
        return f"{col}=__HIVE_DEFAULT_PARTITION__"
    escaped = "".join(
        f"%{ord(ch):02X}" if ch in _PATH_ESCAPE else ch for ch in str(v)
    )
    return f"{col}={escaped}"


_AVRO_PROBE: dict[int, bool] = {}


def _jvm_avro_available(spark) -> bool:
    """True when the spark-avro datasource resolves on the JVM side.

    Preferred at scale (codegen'd, remote-URI-capable); clusters add it
    via ``spark.jars.packages org.apache.spark:spark-avro_2.13:<ver>``.
    Probes actual datasource resolution (a bare Class.forName is not
    enough: spark-sql ships a few avro classes without registering the
    format); the nonexistent-path probe distinguishes "source resolved,
    path missing" from "source missing". Result cached per session.
    """
    key = id(spark)
    if key not in _AVRO_PROBE:
        try:
            spark.read.format("avro").schema("x INT").load("/nonexistent/__avro_probe__")
            _AVRO_PROBE[key] = True
        except Exception as e:
            _AVRO_PROBE[key] = "Failed to find data source" not in str(e)
    return _AVRO_PROBE[key]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_columns: list[str] | None = None,
    mode: str = "errorifexists",
    compression: str | None = "gzip",
    file_format: str = "parquet",
    max_records_per_file: int | None = None,
    **options,
) -> None:
    """Write ``df`` partitioned Hive-style under ``path``.

    The pre-write ``repartition(*partition_columns)`` aligns the shuffle
    with the directory layout → one task (and one file) per partition
    value per batch instead of num_tasks × num_partitions small files.
    At 100 TB, cap file size with ``max_records_per_file`` so single hot
    partitions still split across tasks downstream.
    """
    if file_format not in _FORMATS:
        raise ValueError(f"unsupported format {file_format!r}; one of {sorted(_FORMATS)}")

    if file_format == "avro" and not _jvm_avro_available(df.sparkSession):
        # pip pyspark ships without the spark-avro datasource jar; fall
        # back to the pure-python container codec (sources/avro_py.py).
        import warnings

        from pyspark_ingestion_spark.sources.avro_py import write_avro

        # honor DYNAMIC partition overwrite exactly like the JVM writer
        # would: mode="overwrite" under the dynamic conf must replace
        # only the partitions present in df, never rmtree the table
        # (overwrite_partitions/cdc_upsert/maintain_rollup depend on it)
        if (
            mode == "overwrite"
            and partition_columns
            and df.sparkSession.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            ).lower()
            == "dynamic"
        ):
            mode = "overwrite_partitions"
        # codec map: the pure-python codec supports null/deflate only;
        # detune LOUDLY, never silently
        codec = {None: "null", "none": "null", "uncompressed": "null",
                 "deflate": "deflate", "gzip": "deflate"}.get(
            compression if compression is None else compression.lower()
        )
        if codec is None:
            warnings.warn(
                f"pure-python avro fallback cannot encode {compression!r}; "
                "using deflate", stacklevel=2,
            )
            codec = "deflate"
        dropped = {k: v for k, v in options.items()}
        if max_records_per_file:
            dropped["max_records_per_file"] = max_records_per_file
        if dropped:
            warnings.warn(
                f"pure-python avro fallback ignores writer options {sorted(dropped)}",
                stacklevel=2,
            )
        write_avro(df, path, partition_columns=partition_columns, mode=mode,
                   codec=codec)
        return

    out = df
    if partition_columns:
        out = out.repartition(*partition_columns)

    writer = out.write.mode(mode).format(file_format)
    if partition_columns:
        writer = writer.partitionBy(*partition_columns)
    if compression:
        writer = writer.option("compression", compression)
    if file_format == "csv":
        options.setdefault("header", "true")
        options.setdefault("quote", "\u0000")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    for k, v in options.items():
        writer = writer.option(k, str(v))
    writer.save(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_columns: list[str],
    file_format: str = "parquet",
    compression: str | None = "snappy",
    **options,
) -> None:
    """Idempotent incremental write: replace exactly the partitions present in ``df``.

    Requires ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by
    the session factory). Re-running the same batch rewrites the same
    partitions rather than duplicating rows — the exactly-once story the
    reference lacked (SURVEY §4 O-GAP6).
    """
    write_partitioned(
        df,
        path,
        partition_columns=partition_columns,
        mode="overwrite",
        compression=compression,
        file_format=file_format,
        **options,
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_columns: list[str],
    num_buckets: int = 32,
    sort_columns: list[str] | None = None,
    file_format: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) catalog table.

    Bucketing pre-shuffles the data ONCE at write time: two tables
    bucketed on the same key with the same bucket count join with zero
    Exchange nodes — at 100 TB that turns every repeated fact⋈fact join
    on the bucket key from a full shuffle into a local zip of bucket
    files. Requires saveAsTable (bucket metadata lives in the catalog).
    """
    writer = df.write.format(file_format).mode(mode).bucketBy(
        num_buckets, *bucket_columns
    )
    if sort_columns:
        writer = writer.sortBy(*sort_columns)
    writer.saveAsTable(table)


def compact_partitions(
    spark,
    path: str,
    partition_columns: list[str],
    file_format: str = "parquet",
    compression: str | None = "snappy",
    max_records_per_file: int | None = None,
    checkpoint_dir: str | None = None,
) -> None:
    """Rewrite a partitioned lake directory to heal small-file buildup.

    Incremental appends leave one file per batch per partition; after N
    batches a partition holds N small files and scan task scheduling
    degrades. This re-reads the layout and rewrites each partition as
    one (or ``max_records_per_file``-bounded) file via dynamic partition
    overwrite.

    The read must be detached from the target path (Spark refuses to
    overwrite a path its plan still reads from). Default is
    ``localCheckpoint`` — executor-memory blocks with NO lineage
    fallback: losing an executor mid-compaction after the overwrite
    started is unrecoverable. Pass ``checkpoint_dir`` to use a reliable
    checkpoint (HDFS/object store) instead for production compaction, or
    use a transactional table format where swaps are metadata-only.
    Either way, right-size the batch: compact partition subsets at very
    large scale.
    """
    df = spark.read.format(file_format).load(path)
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        df = df.checkpoint(eager=True)
    else:
        df = df.localCheckpoint(eager=True)
    write_partitioned(
        df,
        path,
        partition_columns=partition_columns,
        mode="overwrite",
        compression=compression,
        file_format=file_format,
        max_records_per_file=max_records_per_file,
    )


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    file_format: str = "parquet",
    mode: str = "errorifexists",
    num_files: int | None = None,
    compression: str | None = "snappy",
) -> None:
    """Write data clustered for scan pruning: range-partition on
    ``cluster_cols`` then sort within each task before writing.

    Hive-style directory partitioning (``write_partitioned``) prunes on
    LOW-cardinality columns; for high-cardinality keys (ids, timestamps)
    the pruning lever is parquet row-group/file min-max statistics —
    which only bite when values are physically clustered. Range
    partitioning makes files cover disjoint key ranges and the in-file
    sort tightens row-group stats, so a point or range predicate on the
    cluster key scans one file's worth of data instead of all of them.
    The write costs one range-exchange (sampling pass + shuffle); reads
    on the clustered key repay it every scan. The same layout also
    accelerates the sort side of sort-merge joins on that key.

    WHICH layout key to cluster on (r14): one hot filter column →
    cluster on it directly (this function, nothing fancier). Two
    columns filtered together → ``operators.relational.hilbert_index``
    (the 2-D walk; tighter file bounding boxes than z-order — measured
    in ``hilbert_layout_pruning``). Three or more →
    ``operators.relational.hilbert_index_nd`` (Skilling's walk, any
    d with ``bits·d ≤ 63``; 3-D footer-pruning proof in
    tests/test_plans.py). The curves' orientations differ (2-D walk vs
    Skilling), so never mix indexes built by the two across a table's
    files — pick one per table and stay on it. Beyond ~4 dims the
    per-file bounding boxes approach the full domain and min-max
    pruning stops paying; prefer the dominant 2–3 filter dims.
    """
    out = df
    if num_files:
        out = out.repartitionByRange(num_files, *cluster_cols)
    else:
        out = out.repartitionByRange(*cluster_cols)
    out = out.sortWithinPartitions(*cluster_cols)
    writer = out.write.mode(mode).format(file_format)
    if compression:
        writer = writer.option("compression", compression)
    writer.save(path)
