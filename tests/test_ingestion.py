"""Incremental-ingestion loop tests (FIXTURES.md §B semantics).

Property under test (reference ingestion.py:16-103): first run moves all
rows above the initial watermark and advances it to max(ref); an
immediate second run moves nothing; rows at-or-below the watermark are
never ingested.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import types as T

from pyspark_ingestion_spark.ingestion import (
    TableSettings,
    ingest_table,
    read_watermark,
)


def _sap_df(spark):
    rows = [
        (1, "20190301", "120000", 10.0, "P01"),
        (2, "20190415", "010203", 20.0, "P02"),
        (3, "20200229", "235959", 30.0, "P01"),  # leap day
        (4, "20181231", "000000", 40.0, "P03"),  # below first watermark
        (5, "20201115", "081500", 50.0, "P05"),
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ERDAT", T.StringType()),
            T.StructField("ERZET", T.StringType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("plant", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_sap_ingest_twice(spark, tmp_path):
    table_path = str(tmp_path / "sap" / "docs")
    settings = TableSettings(
        ref_column="TS_REF",
        ref_first_value="2019-01-01T00:00:00.000000Z",
        date_column="ERDAT",
        time_column="ERZET",
    )

    r1 = ingest_table(_sap_df(spark), "sap", "docs", table_path, settings)
    assert r1.moved_something and r1.n_rows == 4  # doc 4 below watermark
    assert r1.watermark.ref_last_value == "2020-11-15T08:15:00.000000Z"

    # lake layout: Hive-style YEAR=/MONTH= dirs, non-zero-padded
    assert os.path.isdir(os.path.join(table_path, "YEAR=2019", "MONTH=3"))
    assert os.path.isdir(os.path.join(table_path, "YEAR=2020", "MONTH=2"))

    out = spark.read.parquet(table_path)
    assert out.count() == 4
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 3, 5}
    # partition columns are strings (pinned semantics)
    assert dict(out.dtypes)["YEAR"] == "string"
    # composite parse: 20200229 235959 → leap-day timestamp
    leap = out.filter("doc_id = 3").collect()[0]["TS_REF"]
    assert leap == dt.datetime(2020, 2, 29, 23, 59, 59)

    # second run: nothing new
    r2 = ingest_table(_sap_df(spark), "sap", "docs", table_path, settings)
    assert not r2.moved_something and r2.n_rows == 0
    assert r2.watermark.ref_last_value == r1.watermark.ref_last_value
    assert spark.read.parquet(table_path).count() == 4


def test_sap_late_rows_ingested_next_run(spark, tmp_path):
    """Rows arriving with ref above the advanced watermark flow in run 2."""
    table_path = str(tmp_path / "sap" / "docs2")
    settings = TableSettings(
        ref_column="TS_REF",
        ref_first_value="2019-01-01T00:00:00.000000Z",
        date_column="ERDAT",
        time_column="ERZET",
    )
    ingest_table(_sap_df(spark), "sap", "docs2", table_path, settings)

    newer = _sap_df(spark).unionByName(
        _sap_df(spark)
        .limit(1)
        .selectExpr(
            "CAST(6 AS LONG) AS doc_id",
            "'20210101' AS ERDAT",
            "'000001' AS ERZET",
            "CAST(60.0 AS DOUBLE) AS amount",
            "'P01' AS plant",
        )
    )
    r2 = ingest_table(newer, "sap", "docs2", table_path, settings)
    assert r2.n_rows == 1
    assert r2.watermark.ref_last_value == "2021-01-01T00:00:01.000000Z"
    assert spark.read.parquet(table_path).count() == 5


def test_lims_null_refs_dropped(spark, tmp_path):
    table_path = str(tmp_path / "lims" / "samples")
    rows = [
        (1, dt.datetime(2020, 5, 1, 10), 1.5, "OK"),
        (2, None, 2.5, "KO"),  # NULL ref → dropped (P1)
        (3, dt.datetime(2020, 6, 2, 11), 3.5, "PENDING"),
    ]
    schema = T.StructType(
        [
            T.StructField("sample_id", T.LongType()),
            T.StructField("MODIFIED_ON", T.TimestampType()),
            T.StructField("result", T.DoubleType()),
            T.StructField("status", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    settings = TableSettings(
        ref_column="MODIFIED_ON", ref_first_value="2020-01-01T00:00:00.000000Z"
    )
    r = ingest_table(df, "lims", "samples", table_path, settings)
    assert r.n_rows == 2
    out = spark.read.parquet(table_path)
    assert {x["sample_id"] for x in out.collect()} == {1, 3}


def test_c1_projection_pii_and_week_partitions(spark, tmp_path):
    table_path = str(tmp_path / "c1" / "contacts")
    rows = [
        # ISO week pinning: 2019-12-30 is ISO week 1 of 2020 (but YEAR from ts = 2019)
        (1, "a@example.com", True, dt.datetime(2019, 12, 30, 12), "drop-me"),
        (2, None, False, dt.datetime(2020, 6, 15, 9), "drop-me"),
    ]
    schema = T.StructType(
        [
            T.StructField("contact_id", T.LongType()),
            T.StructField("EMAIL__C", T.StringType()),
            T.StructField("IS_PRO__C", T.BooleanType()),
            T.StructField("LASTMODIFIEDDATE", T.TimestampType()),
            T.StructField("extra_col", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    settings = TableSettings(
        ref_column="LASTMODIFIEDDATE",
        ref_first_value="2019-01-01T00:00:00.000000Z",
        columns_to_import=["contact_id", "EMAIL__C", "IS_PRO__C", "LASTMODIFIEDDATE"],
        pii_sha256_columns=["EMAIL__C"],
        stringify_columns=["IS_PRO__C"],
    )
    r = ingest_table(df, "c1", "contacts", table_path, settings)
    assert r.n_rows == 2

    out = spark.read.parquet(table_path)
    assert "extra_col" not in out.columns  # P3 projection
    got = {x["contact_id"]: x for x in out.collect()}
    # F5: sha256, 64 hex chars; NULL stays NULL
    assert len(got[1]["EMAIL__C"]) == 64 and got[2]["EMAIL__C"] is None
    # F6: Spark-style lowercase boolean strings (pinned)
    assert got[1]["IS_PRO__C"] == "true" and got[2]["IS_PRO__C"] == "false"
    # F4: ISO week — 2019-12-30 → week 1
    assert got[1]["WEEK"] == "1" and got[1]["YEAR"] == "2019"
    assert os.path.isdir(os.path.join(table_path, "YEAR=2019", "WEEK=1"))


def test_watermark_file_shape(spark, tmp_path):
    """sync.json keeps the exact reference shape (ingestion.py:149-156)."""
    table_path = str(tmp_path / "lims" / "shape")
    rows = [(1, dt.datetime(2020, 5, 1, 10, 30, 15, 123456), 1.0, "OK")]
    schema = "sample_id long, MODIFIED_ON timestamp, result double, status string"
    df = spark.createDataFrame(rows, schema)
    settings = TableSettings(
        ref_column="MODIFIED_ON", ref_first_value="2020-01-01T00:00:00.000000Z"
    )
    ingest_table(df, "lims", "shape", table_path, settings)

    with open(os.path.join(table_path, "sync.json")) as f:
        doc = json.load(f)
    assert doc == {
        "sync": {
            "system": "lims",
            "table_name": "shape",
            "ref_column": "MODIFIED_ON",
            "ref_last_value": "2020-05-01T10:30:15.123456Z",
        }
    }

    wm = read_watermark(table_path, "lims", "shape", "MODIFIED_ON", "x")
    assert wm.ref_last_value == "2020-05-01T10:30:15.123456Z"


def test_unknown_system_raises(spark):
    with pytest.raises(ValueError, match="unknown system"):
        from pyspark_ingestion_spark.ingestion.prep import prepare

        prepare("nope", None, None, None)


# ----------------------------------------------------- settings catalog

def test_parse_data_dictionary_groups_and_refs():
    from pyspark_ingestion_spark.sources.settings import parse_data_dictionary

    rows = [
        {"TABLE_SCHEMA": "S", "TABLE_NAME": "T1", "COLUMN_NAME": "A",
         "INCREMENTAL_REFERENCE": None},
        {"TABLE_SCHEMA": "S", "TABLE_NAME": "T1", "COLUMN_NAME": "B",
         "INCREMENTAL_REFERENCE": "B"},
        {"TABLE_SCHEMA": "S", "TABLE_NAME": "T1", "COLUMN_NAME": "A",
         "INCREMENTAL_REFERENCE": None},  # duplicate column collapses
        {"TABLE_SCHEMA": "S", "TABLE_NAME": "T2", "COLUMN_NAME": "X",
         "INCREMENTAL_REFERENCE": None},  # no ref anywhere → skipped
    ]
    settings = parse_data_dictionary(rows)
    assert set(settings) == {"S.T1"}
    assert settings["S.T1"].ref_column == "B"
    assert settings["S.T1"].columns_to_import == ["A", "B"]


def test_load_settings_roundtrip(tmp_path, monkeypatch):
    import json

    from pyspark_ingestion_spark.sources.settings import load_settings

    doc = {
        "connection": {
            "sap": {
                "dbms": "oracle",
                "host": "db.example",
                "port": 1521,
                "service": "ORCL",
                "user_env": "SAP_USER",
                "password_env": "SAP_PASSWORD",
                "table-settings": {
                    "S.T1": {"ref_column": "UPDATED_AT", "fetchsize": 5000}
                },
            }
        }
    }
    p = tmp_path / "settings.json"
    p.write_text(json.dumps(doc))
    monkeypatch.setenv("SAP_USER", "alice")
    systems = load_settings(str(p))
    assert systems["sap"].dbms == "oracle"
    assert systems["sap"].user == "alice"
    assert systems["sap"].password is None  # env var not set
    assert systems["sap"].tables["S.T1"].ref_column == "UPDATED_AT"
    assert systems["sap"].tables["S.T1"].fetchsize == 5000


# ------------------------------------------------------- format surface

def test_write_formats_roundtrip(spark, sf_dir, tmp_path):
    """parquet/csv/json/orc/avro partitioned round-trips are lossless
    (avro is builtin in Spark 4 — reference needed the external
    com.databricks.spark.avro package, reference spark.py:5-7)."""
    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.sources.readers import load_table, read_file
    from pyspark_ingestion_spark.sources.writers import write_partitioned

    src = (
        load_table(spark, sf_dir, "orders")
        .limit(500)
        .withColumn("YEAR", F.year("o_orderdate").cast("string"))
    )
    expected = src.drop("YEAR")
    # avro included unconditionally: the JVM datasource when present,
    # else the pure-python container fallback (sources/avro_py.py)
    formats = ["parquet", "csv", "json", "orc", "avro"]
    for fmt in formats:
        out = str(tmp_path / fmt)
        write_partitioned(
            src, out, partition_columns=["YEAR"], mode="overwrite",
            compression=None, file_format=fmt,
        )
        back = read_file(spark, out, file_format=fmt).drop("YEAR")
        if fmt in ("csv", "json", "avro"):
            # csv/json re-infer types; avro stores timestamps as micros;
            # normalize through a cast to the source schema
            back = back.select(
                *[F.col(f.name).cast(f.dataType) for f in expected.schema.fields]
            )
        assert back.count() == 500, fmt
        assert back.exceptAll(expected).isEmpty(), fmt
        assert expected.exceptAll(back).isEmpty(), fmt


def test_unsupported_format_raises(spark, sf_dir):
    import pytest

    from pyspark_ingestion_spark.sources.readers import load_table
    from pyspark_ingestion_spark.sources.writers import write_partitioned

    with pytest.raises(ValueError, match="unsupported format"):
        write_partitioned(load_table(spark, sf_dir, "region"), "/tmp/x", file_format="xml")


def test_compact_partitions_merges_small_files(spark, sf_dir, tmp_path):
    """Three appends → many files per partition; compaction → 1 per partition,
    same rows."""
    import glob

    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.sources.readers import load_table
    from pyspark_ingestion_spark.sources.writers import compact_partitions, write_partitioned

    out = str(tmp_path / "lake")
    src = load_table(spark, sf_dir, "orders").withColumn(
        "YEAR", F.year("o_orderdate").cast("string")
    )
    for chunk in range(3):
        write_partitioned(
            src.filter(F.col("o_orderkey") % 3 == chunk).repartition(4),
            out, partition_columns=["YEAR"], mode="append", compression="snappy",
        )
    n_before = src.count()
    files_before = len(glob.glob(f"{out}/YEAR=*/part-*"))
    compact_partitions(spark, out, ["YEAR"])
    files_after = len(glob.glob(f"{out}/YEAR=*/part-*"))
    n_parts = len(glob.glob(f"{out}/YEAR=*"))
    assert spark.read.parquet(out).count() == n_before
    assert files_after == n_parts < files_before


def test_overwrite_mode_retry_is_idempotent(spark, tmp_path):
    """The documented exactly-once contract (SURVEY §4 O-GAP6): with
    mode='overwrite' (dynamic partition overwrite), re-running a batch
    after a crash-between-data-and-watermark rewrites the same partitions
    instead of duplicating rows."""
    table_path = str(tmp_path / "lims" / "retry")
    rows = [
        (1, dt.datetime(2020, 5, 1, 10), 1.0, "OK"),
        (2, dt.datetime(2020, 5, 2, 11), 2.0, "OK"),
    ]
    schema = "sample_id long, MODIFIED_ON timestamp, result double, status string"
    df = spark.createDataFrame(rows, schema)
    settings = TableSettings(
        ref_column="MODIFIED_ON", ref_first_value="2020-01-01T00:00:00.000000Z"
    )
    r1 = ingest_table(df, "lims", "retry", table_path, settings, mode="overwrite")
    assert r1.n_rows == 2

    # simulate crash after data write but before watermark commit:
    # reset sync.json to the initial state and re-run the same batch
    os.remove(os.path.join(table_path, "sync.json"))
    r2 = ingest_table(df, "lims", "retry", table_path, settings, mode="overwrite")
    assert r2.n_rows == 2
    # dynamic overwrite replaced the partitions — no duplicates
    assert spark.read.parquet(table_path).count() == 2


# ------------------------------------------------------------- CLI

def test_cli_parse_dd_and_file_ingest(spark, tmp_path):
    """End-to-end CLI: data-dictionary CSV → settings JSON → file-source
    ingest of one table (reference bin/ flow without JDBC/3DES)."""
    from pyspark_ingestion_spark.cli import main

    # data dictionary → table settings
    dd = tmp_path / "dd.csv"
    dd.write_text(
        "TABLE_SCHEMA,TABLE_NAME,COLUMN_NAME,INCREMENTAL_REFERENCE\n"
        "S,T1,sample_id,\n"
        "S,T1,MODIFIED_ON,MODIFIED_ON\n"
        "S,T1,result,\n"
    )
    out_json = tmp_path / "table-settings.json"
    assert main(["parse-dd", "--csv", str(dd), "--out", str(out_json)]) == 0
    table_settings = json.loads(out_json.read_text())
    assert table_settings["S.T1"]["ref_column"] == "MODIFIED_ON"

    # staged source parquet
    src = tmp_path / "staged.parquet"
    rows = [(1, dt.datetime(2020, 5, 1, 10), 1.0), (2, dt.datetime(2020, 6, 1, 11), 2.0)]
    spark.createDataFrame(rows, "sample_id long, MODIFIED_ON timestamp, result double")\
        .write.parquet(str(src))

    # settings catalog wiring the parsed table under system 'lims'
    settings_doc = {
        "connection": {
            "lims": {"dbms": "oracle", "table-settings": {
                "S.T1": {k: v for k, v in table_settings["S.T1"].items()
                         if k in ("ref_column", "ref_first_value", "columns_to_import")}
            }}
        }
    }
    settings_path = tmp_path / "settings.json"
    settings_path.write_text(json.dumps(settings_doc))

    lake = tmp_path / "lake"
    assert main([
        "ingest", "--settings", str(settings_path), "--system", "lims",
        "--table", "S.T1", "--base-path", str(lake), "--source-path", str(src),
    ]) == 0
    out = spark.read.parquet(str(lake / "lims" / "S.T1"))
    assert out.count() == 2
    assert os.path.exists(str(lake / "lims" / "S.T1" / "sync.json"))


def test_spread_input_guard(spark):
    """spread_input (r10) is a NO-OP — same DataFrame object, no added
    shuffle — whenever the input already has at least the target
    partition count, and a round-robin repartition to exactly the
    target otherwise, with rows preserved. The guard is what makes the
    small-SF parallelism fix free at real scale, so it gets its own
    pin."""
    from pyspark_ingestion_spark.sources.readers import spread_input

    wide = spark.range(0, 1000, 1, 16)
    assert spread_input(wide, min_partitions=16) is wide
    assert spread_input(wide, min_partitions=8) is wide  # above target

    narrow = spark.range(0, 1000, 1, 1)
    out = spread_input(narrow, min_partitions=8)
    assert out is not narrow
    assert out.rdd.getNumPartitions() == 8
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))

    # default target: the cluster's defaultParallelism
    dp = spark.sparkContext.defaultParallelism
    assert spread_input(narrow).rdd.getNumPartitions() == dp


def test_spread_input_no_rdd_probe_for_file_scans(spark, tmp_path):
    """r11 verdict nit: for FILE-backed input the guard decides from
    FileIndex + catalyst stats — building the wired queries must NOT
    convert the plan to an RDD graph (full physical planning per query
    build). Pinned by poisoning DataFrame.rdd for the duration."""
    from pyspark.sql import DataFrame

    from pyspark_ingestion_spark.sources.readers import (
        _estimated_scan_splits,
        spread_input,
    )

    path = str(tmp_path / "t")
    spark.range(0, 5000).selectExpr(
        "id", "repeat('x', 100) AS pad"
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)

    est = _estimated_scan_splits(df)
    assert est is not None and est >= 1

    orig = DataFrame.rdd
    try:
        DataFrame.rdd = property(lambda self: (_ for _ in ()).throw(
            AssertionError("RDD conversion during spread_input build")))
        out = spread_input(df, min_partitions=8)
    finally:
        DataFrame.rdd = orig
    # the tiny single-file scan estimates narrow -> round-robin spread
    assert out is not df
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 5000


def test_estimated_scan_splits_single_scan_shapes_only(spark, tmp_path):
    """r12 ADVICE: the metadata estimate only reasons about the
    UNDER-estimate direction, so it must refuse (None -> rdd probe) any
    plan whose partition count is not set by one scan's splits: joins
    (count set by the shuffle), repartition/coalesce (set by the
    operator). A caller-supplied corpus shaped like either would
    otherwise over-estimate and silently skip the spread that keeps a
    CPU-heavy stage parallel."""
    from pyspark_ingestion_spark.sources.readers import _estimated_scan_splits

    pa = str(tmp_path / "a")
    pb = str(tmp_path / "b")
    spark.range(0, 5000).selectExpr("id", "repeat('x', 100) AS pad").coalesce(
        1
    ).write.parquet(pa)
    spark.range(0, 500).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(pb)
    a = spark.read.parquet(pa)
    b = spark.read.parquet(pb)

    # single scan (+ narrow ops): trusted
    assert _estimated_scan_splits(a) is not None
    assert _estimated_scan_splits(a.select("id").filter("id > 10")) is not None
    # join-shaped (two leaves): refused
    assert _estimated_scan_splits(a.join(b, "id")) is None
    assert _estimated_scan_splits(a.unionByName(a)) is None
    # explicit partition-count operators: refused
    assert _estimated_scan_splits(a.coalesce(1)) is None
    assert _estimated_scan_splits(a.repartition(4)) is None
    assert _estimated_scan_splits(a.repartition(4, "id")) is None
    # shuffle-exchange-inserting single-leaf shapes (r13, ADVICE):
    # Aggregate / global Sort / Window / Deduplicate set the frame's
    # partition count via spark.sql.shuffle.partitions, not the scan
    assert _estimated_scan_splits(a.groupBy("id").count()) is None
    assert _estimated_scan_splits(a.orderBy("id")) is None
    assert _estimated_scan_splits(a.distinct()) is None
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("id").orderBy("id")
    assert _estimated_scan_splits(a.select("id", F.row_number().over(w).alias("r"))) is None
    # narrow Generate (explode) stays trusted — partition-preserving
    assert (
        _estimated_scan_splits(
            a.select("id", F.explode(F.split("pad", "x")).alias("c"))
        )
        is not None
    )
    # and spread_input still spreads such a frame (rdd-probe fallback)
    from pyspark_ingestion_spark.sources.readers import spread_input

    out = spread_input(a.coalesce(1), min_partitions=8)
    assert out.rdd.getNumPartitions() == 8


def test_cli_ingest_all_derby_jdbc(spark, tmp_path):
    """The ingest-all CLI over a LIVE JDBC source (embedded Derby, the
    reference's batch-all-tables-ingestion.py flow end-to-end): every
    table of the system ingests from the DBMS through the settings
    catalog's dbms→URL dispatch, watermarks advance per table, and a
    SECOND invocation moves nothing — the reference's 'moving_something'
    loop contract without a network database."""
    from pyspark_ingestion_spark.cli import main

    spark._jvm.System.setProperty("derby.system.home", str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    seeds = {
        "T1": [(1, dt.datetime(2020, 5, 1, 10))],
        "T2": [(2, dt.datetime(2020, 6, 2, 11)),
               (3, dt.datetime(2020, 7, 3, 12))],
    }
    for t, rows in seeds.items():
        spark.createDataFrame(rows, "id long, modified_on timestamp") \
            .write.format("jdbc").option("url", url).option("dbtable", t) \
            .option("driver", drv).save()

    ts = {"ref_column": "modified_on",
          "ref_first_value": "2019-01-01T00:00:00.000000Z"}
    settings_doc = {"connection": {"lims": {
        "dbms": "derby", "service": f"{tmp_path}/db", "driver": drv,
        "table-settings": {"T1": dict(ts), "T2": dict(ts)},
    }}}
    sp = tmp_path / "settings.json"
    sp.write_text(json.dumps(settings_doc))
    lake = tmp_path / "lake"
    args = ["ingest-all", "--settings", str(sp), "--system", "lims",
            "--base-path", str(lake)]

    assert main(args) == 0
    assert spark.read.parquet(str(lake / "lims" / "T1")).count() == 1
    assert spark.read.parquet(str(lake / "lims" / "T2")).count() == 2

    assert main(args) == 0  # watermarks advanced: nothing moves
    assert spark.read.parquet(str(lake / "lims" / "T1")).count() == 1
    assert spark.read.parquet(str(lake / "lims" / "T2")).count() == 2


def test_jdbc_derby_incremental_ingest(spark, tmp_path):
    """S1 executed against a REAL JDBC source — embedded Derby (the
    jars ship with pyspark, no network): the watermark predicate is
    pushed into the REMOTE WHERE via read_jdbc(predicates=...), proven
    by (a) the executed plan containing no Spark-side Filter while the
    scan still returns only above-watermark rows (the drop happened in
    the DBMS) and (b) one scan partition per predicate. Three
    ingest_table batches mirror reference ingestion.py:16-103 through
    spark.py:119-133: initial load, a late source row crossing alone,
    then an empty batch that moves nothing. (This replaces a duplicate
    of test_lake_schema_evolution_merge_schema that shadowed it.)"""
    from pyspark_ingestion_spark.sources.readers import (
        jdbc_watermark_predicate,
        read_jdbc,
    )

    # unit surface: the dialect dispatch mirrors DBMS_TO_URL
    assert jdbc_watermark_predicate("m", "2020-01-02T03:04:05.000000Z",
                                    dialect="oracle") \
        == "\"m\" > TIMESTAMP '2020-01-02 03:04:05.000000'"
    # r11 advice: SQL Server literals must be language-invariant —
    # ISO 8601 WITH the T for timestamps, unseparated yyyyMMdd for
    # dates; the space-separated form is parsed per SET DATEFORMAT and
    # can silently under-fetch (month/day swap) at the source
    # fractions truncate to 3 digits (legacy datetime raises Msg 241 on
    # more; truncation only widens the predicate -> safe over-fetch),
    # and a space-separated input is normalized back to the T form
    assert jdbc_watermark_predicate("m", "2020-01-02T03:04:05.000000Z",
                                    dialect="sqlserver", quote="") \
        == "m > '2020-01-02T03:04:05.000'"
    assert jdbc_watermark_predicate("m", "2020-01-02 03:04:05",
                                    dialect="sqlserver", quote="") \
        == "m > '2020-01-02T03:04:05'"
    assert jdbc_watermark_predicate("d", "2020-01-02",
                                    dialect="sqlserver", quote="") \
        == "d > '20200102'"
    assert jdbc_watermark_predicate("seq", "42", dialect="derby") == '"seq" > 42'
    # r10 review: a date-only watermark is a DATE literal, never the
    # integer arithmetic 2020-01-01 = 2018
    assert jdbc_watermark_predicate("d", "2020-01-01", dialect="oracle") \
        == "\"d\" > DATE '2020-01-01'"
    assert jdbc_watermark_predicate("d", "2020-01-01", dialect="derby") \
        == "\"d\" > DATE('2020-01-01')"
    with pytest.raises(ValueError, match="dialect"):
        jdbc_watermark_predicate("m", "2020-01-02T03:04:05Z", dialect="db2")
    with pytest.raises(ValueError, match="dialect"):
        jdbc_watermark_predicate("seq", "42", dialect="db2")  # numeric too
    with pytest.raises(ValueError, match="unrecognized"):
        jdbc_watermark_predicate("m", "not-a-literal'; DROP TABLE x--")

    # keep derby.log inside the test tmpdir, not the repo cwd
    spark._jvm.System.setProperty("derby.system.home", str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    schema = "sample_id long, payload string, modified_on timestamp"
    spark.createDataFrame(
        [(1, "a", dt.datetime(2020, 1, 1, 10)),
         (2, "b", dt.datetime(2020, 2, 1, 11))], schema,
    ).write.format("jdbc").option("url", url).option("dbtable", "SRC") \
        .option("driver", drv).save()

    settings = TableSettings(ref_column="modified_on")
    lake = str(tmp_path / "lake")

    def batch():
        wm = read_watermark(lake, "lims", "SRC", settings.ref_column,
                            settings.ref_first_value, spark=spark)
        pred = jdbc_watermark_predicate(
            "modified_on", wm.ref_last_value, dialect="derby")
        df = read_jdbc(spark, url, "SRC", driver=drv, predicates=[pred])
        return df, ingest_table(df, "lims", "SRC", lake, settings)

    df1, r1 = batch()
    assert r1.moved_something and r1.n_rows == 2
    assert r1.watermark.ref_last_value == "2020-02-01T11:00:00.000000Z"
    # pushdown proof on the RAW scan (before prep's defensive re-filter):
    # no Filter node anywhere, one partition per predicate, rows already
    # bounded — the watermark only exists inside the remote query
    assert df1.rdd.getNumPartitions() == 1
    assert " Filter " not in df1._jdf.queryExecution().executedPlan().toString()

    # a late row lands in the source after batch 1
    spark.createDataFrame(
        [(3, "c", dt.datetime(2020, 3, 1, 12))], schema,
    ).write.format("jdbc").option("url", url).option("dbtable", "SRC") \
        .option("driver", drv).mode("append").save()

    df2, r2 = batch()
    assert df2.count() == 1  # ONLY the late row crossed the wire
    assert r2.moved_something and r2.n_rows == 1
    assert r2.watermark.ref_last_value == "2020-03-01T12:00:00.000000Z"

    df3, r3 = batch()
    assert df3.count() == 0  # remote WHERE excluded everything
    assert not r3.moved_something and r3.n_rows == 0
    assert spark.read.parquet(lake).count() == 3


def test_profile_columns_counts_nulls_and_distinct(spark):
    """profile_columns must count nulls/distinct per column correctly and
    surface min/max as strings — including the all-null column edge."""
    from pyspark_ingestion_spark.operators.profiling import profile_columns

    df = spark.createDataFrame(
        [(1, "a", None), (2, None, None), (3, "a", None), (None, "b", None)],
        "id long, v string, empty string",
    )
    got = {r["column_name"]: r for r in profile_columns(df, ["id", "v", "empty"]).collect()}
    assert got["id"]["n_rows"] == 4
    assert got["id"]["n_nonnull"] == 3
    assert got["id"]["n_distinct"] == 3
    assert got["id"]["min_value"] == "1" and got["id"]["max_value"] == "3"
    assert got["v"]["n_nonnull"] == 3 and got["v"]["n_distinct"] == 2
    assert got["empty"]["n_nonnull"] == 0 and got["empty"]["n_distinct"] == 0
    assert got["empty"]["min_value"] is None and got["empty"]["max_value"] is None


def test_gapfill_and_funnel_empty_input_safe(spark):
    """Gap-filling on an empty events set must yield zero rows (a null
    min/max produces a null sequence, not a crash); a funnel with views
    but no purchases must yield zero rows, not nulls."""
    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], "user_id long, ts timestamp")
    bounds = empty.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    cal = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    assert cal.count() == 0

    import datetime as dt
    v = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "user_id long, v_ts timestamp"
    )
    p = spark.createDataFrame([], "p_user long, p_ts timestamp")
    pairs = v.join(
        p,
        (v["user_id"] == p["p_user"])
        & (p["p_ts"] >= v["v_ts"])
        & (p["p_ts"] <= v["v_ts"] + F.expr("INTERVAL 1 HOUR")),
    )
    assert pairs.count() == 0


def test_avro_fallback_codec_full_type_surface(spark, tmp_path):
    """Pure-python avro container: nulls, bools, bytes, dates, timestamps,
    arrays-with-null-elements, floats round-trip exactly; files carry the
    spec magic so external avro tooling can read them."""
    import datetime as dt

    from pyspark.sql import Row

    from pyspark_ingestion_spark.sources.avro_py import read_avro, write_avro

    rows = [
        Row(i=1, ok=True, b=bytearray(b"\x00\xff"), d=dt.date(2026, 2, 28),
            ts=dt.datetime(2026, 1, 2, 3, 4, 5, 6), f=1.5, s="héllo ∆",
            arr=[1.0, None, -2.25]),
        Row(i=2, ok=False, b=None, d=None, ts=None, f=None, s=None, arr=None),
    ]
    schema = ("i int, ok boolean, b binary, d date, ts timestamp_ntz, "
              "f float, s string, arr array<double>")
    src = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "avro_types")
    write_avro(src, out, mode="overwrite")
    with open(next((tmp_path / "avro_types").glob("*.avro")), "rb") as fh:
        assert fh.read(4) == b"Obj\x01"
    back = read_avro(spark, out)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def _make_xlsx(path, sheets):
    """Handcraft a minimal OOXML workbook (zip of XML parts) — the test
    must not depend on openpyxl, whose absence is the point."""
    import zipfile

    M = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    R = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    strings: list[str] = []

    def cell(ref, v):
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if v not in strings:
            strings.append(v)
        return f'<c r="{ref}" t="s"><v>{strings.index(v)}</v></c>'

    def col_ref(i):
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(65 + rem) + out
        return out

    sheet_xmls = []
    for rows in sheets.values():
        body = "".join(
            "<row r=\"%d\">%s</row>"
            % (ri + 1, "".join(cell(f"{col_ref(ci)}{ri + 1}", v) for ci, v in enumerate(row)))
            for ri, row in enumerate(rows)
        )
        sheet_xmls.append(f'<worksheet {M}><sheetData>{body}</sheetData></worksheet>')

    names = list(sheets)
    wb_sheets = "".join(
        f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>' for i, n in enumerate(names)
    )
    rels = "".join(
        f'<Relationship Id="rId{i + 1}" Type="x" Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(names))
    )
    sst = "".join(f"<si><t>{s}</t></si>" for s in strings)
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", f'<workbook {M} {R}><sheets>{wb_sheets}</sheets></workbook>')
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + rels + "</Relationships>",
        )
        z.writestr("xl/sharedStrings.xml", f'<sst {M}>{sst}</sst>')
        for i, xml in enumerate(sheet_xmls):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)


def test_parse_data_dictionary_excel_matches_csv(tmp_path):
    """Same dictionary through the xlsx path (stdlib OOXML reader, multi-
    sheet) and the CSV path yields identical TableSettings."""
    import csv

    from pyspark_ingestion_spark.sources.settings import (
        parse_data_dictionary_csv,
        parse_data_dictionary_excel,
    )

    header = ["TABLE_SCHEMA", "TABLE_NAME", "COLUMN_NAME", "INCREMENTAL_REFERENCE"]
    data = [
        ["erp", "orders", "id", "MODIFIED_ON"],
        ["erp", "orders", "MODIFIED_ON", None],
        ["erp", "customers", "cust_id", "UPDATED_AT"],
        ["crm", "contacts", "contact_id", "LASTMOD"],
        ["crm", "nosync", "x", None],  # no ref → skipped
    ]
    xlsx = tmp_path / "dd.xlsx"
    # split across two sheets like real workbooks; reader must concat
    _make_xlsx(xlsx, {"erp": [header] + data[:3], "crm": [header] + data[3:]})
    csv_path = tmp_path / "dd.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows([["" if v is None else v for v in r] for r in data])

    got_xlsx = parse_data_dictionary_excel(str(xlsx))
    got_csv = parse_data_dictionary_csv(str(csv_path))
    assert got_xlsx == got_csv
    assert set(got_xlsx) == {"erp.orders", "erp.customers", "crm.contacts"}
    assert got_xlsx["erp.orders"].ref_column == "MODIFIED_ON"
    assert got_xlsx["erp.orders"].columns_to_import == ["id", "MODIFIED_ON"]


def test_lims_partitions_follow_date_column(spark, tmp_path):
    """When settings set a date_column different from ref_column, lake
    layout follows date_column (reference config.py:48-55) while the
    watermark still filters on ref_column."""
    table_path = str(tmp_path / "lims" / "datedcol")
    rows = [
        (1, dt.datetime(2020, 5, 1, 10), dt.datetime(2019, 12, 31, 23), "OK"),
        (2, dt.datetime(2020, 6, 2, 11), dt.datetime(2020, 1, 15, 8), "KO"),
    ]
    schema = ("sample_id long, MODIFIED_ON timestamp, SAMPLED_ON timestamp, "
              "status string")
    df = spark.createDataFrame(rows, schema)
    settings = TableSettings(
        ref_column="MODIFIED_ON",
        ref_first_value="2020-01-01T00:00:00.000000Z",
        date_column="SAMPLED_ON",
    )
    r = ingest_table(df, "lims", "datedcol", table_path, settings)
    assert r.n_rows == 2
    # layout on SAMPLED_ON (2019-12, 2020-1), not MODIFIED_ON (2020-5/6)
    assert os.path.isdir(os.path.join(table_path, "YEAR=2019", "MONTH=12"))
    assert os.path.isdir(os.path.join(table_path, "YEAR=2020", "MONTH=1"))
    assert not os.path.isdir(os.path.join(table_path, "YEAR=2020", "MONTH=5"))
    # watermark still advanced from ref_column
    assert r.watermark.ref_last_value == "2020-06-02T11:00:00.000000Z"


def test_catalog_identifiers_validated(spark):
    import pytest

    from pyspark_ingestion_spark.sources.catalog import drop_table, repair_table

    for bad in ("t; DROP TABLE x", "a-b", "x`y", "nation WHERE 1=1"):
        with pytest.raises(ValueError, match="invalid SQL identifier"):
            drop_table(spark, bad)
        with pytest.raises(ValueError, match="invalid SQL identifier"):
            repair_table(spark, bad)
    drop_table(spark, "never_created_ok")  # valid name still fine (IF EXISTS)


def test_cdc_upsert_latest_wins_and_partition_scoped(spark, tmp_path):
    """Upsert updates/inserts/deletes by key with latest-wins; only the
    batch's partitions are rewritten — untouched partition files keep
    their exact on-disk identity."""
    import glob

    from pyspark_ingestion_spark.ingestion.cdc import cdc_upsert
    from pyspark_ingestion_spark.sources.writers import write_partitioned

    path = str(tmp_path / "cdc")
    base = spark.createDataFrame(
        [(1, "a-v1", 100, "2019"), (2, "b-v1", 100, "2019"), (3, "c-v1", 100, "2020")],
        "id long, val string, ver long, YEAR string",
    )
    write_partitioned(base, path, partition_columns=["YEAR"], mode="overwrite",
                      compression="snappy")
    untouched_before = sorted(glob.glob(f"{path}/YEAR=2020/*.parquet"))

    updates = spark.createDataFrame(
        [(1, "a-v2", 200, "2019", False),   # update
         (4, "d-v1", 200, "2019", False),   # insert
         (2, None, 200, "2019", True)],     # delete tombstone
        "id long, val string, ver long, YEAR string, deleted boolean",
    )
    cdc_upsert(spark, updates, path, key_cols=["id"], order_cols=["ver"],
               partition_columns=["YEAR"], delete_col="deleted")

    out = {r["id"]: r["val"] for r in spark.read.parquet(path).collect()}
    assert out == {1: "a-v2", 3: "c-v1", 4: "d-v1"}
    # untouched partition identical files (not rewritten)
    assert sorted(glob.glob(f"{path}/YEAR=2020/*.parquet")) == untouched_before

    # re-running the same batch is idempotent (ties resolve to incoming)
    cdc_upsert(spark, updates, path, key_cols=["id"], order_cols=["ver"],
               partition_columns=["YEAR"], delete_col="deleted")
    out2 = {r["id"]: r["val"] for r in spark.read.parquet(path).collect()}
    assert out2 == out

    # first-batch bootstrap: path absent
    path2 = str(tmp_path / "cdc2")
    cdc_upsert(spark, updates.filter("NOT deleted"), path2, key_cols=["id"],
               order_cols=["ver"], partition_columns=["YEAR"], delete_col="deleted")
    assert {r["id"] for r in spark.read.parquet(path2).collect()} == {1, 4}


def test_real_header_decode_parses_common_containers(spark):
    """_decode_real genuinely parses PNG/GIF/BMP/JPEG/WAV headers (byte
    parsing, no codec libs) through the full Arrow mapInPandas path."""
    import struct

    from pyspark_ingestion_spark.operators.multimodal import decode_media

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00" + b"\x00" * 4)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00" + b"\x2c" + b"\x00" * 10
    bmp = b"BM" + struct.pack("<IHHI", 0, 0, 0, 54) + struct.pack("<Iii", 40, 800, -600)
    jpg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
           + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 640)
           + b"\x03" + b"\x00" * 10)
    wav = (b"RIFF" + struct.pack("<I", 436) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
           + b"data" + struct.pack("<I", 400) + b"\x00" * 400)

    rows = [(1, bytearray(png)), (2, bytearray(gif)), (3, bytearray(bmp)),
            (4, bytearray(jpg)), (5, bytearray(wav))]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["width"], r["height"], r["n_frames"])
           for r in decode_media(media, fake=False).collect()}
    assert got[1] == (640, 480, 1)      # png
    assert got[2][0:2] == (320, 200)    # gif dims
    assert got[3] == (800, 600, 1)      # bmp (negative height normalized)
    assert got[4] == (640, 480, 1)      # jpeg via SOF0
    assert got[5] == (2, 16, 100)       # wav: channels, bits, sample frames


def test_lake_schema_evolution_merge_schema(spark, tmp_path):
    """Columns added by later batches surface via mergeSchema: old rows
    read NULL for the new column, new rows keep it — the append-only
    schema-evolution contract a long-lived lake needs."""
    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.sources.readers import read_file
    from pyspark_ingestion_spark.sources.writers import write_partitioned

    path = str(tmp_path / "evolve")
    b1 = spark.createDataFrame([(1, "x", "2019")], "id long, a string, YEAR string")
    write_partitioned(b1, path, partition_columns=["YEAR"], mode="overwrite",
                      compression="snappy")
    b2 = spark.createDataFrame(
        [(2, "y", 9.5, "2020")], "id long, a string, new_metric double, YEAR string"
    )
    write_partitioned(b2, path, partition_columns=["YEAR"], mode="append",
                      compression="snappy")

    merged = read_file(spark, path, mergeSchema=True)
    assert "new_metric" in merged.columns
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["new_metric"] is None and rows[2]["new_metric"] == 9.5


def test_maintain_rollup_incremental_equals_full_recompute(spark, tmp_path):
    """Folding batches one at a time must equal aggregating all facts at
    once; only the batch's partitions are rewritten; non-decomposable
    aggregates fail loud."""
    import glob

    import pytest
    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.ingestion.rollup import maintain_rollup

    path = str(tmp_path / "rollup")
    aggs = lambda: {  # noqa: E731 - fresh Column objects per call
        "n": F.count(F.lit(1)),
        "revenue": F.sum("amt"),
        "max_amt": F.max("amt"),
        "min_amt": F.min("amt"),
    }
    b1 = spark.createDataFrame(
        [("2019", "red", 10.0), ("2019", "red", 5.0), ("2020", "blue", 7.0)],
        "day string, color string, amt double",
    )
    b2 = spark.createDataFrame(
        [("2019", "red", 2.0), ("2019", "green", 1.0)],  # touches only 2019
        "day string, color string, amt double",
    )
    maintain_rollup(spark, b1, path, ["day", "color"], aggs(), ["day"])
    untouched = sorted(glob.glob(f"{path}/day=2020/*.parquet"))
    maintain_rollup(spark, b2, path, ["day", "color"], aggs(), ["day"])
    assert sorted(glob.glob(f"{path}/day=2020/*.parquet")) == untouched

    got = {
        (r["day"], r["color"]): (r["n"], r["revenue"], r["max_amt"], r["min_amt"])
        for r in spark.read.parquet(path).collect()
    }
    full = {
        (r["day"], r["color"]): (r["n"], r["revenue"], r["max_amt"], r["min_amt"])
        for r in b1.unionByName(b2)
        .groupBy("day", "color")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("revenue"),
             F.max("amt").alias("max_amt"), F.min("amt").alias("min_amt"))
        .collect()
    }
    assert got == full

    with pytest.raises(ValueError, match="not decomposable"):
        maintain_rollup(spark, b2, path, ["day", "color"],
                        {"med": F.expr("percentile(amt, 0.5)")}, ["day"])
    with pytest.raises(ValueError, match="must be part of group_cols"):
        maintain_rollup(spark, b2, path, ["color"], aggs(), ["day"])


def test_python_datasource_partition_layout_invariance(spark):
    """The custom Python DataSource plans the requested number of input
    partitions, and the produced multiset is identical under any split
    layout (rows are pure functions of their index)."""
    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.sources.pydatasource import register_synthetic_source

    register_synthetic_source(spark)

    def read(parts):
        return (
            spark.read.format("graft_synth")
            .option("n", "997")  # prime: uneven final split
            .option("partitions", str(parts))
            .load()
        )

    df8 = read(8)
    assert df8.rdd.getNumPartitions() == 8
    agg8 = df8.agg(F.count(F.lit(1)), F.sum("val"), F.sum("id")).first()
    agg3 = read(3).agg(F.count(F.lit(1)), F.sum("val"), F.sum("id")).first()
    assert tuple(agg8) == tuple(agg3)
    assert agg8[0] == 997


def test_media_signal_features_known_pixels_and_samples(spark):
    """REAL pixel/sample decode on handcrafted files with hand-computed
    statistics: a 2x2 24-bit BMP of pure-color pixels (bottom-up rows,
    stride padding skipped) and an 8-bit PCM WAV with known samples —
    plus the honest gate: compressed containers still raise."""
    import math
    import struct

    import pytest

    from pyspark_ingestion_spark.operators.multimodal import media_signal_features

    # 2x2 BMP, 24bpp: stride = ceil(6/4)*4 = 8 (2 pad bytes per row).
    # bottom-up: file row 0 = image bottom. Pixels (B,G,R):
    #   bottom row: red (0,0,255), green (0,255,0)
    #   top row:    blue (255,0,0), white (255,255,255)
    row_bottom = bytes([0, 0, 255, 0, 255, 0, 0xAA, 0xAA])  # pad bytes ignored
    row_top = bytes([255, 0, 0, 255, 255, 255, 0xBB, 0xBB])
    pix = row_bottom + row_top
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pix), 0, 0, 0, 0)
    bmp = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54) + dib + pix
    lumas = [299 * 255, 587 * 255, 114 * 255, 299 * 255 + 587 * 255 + 114 * 255]
    want_mean = sum(lumas) / (1000 * 4)
    want_rms = math.sqrt(sum(v * v for v in lumas) / (1000000 * 4))

    samples = [0, 255, 128, 64]  # 8-bit unsigned -> centered -128..127
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
    dchunk = struct.pack("<4sI", b"data", 4) + bytes(samples)
    riff = b"WAVE" + fmt + dchunk
    wav = struct.pack("<4sI", b"RIFF", len(riff)) + riff
    centered = [s - 128 for s in samples]
    wav_mean = sum(centered) / 4
    wav_rms = math.sqrt(sum(v * v for v in centered) / 4)

    media = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(wav))], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r for r in media_signal_features(media).collect()}
    assert got[1]["container"] == "bmp" and got[1]["n_values"] == 4
    assert abs(got[1]["mean_val"] - want_mean) < 1e-9
    assert abs(got[1]["rms"] - want_rms) < 1e-9
    assert got[2]["container"] == "wav" and got[2]["n_values"] == 4
    assert abs(got[2]["mean_val"] - wav_mean) < 1e-9
    assert abs(got[2]["rms"] - wav_rms) < 1e-9

    # JPEG decodes for real now (r7) — a garbage body after the SOI is
    # CORRUPT and must raise the decoder's ValueError, never fabricate
    jpg = b"\xff\xd8\xff" + b"\x00" * 20
    gated = spark.createDataFrame([(3, bytearray(jpg))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="jpeg"):
        media_signal_features(gated).collect()


def test_synthesized_payloads_roundtrip_real_parsers(spark):
    """synthesize_bmp/wav produce files the REAL header parser accepts
    with the declared geometry, and 16-bit WAV decodes signed samples."""
    import struct

    from pyspark_ingestion_spark.operators.multimodal import (
        _wav_sample_values,
        decode_media,
        synthesize_bmp_payload,
        synthesize_wav_payload,
    )

    df = spark.createDataFrame(
        [(1, "abcdefghijklm"), (2, "xy")], "doc_id long, text string"
    )
    bmp_hdr = {r["doc_id"]: r for r in decode_media(
        synthesize_bmp_payload(df, "doc_id", "text"), fake=False).collect()}
    assert (bmp_hdr[1]["width"], bmp_hdr[1]["height"]) == (4, 2)  # 13 B -> 2 rows
    assert (bmp_hdr[2]["width"], bmp_hdr[2]["height"]) == (4, 1)
    wav_hdr = {r["doc_id"]: r for r in decode_media(
        synthesize_wav_payload(df, "doc_id", "text"), fake=False).collect()}
    assert wav_hdr[1]["n_frames"] == 13 and wav_hdr[2]["n_frames"] == 2

    # 16-bit path: two signed samples
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16)
    data = struct.pack("<2h", -1000, 1000)
    dchunk = struct.pack("<4sI", b"data", len(data)) + data
    riff = b"WAVE" + fmt + dchunk
    wav16 = struct.pack("<4sI", b"RIFF", len(riff)) + riff
    assert _wav_sample_values(wav16) == [-1000, 1000]


def test_avro_fallback_dynamic_overwrite_preserves_partitions(spark, tmp_path):
    """overwrite_partitions on the pure-python avro fallback must honor
    DYNAMIC semantics: replacing partition p=2 leaves p=1 untouched
    (the old fallback rmtree'd the whole table — every untouched
    partition was silently destroyed)."""
    from pyspark_ingestion_spark.sources.readers import read_file
    from pyspark_ingestion_spark.sources.writers import overwrite_partitions

    path = str(tmp_path / "lake")
    df1 = spark.createDataFrame([(1, "a", 1), (2, "b", 2)], "id int, v string, p int")
    overwrite_partitions(df1, path, ["p"], file_format="avro", compression=None)
    df2 = spark.createDataFrame([(3, "c", 2)], "id int, v string, p int")
    overwrite_partitions(df2, path, ["p"], file_format="avro", compression=None)
    got = {
        (r["id"], r["v"], r["p"])
        for r in read_file(spark, path, file_format="avro").collect()
    }
    assert got == {(1, "a", 1), (3, "c", 2)}, got  # p=1 survived, p=2 replaced


def test_avro_write_mode_validation_and_ignore(spark, tmp_path):
    """A typo'd mode fails BEFORE any data lands (not on the second run);
    mode='ignore' no-ops on an existing path like the JVM writer."""
    import pytest

    from pyspark_ingestion_spark.sources.avro_py import write_avro

    df = spark.createDataFrame([(1, "a")], "id int, v string")
    missing = str(tmp_path / "nowhere")
    with pytest.raises(ValueError, match="unsupported mode"):
        write_avro(df, missing, mode="bogus")
    assert not os.path.exists(missing)  # nothing landed

    path = str(tmp_path / "t")
    write_avro(df, path, mode="errorifexists")
    df2 = spark.createDataFrame([(2, "b")], "id int, v string")
    write_avro(df2, path, mode="ignore")  # must no-op, not raise/append
    from pyspark_ingestion_spark.sources.avro_py import read_avro

    assert [tuple(r) for r in read_avro(spark, path).collect()] == [(1, "a")]


def test_read_file_avro_fallback_honors_schema(spark, tmp_path):
    """The fallback applies the caller's schema (projection + cast) like
    the JVM reader, instead of silently returning the inferred shape."""
    from pyspark.sql import types as T

    from pyspark_ingestion_spark.sources.readers import read_file
    from pyspark_ingestion_spark.sources.writers import write_partitioned

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a", 9)], "id int, v string, extra int")
    write_partitioned(df, path, file_format="avro", compression=None,
                      mode="errorifexists")
    want = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
    ])
    got = read_file(spark, path, file_format="avro", schema=want)
    assert got.columns == ["id", "v"]
    assert dict(got.dtypes)["id"] == "bigint"
    assert [tuple(r) for r in got.collect()] == [(1, "a")]


def test_rollup_rejects_non_decomposable_aggregates(spark, tmp_path):
    """countDistinct renders identically to count in str(Column) — the
    merge gate must still reject it (sum over per-batch distinct counts
    double-counts), and min_by/max_by must not pass as min/max."""
    import pytest

    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.ingestion.rollup import maintain_rollup

    batch = spark.createDataFrame([(1, 2, "x", 5)], "p int, uid int, g string, v int")
    for bad in (F.count_distinct("uid"), F.min_by("v", "uid"), F.max_by("v", "uid")):
        with pytest.raises(ValueError, match="DISTINCT|not decomposable"):
            maintain_rollup(
                spark, batch, str(tmp_path / "r"),
                group_cols=["p"], partition_columns=["p"],
                agg_exprs={"m": bad},
            )


def test_data_dictionary_nan_cells_are_blank(spark):
    """pandas delivers blank Excel cells as float NaN (truthy): a NaN
    ref must not lock the group (later real refs win) and NaN column
    names must not be imported; all-NaN-ref tables are skipped."""
    from pyspark_ingestion_spark.sources.settings import parse_data_dictionary

    nan = float("nan")
    rows = [
        {"TABLE_SCHEMA": "s", "TABLE_NAME": "t1", "COLUMN_NAME": "c1",
         "INCREMENTAL_REFERENCE": nan},
        {"TABLE_SCHEMA": "s", "TABLE_NAME": "t1", "COLUMN_NAME": "c2",
         "INCREMENTAL_REFERENCE": "updated_at"},
        {"TABLE_SCHEMA": "s", "TABLE_NAME": "t1", "COLUMN_NAME": nan,
         "INCREMENTAL_REFERENCE": nan},
        {"TABLE_SCHEMA": "s", "TABLE_NAME": "t2", "COLUMN_NAME": "c1",
         "INCREMENTAL_REFERENCE": nan},
    ]
    got = parse_data_dictionary(rows)
    assert set(got) == {"s.t1"}  # t2 has no real ref -> skipped
    assert got["s.t1"].ref_column == "updated_at"
    assert got["s.t1"].columns_to_import == ["c1", "c2"]


def test_cdc_emptied_partition_delete_escapes_path(spark, tmp_path):
    """Tombstoning every key of a partition whose value Spark
    percent-escapes on disk ('a:b' -> 'a%3Ab') must still delete the
    emptied directory — raw str(v) paths would silently miss it."""
    from pyspark_ingestion_spark.ingestion.cdc import cdc_upsert

    path = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(1, 1, False, "a:b"), (2, 1, False, "plain")],
        "id int, ver int, deleted boolean, p string",
    )
    cdc_upsert(spark, base, path, key_cols=["id"], order_cols=["ver"],
               partition_columns=["p"])
    assert os.path.isdir(os.path.join(path, "p=a%3Ab"))
    tomb = spark.createDataFrame(
        [(1, 2, True, "a:b")], "id int, ver int, deleted boolean, p string"
    )
    cdc_upsert(spark, tomb, path, key_cols=["id"], order_cols=["ver"],
               partition_columns=["p"], delete_col="deleted")
    assert not os.path.exists(os.path.join(path, "p=a%3Ab"))
    got = {r["id"] for r in spark.read.parquet(path).collect()}
    assert got == {2}


def test_watermark_filter_is_driver_tz_independent(spark):
    """The batch boundary must not move with the driver OS timezone.

    The sync-file string is UTC by contract; before the fix,
    ``Watermark.as_datetime`` returned a NAIVE datetime and ``F.lit``
    converted it through ``time.mktime`` in the driver OS TZ — on a
    non-UTC driver every boundary shifted by the UTC offset (skipping or
    re-ingesting offset-hours of rows). The tz-aware boundary converts
    through ``calendar.timegm`` instead (ADVICE r5, high).
    """
    import time

    from pyspark_ingestion_spark.ingestion.prep import _watermark_filter
    from pyspark_ingestion_spark.ingestion.watermark import Watermark

    # timestamp LITERALS parse in the pinned-UTC session TZ (JVM-side),
    # so the input df itself carries no driver-TZ dependence
    df = spark.sql(
        "select * from values"
        " (1, timestamp'2020-05-01 11:00:00'),"
        " (2, timestamp'2020-05-01 13:00:00')"
        " as t(id, ts)"
    )
    wm = Watermark("s", "t", "ts", "2020-05-01T12:00:00.000000Z")
    assert wm.as_datetime().tzinfo is dt.timezone.utc

    old_tz = os.environ.get("TZ")
    try:
        seen = {}
        # EDT is UTC-4 in May, JST is UTC+9 — both directions covered
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            os.environ["TZ"] = tz
            time.tzset()
            seen[tz] = {r["id"] for r in _watermark_filter(df, "ts", wm).collect()}
        assert seen == {tz: {2} for tz in seen}
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()


def test_avro_fallback_dynamic_overwrite_escaped_partition_dirs(spark, tmp_path):
    """Partition values with Hive-escaped characters (':' → '%3A') must
    lay out and overwrite the SAME directory the JVM writer would use.
    The old fallback built dirs with raw str(v): a dynamic overwrite over
    a JVM-written lake missed the escaped dir and left old and new rows
    side by side (ADVICE r5)."""
    from pyspark_ingestion_spark.sources.avro_py import read_avro, write_avro

    path = str(tmp_path / "lake")
    df1 = spark.createDataFrame([(1, "a:b"), (2, "keep")], "id int, p string")
    write_avro(df1, path, ["p"], mode="overwrite_partitions", codec="null")
    assert os.path.isdir(os.path.join(path, "p=a%3Ab"))  # JVM-style layout
    assert not os.path.exists(os.path.join(path, "p=a:b"))

    df2 = spark.createDataFrame([(3, "a:b")], "id int, p string")
    write_avro(df2, path, ["p"], mode="overwrite_partitions", codec="null")
    got = {(r["id"], r["p"]) for r in read_avro(spark, path).collect()}
    assert got == {(3, "a:b"), (2, "keep")}, got  # p=a:b replaced, other kept


def test_avro_fallback_dynamic_overwrite_null_partition(spark, tmp_path):
    """NULL partition values land in __HIVE_DEFAULT_PARTITION__ (like the
    JVM writer) and dynamic overwrite replaces that directory."""
    from pyspark_ingestion_spark.sources.avro_py import read_avro, write_avro

    path = str(tmp_path / "lake")
    df1 = spark.createDataFrame([(1, None), (2, "x")], "id int, p string")
    write_avro(df1, path, ["p"], mode="overwrite_partitions", codec="null")
    assert os.path.isdir(os.path.join(path, "p=__HIVE_DEFAULT_PARTITION__"))
    df2 = spark.createDataFrame([(3, None)], "id int, p string")
    write_avro(df2, path, ["p"], mode="overwrite_partitions", codec="null")
    got = {(r["id"], r["p"]) for r in read_avro(spark, path).collect()}
    assert got == {(3, None), (2, "x")}, got


def test_png_pixel_decode_all_filters_and_gates(spark):
    """REAL PNG pixel decode: (1) a handcrafted grayscale PNG whose rows
    use every filter type (None/Sub/Up/Average/Paeth) decodes to the
    exact raw bytes; (2) a truecolor PNG yields BT.601 luma millis;
    (3) unsupported shapes (16-bit, interlaced) raise the narrow gate,
    and the synthesizer's files round-trip through media_signal_features
    with hand-computed statistics."""
    import math
    import struct
    import zlib

    import pytest

    from pyspark_ingestion_spark.operators.multimodal import (
        _png_luma_millis,
        _png_paeth,
        media_signal_features,
        synthesize_png_payload,
    )

    def chunk(ct, d):
        return struct.pack(">I", len(d)) + ct + d + struct.pack(">I", zlib.crc32(ct + d))

    def png(w, h, depth, color, interlace, raw):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    # 3-wide, 5-high grayscale; rows use filters 0..4. Build the filtered
    # stream by hand from known raw rows.
    rows = [bytes(r) for r in
            ([10, 20, 30], [5, 250, 7], [10, 20, 30], [128, 129, 130], [1, 2, 3])]
    raw = bytearray()
    prior = bytes(3)
    for ft, line in enumerate(rows):
        raw.append(ft)
        for x in range(3):
            a = line[x - 1] if x else 0
            b, c = prior[x], (prior[x - 1] if x else 0)
            pred = (0 if ft == 0 else a if ft == 1 else b if ft == 2
                    else (a + b) >> 1 if ft == 3 else _png_paeth(a, b, c))
            raw.append((line[x] - pred) & 0xFF)
        prior = line
    got = _png_luma_millis(png(3, 5, 8, 0, 0, bytes(raw)))
    assert got == [1000 * v for r in rows for v in r]

    # truecolor: one row, two pixels (filter 0)
    rgb = bytes([0, 255, 0, 0, 0, 255, 0])  # red, green
    got_rgb = _png_luma_millis(png(2, 1, 8, 2, 0, rgb))
    assert got_rgb == [299 * 255, 587 * 255]

    with pytest.raises(NotImplementedError, match="grayscale/truecolor"):
        _png_luma_millis(png(1, 1, 16, 0, 0, bytes([0, 0, 0])))
    with pytest.raises(NotImplementedError, match="interlace"):
        _png_luma_millis(png(1, 1, 8, 0, 1, bytes([0, 0])))
    with pytest.raises(ValueError, match="dimensions"):
        _png_luma_millis(png(3, 2, 8, 0, 0, bytes([0, 0])))

    # synthesizer round-trip through the Spark operator, stats hand-checked
    text = "abcdefghijklmnopqrstuvw"  # 23 bytes -> 6 rows of 4, 1 pad byte
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = media_signal_features(
        synthesize_png_payload(df, "doc_id", "text")
    ).collect()[0]
    vals = list(text.encode()) + [0]
    assert out["container"] == "png" and out["n_values"] == 24
    assert abs(out["mean_val"] - sum(vals) / 24) < 1e-9
    assert abs(out["rms"] - math.sqrt(sum(v * v for v in vals) / 24)) < 1e-9


def test_gif_pixel_decode_lzw_and_gates(spark):
    """REAL GIF pixel decode: handcrafted single-frame GIF with a known
    LZW stream decodes to exact palette-luma values; extension blocks
    are skipped; interlace/multi-frame accumulate; synthesizer files
    round-trip through media_signal_features with hand-computed stats;
    a corrupt LZW stream raises."""
    import math
    import struct

    import pytest

    from pyspark_ingestion_spark.operators.multimodal import (
        _gif_luma_millis,
        _gif_lzw_encode,
        media_signal_features,
        synthesize_gif_payload,
    )

    # 2x2 GIF, 4-entry color table (red, green, blue, white), pixels 0..3,
    # preceded by a graphic-control extension the walker must skip
    gct = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255])
    lzw = _gif_lzw_encode(bytes([0, 1, 2, 3]), 2)
    gif = (b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0xF1, 0, 0) + gct
           + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE extension
           + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
           + bytes([2, len(lzw)]) + lzw + b"\x00\x3b")
    assert _gif_luma_millis(gif) == [
        299 * 255, 587 * 255, 114 * 255, (299 + 587 + 114) * 255
    ]

    # corrupt stream: a code far beyond the table
    bad = gif.replace(bytes([2, len(lzw)]) + lzw,
                      bytes([2, 2]) + b"\xff\xff", 1)
    with pytest.raises(ValueError):
        _gif_luma_millis(bad)

    # synthesizer round-trip (forces real dictionary growth on long text)
    text = "the quick brown fox jumps over the lazy dog " * 30
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = media_signal_features(
        synthesize_gif_payload(df, "doc_id", "text")
    ).collect()[0]
    data = text.encode()
    h = max(1, -(-len(data) // 4))
    vals = list(data.ljust(h * 4, b"\x00"))
    assert out["container"] == "gif" and out["n_values"] == h * 4
    assert abs(out["mean_val"] - sum(vals) / (h * 4)) < 1e-9
    assert abs(out["rms"] - math.sqrt(sum(v * v for v in vals) / (h * 4))) < 1e-9


def test_media_decoders_truncated_payloads_raise_valueerror(spark):
    """A truncated or corrupt container must surface the decoders'
    ValueError contract, never a raw IndexError/struct.error from an
    unchecked byte read (ADVICE r6): truncation at every structural
    boundary of the GIF walk (header, color table, descriptor,
    sub-block) and a PNG whose chunk length runs past the payload."""
    import struct

    from pyspark_ingestion_spark.operators.multimodal import (
        _gif_luma_millis,
        _gif_lzw_encode,
        _png_luma_millis,
    )

    gct = bytes(v for i in range(4) for v in (i, i, i))
    lzw = _gif_lzw_encode(bytes([0, 1, 2, 3]), 2)
    gif = (b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0xF1, 0, 0) + gct
           + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
           + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
           + bytes([2, len(lzw)]) + lzw + b"\x00\x3b")
    assert len(_gif_luma_millis(gif)) == 4  # the intact file decodes
    # cut the GIF at every byte boundary: each prefix must either decode
    # (nothing after the trailer) or raise ValueError — never IndexError
    for cut in range(4, len(gif)):
        try:
            _gif_luma_millis(gif[:cut])
        except ValueError:
            pass

    png_hdr = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    # chunk header claims 13 bytes of IHDR but the payload ends early
    truncated = (png_hdr + struct.pack(">I", 13) + b"IHDR" + ihdr[:5])
    with pytest.raises(ValueError, match="truncated"):
        _png_luma_millis(truncated)
    # IHDR chunk shorter than the 13 spec bytes
    short = (png_hdr + struct.pack(">I", 5) + b"IHDR" + ihdr[:5]
             + struct.pack(">I", 0))
    with pytest.raises(ValueError, match="truncated"):
        _png_luma_millis(short)


def test_avro_dynamic_overwrite_crash_window_rolls_forward(spark, tmp_path):
    """The dynamic-overwrite commit protocol (ADVICE r6): (1) a crash
    BEFORE the manifest leaves old rows fully readable (staged files are
    invisible to readers) and the next write sweeps the orphans; (2) a
    crash AFTER the manifest but before the cleanup is rolled FORWARD by
    the next write — no duplicate rows survive."""
    import json
    import os

    from pyspark_ingestion_spark.sources.avro_py import (
        _OVERWRITE_MANIFEST,
        read_avro,
        write_avro,
    )

    path = str(tmp_path / "lake")
    df1 = spark.createDataFrame([(1, "a", 1), (2, "b", 2)], "id int, v string, p int")
    write_avro(df1, path, partition_columns=["p"], mode="overwrite_partitions")

    def rows():
        return {(r["id"], r["v"], r["p"]) for r in read_avro(spark, path).collect()}

    # (1) pre-manifest crash: an orphan staged file is invisible and swept
    orphan = os.path.join(path, "p=2", "part-99999-deadbeef.avro.staged")
    with open(orphan, "wb") as f:
        f.write(b"not avro")
    assert rows() == {(1, "a", 1), (2, "b", 2)}
    df2 = spark.createDataFrame([(3, "c", 2)], "id int, v string, p int")
    write_avro(df2, path, partition_columns=["p"], mode="overwrite_partitions")
    assert not os.path.exists(orphan)
    assert rows() == {(1, "a", 1), (3, "c", 2)}

    # (2) post-manifest crash: rebuild the exact on-disk state — staged
    # files present, manifest committed, stale .avro not yet deleted —
    # then let the next run roll it forward
    df3 = spark.createDataFrame([(4, "d", 2)], "id int, v string, p int")
    write_avro(df3, path, partition_columns=["p"], mode="overwrite_partitions")
    assert rows() == {(1, "a", 1), (4, "d", 2)}
    new_file = [f for f in os.listdir(os.path.join(path, "p=2"))
                if f.endswith(".avro")][0]
    staged_rel = os.path.join("p=2", new_file + ".staged")
    os.rename(os.path.join(path, "p=2", new_file),
              os.path.join(path, staged_rel))
    with open(os.path.join(path, "p=2", "stale-leftover.avro"), "wb") as f:
        f.write(b"not avro")  # the pre-existing file the crash left behind
    with open(os.path.join(path, _OVERWRITE_MANIFEST), "w") as f:
        json.dump({"staged": [staged_rel]}, f)
    df4 = spark.createDataFrame([(9, "z", 3)], "id int, v string, p int")
    write_avro(df4, path, partition_columns=["p"], mode="overwrite_partitions")
    assert not os.path.exists(os.path.join(path, "p=2", "stale-leftover.avro"))
    assert not os.path.exists(os.path.join(path, _OVERWRITE_MANIFEST))
    assert rows() == {(1, "a", 1), (4, "d", 2), (9, "z", 3)}


def test_snapshot_diff_keys_only_added_removed(spark):
    """compare_cols=[] is the keys-only diff: rows present on both sides
    are by definition unchanged, so only added/removed rows emit — and
    the plan must BUILD (ADVICE r6: F.when(None, ...) raised TypeError
    at plan-build time, making a keys-only diff impossible)."""
    from pyspark_ingestion_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame([(1,), (2,)], "k int")
    new = spark.createDataFrame([(2,), (3,)], "k int")
    got = {(r["k"], r["change_type"], tuple(r["changed_cols"]))
           for r in snapshot_diff(old, new, ["k"], []).collect()}
    assert got == {(3, "added", ()), (1, "removed", ())}


def test_jpeg_fast_path_bit_exact(spark):
    """The r10 vectorized decode (prescan unstuff + 16-bit Huffman LUT +
    batched numpy IDCT) is BIT-IDENTICAL to the pure bit-by-bit loop on
    every baseline shape: constant grids (DC-only path), random noise
    (full IDCT, every AC size), mixed constant/noise, restart markers,
    non-trivial quant tables, and 4:2:0/4:2:2 chroma interleaving.
    Float accumulation order is preserved term-for-term in the batch
    IDCT, so equality is exact, not approximate. Also pins the array
    surface (_jpeg_luma_array == the list, as int64) and that corrupt
    streams still raise ValueError under the fast path."""
    import random

    import pyspark_ingestion_spark.operators.multimodal as M

    rnd = random.Random(1234)

    def grid(data, bpr=32):
        nblk = max(1, len(data))
        rows = -(-nblk // bpr)
        padded = data.ljust(rows * bpr, b"\x00")
        w, h = bpr * 8, rows * 8
        arr = bytearray(w * h)
        for bi, val in enumerate(padded):
            by, bx = divmod(bi, bpr)
            for yy in range(8):
                base = (by * 8 + yy) * w + bx * 8
                arr[base : base + 8] = bytes([val]) * 8
        return bytes(arr), w, h

    cases = []
    g, w, h = grid(bytes(range(256)))
    for dri in (0, 3, 7):
        cases.append(M._jpeg_encode_gray(g, w, h, M._JPEG_FIXTURE_QUANT,
                                         restart_interval=dri))
    for (w2, h2) in ((8, 8), (16, 16), (24, 8), (64, 48)):
        for quant in ([1] * 64, M._JPEG_FIXTURE_QUANT, [3] + [7] * 63):
            pix = bytes(rnd.randrange(256) for _ in range(w2 * h2))
            cases.append(M._jpeg_encode_gray(pix, w2, h2, quant))
            cases.append(M._jpeg_encode_gray(pix, w2, h2, quant,
                                             restart_interval=2))
    # mixed: half constant (DC-only), half noise (full IDCT) in one image
    pix = bytes([77] * 128 + [rnd.randrange(256) for _ in range(128)])
    cases.append(M._jpeg_encode_gray(pix, 16, 16, M._JPEG_FIXTURE_QUANT))
    for sampling in ((2, 2), (2, 1), (1, 1)):
        pix = bytes(rnd.randrange(256) for _ in range(32 * 32))
        cases.append(M._jpeg_encode_ycbcr_neutral(
            pix, 32, 32, M._JPEG_FIXTURE_QUANT, sampling))
    assert M._JPEG_FAST and M.np is not None
    try:
        for i, jp in enumerate(cases):
            fast = M._jpeg_luma_millis(jp)
            arr = M._jpeg_luma_array(jp)
            M._JPEG_FAST = False
            pure = M._jpeg_luma_millis(jp)
            M._JPEG_FAST = True
            assert fast == pure, f"case {i}: fast != pure"
            assert arr.dtype == M.np.int64 and arr.tolist() == pure, i
        # corrupt inputs keep the ValueError contract on the fast path
        whole = cases[0]
        for bad in (whole[: len(whole) // 2],          # truncated entropy
                    whole[:-20] + b"\xff\xd5" + whole[-20:]):  # stray RST
            with pytest.raises(ValueError):
                M._jpeg_luma_millis(bad)
    finally:
        M._JPEG_FAST = True


def test_jpeg_const_block_fast_path_bit_exact():
    """The r14 constant-block ENCODER fast path (_jpeg_encode_gray_
    const_blocks: 511-entry DC-diff piece table + big-int bit assembly
    + bytes.replace stuffing + cached header) emits BYTE-IDENTICAL
    JPEGs to the generic _jpeg_encode_gray over the pixel grid, for
    every shape the byte-grid fixtures produce: every single byte
    value, random rows (incl. 0xFF-stuffing-prone ones), extremes, and
    multi-row grids. Also pins the geometry-mismatch guard."""
    import random

    import pyspark_ingestion_spark.operators.multimodal as M

    rnd = random.Random(99)

    def grid(vals, bpr=32):
        rows = len(vals) // bpr
        w = bpr * 8
        arr = bytearray(w * rows * 8)
        for bi, val in enumerate(vals):
            by, bx = divmod(bi, bpr)
            for yy in range(8):
                base = (by * 8 + yy) * w + bx * 8
                arr[base : base + 8] = bytes([val]) * 8
        return bytes(arr)

    cases = [bytes([v]) + bytes(rnd.randrange(256) for _ in range(31))
             for v in range(256)]
    cases += [bytes(rnd.randrange(256) for _ in range(32)) for _ in range(64)]
    cases += [bytes([255] * 32), bytes([0] * 32), bytes([0, 255] * 16),
              bytes([128] * 32)]
    cases += [bytes(rnd.randrange(256) for _ in range(32 * rows))
              for rows in (2, 3, 5)]
    for vals in cases:
        h = (len(vals) // 32) * 8
        ref = M._jpeg_encode_gray(grid(vals), 256, h, M._JPEG_FIXTURE_QUANT)
        assert M._jpeg_encode_gray_const_blocks(vals, 256, h) == ref
    with pytest.raises(ValueError):
        M._jpeg_encode_gray_const_blocks(bytes(31), 256, 8)


def test_jpeg_codec_real_decode(spark):
    """Baseline JPEG is REAL pure-Python computation end to end:
    (1) constant-block fixtures round-trip bit-exactly through forward
    DCT + quantization + canonical Huffman + byte stuffing (+ restart
    markers) — the oracle's premise; (2) a random non-constant image at
    quant=1 round-trips within the ±1 IDCT rounding bound, proving the
    AC run-length path and full IDCT really run; (3) truncation raises
    ValueError, progressive raises NotImplementedError; (4) the
    synthesizer's files flow through media_signal_features with
    hand-computed statistics."""
    import math
    import random
    import struct
    from collections import Counter

    from pyspark_ingestion_spark.operators.multimodal import (
        _JPEG_FIXTURE_QUANT,
        _jpeg_encode_gray,
        _jpeg_luma_millis,
        media_signal_features,
        synthesize_jpeg_payload,
    )

    def grid(data):
        bpr = 32
        nblk = max(1, len(data))
        rows = -(-nblk // bpr)
        padded = data.ljust(rows * bpr, b"\x00")
        w, h = bpr * 8, rows * 8
        pix = bytearray(w * h)
        for bi, val in enumerate(padded):
            by, bx = divmod(bi, bpr)
            for yy in range(8):
                base = (by * 8 + yy) * w + bx * 8
                pix[base : base + 8] = bytes([val]) * 8
        return bytes(pix), w, h

    # (1) constant blocks: exact, with and without restart markers
    pix, w, h = grid(bytes(range(256)))
    for dri in (0, 5):
        jp = _jpeg_encode_gray(pix, w, h, _JPEG_FIXTURE_QUANT, restart_interval=dri)
        assert Counter(_jpeg_luma_millis(jp)) == Counter(1000 * p for p in pix), dri

    # (2) non-constant: AC coefficients + full IDCT, lossy within ±1 at q=1
    rnd = random.Random(7)
    pix2 = bytes(rnd.randrange(256) for _ in range(16 * 16))
    jp2 = _jpeg_encode_gray(pix2, 16, 16, [1] * 64)
    got = sorted(v // 1000 for v in _jpeg_luma_millis(jp2))
    want = sorted(pix2)
    assert len(got) == 256
    assert max(abs(a - b) for a, b in zip(got, want)) <= 2  # sorted-value bound

    # (3) truncation → ValueError. A sequential file re-marked SOF2 is
    # CORRUPT progressive (its entropy data follows sequential rules) —
    # the progressive decoder must reject it, not fabricate pixels
    # (real SOF2 decode has its own test)
    with pytest.raises(ValueError):
        _jpeg_luma_millis(jp[: len(jp) // 2])
    prog = jp.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        _jpeg_luma_millis(prog)

    # (4) synthesizer → media_signal_features with hand-computed stats
    text = "the quick brown fox jumps over the lazy dog " * 3
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = media_signal_features(
        synthesize_jpeg_payload(df, "doc_id", "text")
    ).collect()[0]
    data = text.encode()
    nblk = 32 * -(-max(1, len(data)) // 32)
    vals = list(data.ljust(nblk, b"\x00"))
    assert out["container"] == "jpeg" and out["n_values"] == nblk * 64
    assert abs(out["mean_val"] - sum(vals) / nblk) < 1e-9
    assert abs(out["rms"] - math.sqrt(sum(v * v for v in vals) / nblk)) < 1e-9


def test_jpeg_header_truncation_contract(spark):
    """Truncated/corrupt JPEG HEADER segments (not just the entropy
    stream) surface the decoders' ValueError contract — never a raw
    struct.error/IndexError/KeyError (r7 review)."""
    import struct

    from pyspark_ingestion_spark.operators.multimodal import _jpeg_luma_millis

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    soi = b"\xff\xd8"
    dqt = seg(0xDB, b"\x00" + bytes(64))
    dht = seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + bytes([0])
              + b"\x10" + bytes([1] + [0] * 15) + bytes([0]))
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00")
    sos = seg(0xDA, b"\x01\x01\x00" + b"\x00\x3f\x00")

    cases = {
        "short DQT": soi + seg(0xDB, b"\x00" + bytes(10)) + sof + dht + sos,
        "short DHT": soi + dqt + sof + seg(0xC4, b"\x00" + bytes(5)) + sos,
        "short SOF": soi + dqt + dht + seg(0xC0, b"\x08\x00") + sos,
        "empty SOS": soi + dqt + dht + sof + seg(0xDA, b""),
        "short DRI": soi + dqt + dht + sof + seg(0xDD, b"\x01") + sos,
        "SOS component missing from SOF":
            soi + dqt + dht + sof
            + seg(0xDA, b"\x01\x07\x00" + b"\x00\x3f\x00"),
        "scan references missing DHT":
            soi + dqt + sof + seg(0xDA, b"\x01\x01\x33" + b"\x00\x3f\x00"),
        # r10 review: 3 codes declared at length 1 overflow the prefix
        # space (canonical code 2 needs 2 bits) — an over-subscribed
        # table must raise at parse, not IndexError in the peek LUT
        "over-subscribed DHT":
            soi + dqt
            + seg(0xC4, b"\x00" + bytes([3] + [0] * 15) + bytes([0, 1, 2])
                  + b"\x10" + bytes([1] + [0] * 15) + bytes([0]))
            + sof + sos,
    }
    for name, payload in cases.items():
        with pytest.raises(ValueError):
            _jpeg_luma_millis(payload)
        print("ok:", name)


def test_auc_empty_join_raises_value_error(spark):
    """auc_of_scores on a zero-row scored∩labels join raises the
    designed 'AUC undefined' ValueError, not a bare TypeError from
    None arithmetic (r7 review)."""
    from pyspark_ingestion_spark.operators.quality_model import auc_of_scores

    scored = spark.createDataFrame([(1, 0.5)], "doc_id long, model_score double")
    labels = spark.createDataFrame([(2, 1)], "doc_id long, label int")
    with pytest.raises(ValueError, match="AUC undefined.*empty"):
        auc_of_scores(scored, labels, "doc_id", "label")


def test_jpeg_chroma_subsampled_decode(spark):
    """4:2:0 and 4:2:2 baseline JPEG — the dominant camera/web form —
    decode for real: interleaved MCUs (h×v luma blocks + chroma blocks
    per MCU, per-component DC predictors) through the same pure-Python
    pipeline, constant-block fixtures exact, and equal to the grayscale
    encoding of the same luma plane."""
    import random
    from collections import Counter

    from pyspark_ingestion_spark.operators.multimodal import (
        _JPEG_FIXTURE_QUANT,
        _jpeg_encode_gray,
        _jpeg_encode_ycbcr_neutral,
        _jpeg_luma_millis,
    )

    rnd = random.Random(3)
    w = h = 32
    vals = [rnd.randrange(256) for _ in range((w // 8) * (h // 8))]
    pix = bytearray(w * h)
    for bi, v in enumerate(vals):
        by, bx = divmod(bi, w // 8)
        for yy in range(8):
            base = (by * 8 + yy) * w + bx * 8
            pix[base : base + 8] = bytes([v]) * 8
    want = Counter(1000 * p for p in pix)
    for sampling in ((2, 2), (2, 1)):
        jp = _jpeg_encode_ycbcr_neutral(
            bytes(pix), w, h, _JPEG_FIXTURE_QUANT, sampling=sampling
        )
        assert Counter(_jpeg_luma_millis(jp)) == want, sampling
    gray = _jpeg_encode_gray(bytes(pix), w, h, _JPEG_FIXTURE_QUANT)
    assert Counter(_jpeg_luma_millis(gray)) == want


def test_jpeg_progressive_decode_matches_sequential(spark):
    """Progressive (SOF2) JPEG decodes EXACTLY like the sequential
    encoding of the same pixels — quantized coefficients are identical
    once every scan lands, so the whole annex-G machinery (spectral
    selection, successive approximation first + refinement, EOB runs,
    correction bits) is pinned bit-for-bit against the already-verified
    sequential path; constant blocks keep the exact oracle contract."""
    import random
    from collections import Counter

    from pyspark_ingestion_spark.operators.multimodal import (
        _JPEG_FIXTURE_QUANT,
        _jpeg_encode_gray,
        _jpeg_encode_gray_progressive,
        _jpeg_luma_millis,
        media_signal_features,
        synthesize_jpeg_progressive_payload,
    )

    rnd = random.Random(11)
    for _ in range(4):
        w = 8 * rnd.randrange(1, 7)
        h = 8 * rnd.randrange(1, 7)
        pix = bytes(rnd.randrange(256) for _ in range(w * h))
        seq = _jpeg_luma_millis(_jpeg_encode_gray(pix, w, h, _JPEG_FIXTURE_QUANT))
        prog = _jpeg_luma_millis(
            _jpeg_encode_gray_progressive(pix, w, h, _JPEG_FIXTURE_QUANT)
        )
        assert seq == prog, (w, h)
    # q=1: large coefficients, every successive-approximation level busy
    pix = bytes(rnd.randrange(256) for _ in range(48 * 48))
    assert _jpeg_luma_millis(
        _jpeg_encode_gray_progressive(pix, 48, 48, [1] * 64)
    ) == _jpeg_luma_millis(_jpeg_encode_gray(pix, 48, 48, [1] * 64))

    # constant-block fixture keeps the exact byte-arithmetic contract
    text = "progressive jpeg really decodes " * 4
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = media_signal_features(
        synthesize_jpeg_progressive_payload(df, "doc_id", "text")
    ).collect()[0]
    data = text.encode()
    nblk = 32 * -(-max(1, len(data)) // 32)
    vals = list(data.ljust(nblk, b"\x00"))
    assert out["container"] == "jpeg" and out["n_values"] == nblk * 64
    assert abs(out["mean_val"] - sum(vals) / nblk) < 1e-9

    # a truncated progressive file still raises ValueError
    full = _jpeg_encode_gray_progressive(
        bytes(range(64)), 8, 8, _JPEG_FIXTURE_QUANT
    )
    with pytest.raises(ValueError):
        _jpeg_luma_millis(full[: len(full) - 8])


def test_jpeg_progressive_zero_scans_raises(spark):
    """A SOF2 frame with no SOS scans is unambiguously corrupt and must
    raise (it used to 'decode' to fabricated mid-gray pixels — r7
    review); a partial-but-nonzero scan count stays legal progressive."""
    from pyspark_ingestion_spark.operators.multimodal import (
        _JPEG_FIXTURE_QUANT,
        _jpeg_encode_gray_progressive,
        _jpeg_luma_millis,
    )

    full = _jpeg_encode_gray_progressive(bytes(range(64)), 8, 8, _JPEG_FIXTURE_QUANT)
    first_sos = full.index(b"\xff\xda")
    with pytest.raises(ValueError, match="missing SOF/SOS"):
        _jpeg_luma_millis(full[:first_sos] + b"\xff\xd9")


def test_jpeg_16bit_quant_tables(spark):
    """Pq=1 DQT segments (16-bit big-endian steps — high-quality/
    low-loss encoders) parse and decode; constant blocks stay exact
    through a >255 AC step table in all three encoders, and progressive
    remains bit-identical to sequential under it. Precision nibbles
    other than 0/1 raise."""
    import random
    from collections import Counter

    from pyspark_ingestion_spark.operators.multimodal import (
        _jpeg_encode_gray,
        _jpeg_encode_gray_progressive,
        _jpeg_encode_ycbcr_neutral,
        _jpeg_luma_millis,
        _jpeg_parse_dqt,
    )

    rnd = random.Random(5)
    q16 = [8] + [300] * 63
    vals = [rnd.randrange(256) for _ in range(16)]
    w = h = 32
    pix = bytearray(w * h)
    for bi, v in enumerate(vals):
        by, bx = divmod(bi, 4)
        for yy in range(8):
            base = (by * 8 + yy) * w + bx * 8
            pix[base : base + 8] = bytes([v]) * 8
    want = Counter(1000 * p for p in pix)
    for enc in (_jpeg_encode_gray, _jpeg_encode_gray_progressive,
                _jpeg_encode_ycbcr_neutral):
        assert Counter(_jpeg_luma_millis(enc(bytes(pix), w, h, q16))) == want
    pix2 = bytes(rnd.randrange(256) for _ in range(16 * 16))
    assert _jpeg_luma_millis(
        _jpeg_encode_gray(pix2, 16, 16, q16)
    ) == _jpeg_luma_millis(_jpeg_encode_gray_progressive(pix2, 16, 16, q16))
    with pytest.raises(ValueError, match="precision"):
        _jpeg_parse_dqt(b"\x20" + bytes(64), {})


def test_image_dhash_perceptual_properties(spark):
    """image_dhash over REAL decoded pixels has the perceptual contract
    image dedup needs: a uniform brightness shift leaves the hash
    IDENTICAL (cross-multiplied cell-mean comparisons shift equally on
    both sides), a small local edit flips at most the bits of the cells
    it touches, unrelated content lands far away, and the SAME pixel
    plane re-encoded through different containers (PNG deflate+filters
    vs GIF LZW) hashes identically — re-encoded duplicates are found."""
    from pyspark_ingestion_spark.operators.multimodal import (
        image_dhash,
        synthesize_bmp_payload,
        synthesize_gif_payload,
        synthesize_png_payload,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8  # 360 = 10 rows
    bright = "".join(chr(ord(c) + 1) for c in base)  # every byte +1
    edited = "zzz" + base[3:]  # perturbs exactly pixel 0
    other = "completely different pixel content everywhere!! " * 8
    df = spark.createDataFrame(
        [(1, base), (2, bright), (3, edited), (4, other)],
        "doc_id long, text string",
    )
    sig = {
        r["doc_id"]: (r["dh_hi"], r["dh_lo"])
        for r in image_dhash(
            synthesize_bmp_payload(df, "doc_id", "text", width=12)
        ).collect()
    }

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert sig[1] == sig[2], "brightness shift must be hash-invariant"
    assert ham(sig[1], sig[3]) <= 2, "local edit must flip only nearby bits"
    assert ham(sig[1], sig[4]) >= 8, "distinct content must not collide"

    # re-encode invariance: PNG and GIF carry the same grayscale plane
    df2 = spark.createDataFrame(
        [(1, base), (4, other)], "doc_id long, text string"
    )
    png = {
        r["doc_id"]: (r["dh_hi"], r["dh_lo"])
        for r in image_dhash(
            synthesize_png_payload(df2, "doc_id", "text")
        ).collect()
    }
    gif = {
        r["doc_id"]: (r["dh_hi"], r["dh_lo"])
        for r in image_dhash(
            synthesize_gif_payload(df2, "doc_id", "text")
        ).collect()
    }
    assert png == gif, "same pixels re-encoded must hash identically"

    # LOSSY re-encode robustness (r9, VERDICT r8 item 3): the realistic
    # image-dedup case is a JPEG re-encode of the same pixels. Decode a
    # real JPEG, re-encode the decoded plane through the real encoder at
    # progressively harsher quant tiers (fixture / 2x / 4x / 8x) — every
    # round trip must land within the banding's <=7-bit Hamming radius
    # (block means absorb bounded per-pixel quantization error), while a
    # distinct image stays outside it. Measured drift on the smooth
    # fixture plane: 0 bits at every tier.
    import math as _math

    from pyspark_ingestion_spark.operators.multimodal import (
        _image_dhash_bits,
        _jpeg_encode_gray,
        _jpeg_luma_millis,
        _JPEG_FIXTURE_QUANT,
    )

    W, H = 72, 64

    def plane(f):
        return bytes(
            max(0, min(255, int(f(x, y)))) for y in range(H) for x in range(W)
        )

    orig_pix = plane(
        lambda x, y: 40 + 2.2 * x + 1.1 * y
        + 18 * _math.sin(x / 9) + 12 * _math.cos(y / 7)
    )
    dist_pix = plane(
        lambda x, y: 220 - 2.0 * x - 0.8 * y + 15 * _math.cos(x / 5 + y / 11)
    )
    j_orig = _jpeg_encode_gray(orig_pix, W, H, _JPEG_FIXTURE_QUANT)
    h_orig = _image_dhash_bits(j_orig)
    h_dist = _image_dhash_bits(
        _jpeg_encode_gray(dist_pix, W, H, _JPEG_FIXTURE_QUANT)
    )
    decoded = bytes(v // 1000 for v in _jpeg_luma_millis(j_orig))
    tiers = {
        "fine": _JPEG_FIXTURE_QUANT,
        "2x": [16] + [32] * 63,
        "4x": [32] + [64] * 63,
        "8x": [64] + [128] * 63,
    }
    reenc_payloads = {}
    for name, q in tiers.items():
        j_re = _jpeg_encode_gray(decoded, W, H, q)
        reenc_payloads[name] = j_re
        d = ham(h_orig, _image_dhash_bits(j_re))
        assert d <= 7, f"JPEG re-encode @{name} drifted {d} bits (> band radius)"
    assert ham(h_orig, h_dist) >= 8, "distinct JPEGs must stay outside the radius"

    # and through the Spark operator: the banded pair search would
    # surface (orig, harshest re-encode) — same hashes as driver-side
    jdf = spark.createDataFrame(
        [(1, bytearray(j_orig)), (2, bytearray(reenc_payloads["8x"]))],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: (r["dh_hi"], r["dh_lo"]) for r in image_dhash(jdf).collect()
    }
    assert ham(got[1], got[2]) <= 7


def test_fingerprint_salted_bucket_fallback(spark):
    """bucket_cap_mode='salt' (r11): a planted POPULAR near-dup cluster
    (60 identical fingerprints — every shared band bucket oversized at
    cap=8) loses ALL recall under drop mode but keeps bounded partial
    recall under salt mode, while below-cap buckets behave identically
    and every surviving pair is a genuine uncapped candidate."""
    import pytest as _pytest

    from pyspark_ingestion_spark.operators.multimodal import fingerprint_pairs

    cluster = [(i, 0x0123456789ABCDE0, 0x0FEDCBA987654321) for i in range(60)]
    trio = [(100 + i, 0x7070707070707070, 0x0101010101010101) for i in range(3)]
    lone = [  # pairwise Hamming far above radius=7 (dense xor patterns)
        (200, 0x5555555555555555, 0x3333333333333333),
        (201, 0x0F0F0F0F0F0F0F0F, 0x00FF00FF00FF00FF),
        (202, 0x7777000077770000, 0x0000777700007777),
        (203, 0x1248124812481248, 0x7C007C007C007C00),
        (204, 0x0000FFFF0000FFFF, 0x6666666666666666),
    ]
    fp = spark.createDataFrame(cluster + trio + lone, "doc long, hi long, lo long")

    def pairs(**kw):
        return {
            (r["doc_a"], r["doc_b"])
            for r in fingerprint_pairs(fp, **kw).collect()
        }

    uncapped = pairs()
    dropped = pairs(max_bucket_size=8)
    salted = pairs(max_bucket_size=8, bucket_cap_mode="salt")

    assert len(uncapped) == 60 * 59 // 2 + 3
    # drop mode: the whole popular cluster is gone; the below-cap trio survives
    assert dropped == {(100, 101), (100, 102), (101, 102)}
    # monotone: drop ⊆ salt ⊆ uncapped — salt only ADDS genuine candidates
    assert dropped <= salted <= uncapped
    # real recall recovered inside the hot bucket...
    cluster_salted = {p for p in salted if p[0] < 100}
    assert len(cluster_salted) >= 50
    # ...but bounded sub-quadratically: ceil(60/8)=8 sub-buckets of ~7.5
    # docs cap the pair count far below the full 1770
    assert len(cluster_salted) <= 60 * 8  # n·cap bound
    # per-doc candidate work stays ~cap, not n
    from collections import Counter

    per_doc = Counter()
    for a, b in cluster_salted:
        per_doc[a] += 1
        per_doc[b] += 1
    assert max(per_doc.values()) <= 3 * 8

    with _pytest.raises(ValueError, match="bucket_cap_mode"):
        fingerprint_pairs(fp, max_bucket_size=8, bucket_cap_mode="bogus")


def test_probe_salted_buckets_bounded_replication(spark):
    """The cross-side salt probe (r12, VERDICT r11 item 3) replicates a
    band row into min(n_salts, probe_salts) DISTINCT sub-buckets of an
    oversized bucket and leaves non-oversized rows at one copy, salt 0
    — the O(batch·R) bound and the salt-domain agreement with the
    corpus side, pinned directly on the helper."""
    from pyspark_ingestion_spark.operators.dedup import (
        _oversized_bucket_salts,
        _probe_salted_buckets,
        _salt_corpus_bands,
    )

    # one oversized bucket (hot: 20 rows > cap 4 -> 5 salts) + one small
    corpus = spark.createDataFrame(
        [(i, 0, "hot") for i in range(20)] + [(100 + i, 0, "cold") for i in range(3)],
        "doc long, band int, band_key string",
    )
    big = _oversized_bucket_salts(corpus, 4)
    assert {(r["band"], r["band_key"], r["__nsalts"]) for r in big.collect()} == {
        (0, "hot", 5)
    }

    batch = spark.createDataFrame(
        [(1000, 0, "hot"), (1001, 0, "cold"), (1002, 1, "elsewhere")],
        "doc long, band int, band_key string",
    )
    probed = _probe_salted_buckets(batch, big, probe_salts=3).collect()
    by_doc: dict[int, list[int]] = {}
    for r in probed:
        by_doc.setdefault(r["doc"], []).append(r["__salt"])
    # oversized bucket: exactly min(5, 3) = 3 DISTINCT salts in domain
    assert len(by_doc[1000]) == 3 == len(set(by_doc[1000]))
    assert all(0 <= s < 5 for s in by_doc[1000])
    # non-oversized rows: one copy, salt 0
    assert by_doc[1001] == [0] and by_doc[1002] == [0]

    # the corpus side's salts live in the same domain from the same list
    salted_corpus = _salt_corpus_bands(corpus, big).collect()
    assert all(0 <= r["__salt"] < 5 for r in salted_corpus if r["band_key"] == "hot")
    assert all(r["__salt"] == 0 for r in salted_corpus if r["band_key"] == "cold")
    # probe_salts >= n_salts degenerates to probing EVERY sub-bucket —
    # the full uncapped candidate set for that bucket
    full = _probe_salted_buckets(
        batch.filter("band_key = 'hot'"), big, probe_salts=99
    ).collect()
    assert sorted(r["__salt"] for r in full) == [0, 1, 2, 3, 4]


def test_incremental_lsh_salted_admission_recall(spark):
    """Cross-side admission salting (r12, VERDICT r11 item 3): a batch
    doc near-duplicating a POPULAR corpus cluster (every shared band
    bucket oversized) is silently ADMITTED under drop mode but rejected
    under salt mode — recall(salt) ⊇ recall(drop), ⊆ recall(uncapped),
    on a planted cluster with deterministic seeded hashes."""
    from pyspark_ingestion_spark.operators.dedup import incremental_lsh_rejects

    cluster_text = "the quick brown fox jumps over the lazy dog again and again"
    distinct = [
        (100 + i, f"unique document number {i} with entirely different words "
                  f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}")
        for i in range(10)
    ]
    corpus = spark.createDataFrame(
        [(i, cluster_text) for i in range(40)] + distinct,
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1000, cluster_text), (1001, cluster_text)]
        + [(1002, "novel content zeta eta theta iota kappa that matches nothing")],
        "doc_id long, text string",
    )

    def rejects(**kw):
        return {
            r["doc_id"]
            for r in incremental_lsh_rejects(
                corpus, batch, "doc_id", "text", n=3, num_hashes=8,
                band_size=2, threshold_num=1, threshold_den=2, **kw
            ).collect()
        }

    uncapped = rejects()
    assert uncapped == {1000, 1001}
    # drop mode: the cluster fills EVERY band bucket past cap=4, so its
    # near-dups sail through admission — the silent recall loss
    dropped = rejects(max_bucket_size=4)
    assert dropped == set()
    # salt mode: each batch doc probes 4 sub-buckets per band (~cap
    # partners each) and the exact Jaccard verify fires at 1.0
    salted = rejects(max_bucket_size=4, bucket_cap_mode="salt")
    assert dropped <= salted <= uncapped
    assert salted == {1000, 1001}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket_cap_mode"):
        rejects(bucket_cap_mode="bogus")


def test_fingerprint_batch_rejects_salted_admission(spark):
    """The fingerprint cross-side face of the same r12 property: batch
    items within radius of a planted popular fingerprint cluster are
    missed by drop mode (every band bucket oversized) and recovered by
    salt mode, with drop ⊆ salt ⊆ uncapped; threaded through the
    streaming sink's reject helper signature."""
    from pyspark_ingestion_spark.operators.multimodal import (
        fingerprint_batch_rejects,
    )

    cluster = [(i, 0x0123456789ABCDE0, 0x0FEDCBA987654321) for i in range(30)]
    lone = [
        (200, 0x5555555555555555, 0x3333333333333333),
        (201, 0x0F0F0F0F0F0F0F0F, 0x00FF00FF00FF00FF),
    ]
    corpus = spark.createDataFrame(cluster + lone, "doc long, hi long, lo long")
    batch = spark.createDataFrame(
        [
            (1000, 0x0123456789ABCDE0, 0x0FEDCBA987654321),  # in-cluster
            (1001, 0x0123456789ABCDE0, 0x0FEDCBA987654323),  # 1 bit off
            (1002, 0x7777000077770000, 0x0000777700007777),  # novel
        ],
        "doc long, hi long, lo long",
    )

    def rejects(**kw):
        return {
            r["doc"]
            for r in fingerprint_batch_rejects(
                corpus, batch, radius=7, **kw
            ).collect()
        }

    uncapped = rejects()
    assert uncapped == {1000, 1001}
    dropped = rejects(max_bucket_size=4)
    assert dropped == set()
    salted = rejects(max_bucket_size=4, bucket_cap_mode="salt")
    assert dropped <= salted <= uncapped
    assert salted == {1000, 1001}


def test_jpeg_table_cache_lru_eviction():
    """Cache overflow evicts ONE least-recently-USED DHT spec (with its
    peek LUT), never the whole cache: a workload cycling through >64
    distinct tables keeps its HOT tables cached by identity instead of
    rebuilding 65536-entry LUTs on every frame (r11 advice made the
    eviction single-entry; r12 made it LRU — under FIFO a >64-spec
    cyclic workload still evicted in-use tables one at a time)."""
    from pyspark_ingestion_spark.operators import multimodal as mm

    mm._JPEG_TABLE_CACHE.clear()
    mm._JPEG_LUT_CACHE.clear()

    def spec(i):
        bits = [0] * 16
        bits[7] = 1  # one 8-bit code whose symbol makes the spec unique
        return bits, [i & 0xFF]

    t0 = mm._jpeg_decode_table(*spec(0))
    mm._jpeg_lut(t0)
    tables = [mm._jpeg_decode_table(*spec(i)) for i in range(1, 65)]
    assert len(mm._JPEG_TABLE_CACHE) == 65  # 0..64, no eviction yet

    # HIT the oldest-inserted spec: under LRU this moves it to the
    # recency tail, so the next overflow must evict spec 1 instead
    assert mm._jpeg_decode_table(*spec(0)) is t0
    t65 = mm._jpeg_decode_table(*spec(65))  # overflow -> evict coldest
    assert len(mm._JPEG_TABLE_CACHE) == 65
    # the eviction-order pin: spec 0 (recently hit) survived, spec 1
    # (the true LRU entry) was the one evicted and now rebuilds
    assert mm._jpeg_decode_table(*spec(0)) is t0
    assert mm._jpeg_decode_table(*spec(1)) is not tables[0]
    # ... and t0's LUT survived alongside it
    assert id(t0) in mm._JPEG_LUT_CACHE

    # LUT cache is LRU too: a hit re-inserts, so the hit entry is not
    # the next evictee
    lut0 = mm._jpeg_lut(t0)
    for t in tables[:64]:
        mm._jpeg_lut(t)  # fill to the 65-entry bound (t0 + 64)
    assert mm._jpeg_lut(t0) is lut0          # hit: move-to-end
    mm._jpeg_lut(t65)                        # overflow -> evicts tables[0]
    assert id(t0) in mm._JPEG_LUT_CACHE
    assert id(tables[0]) not in mm._JPEG_LUT_CACHE
    assert mm._jpeg_lut(t0) is lut0


def test_pixel_features_known_histogram(spark):
    """extract_features(mode='pixel') returns the REAL luma histogram:
    hand-computed on a known BMP, WAV samples binned by bit depth, and
    the mode gates (model → NotImplementedError, bogus → ValueError)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pyspark_ingestion_spark.operators.multimodal import (
        extract_features,
        synthesize_bmp_payload,
        synthesize_wav_payload,
    )

    # 12 bytes = one 4-px row: pixels (B,G,R) = (97,98,99)x2, (100,101,102),
    # (103,104,105) -> lumas 98257, 98257, 101257, 104257 (all bin 3 of 8:
    # lm*8//255000 = 3)
    df = spark.createDataFrame([(1, "abcdefghijkl")], "doc_id long, text string")
    feats = extract_features(
        synthesize_bmp_payload(df, "doc_id", "text"), dim=8, mode="pixel"
    ).collect()[0]["features"]
    assert feats == [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0]

    # 8-bit WAV: 'abcd' samples centered (-31..-27), +128 -> 97..100,
    # bin = v*8//256 = 3 for all four
    wav = extract_features(
        synthesize_wav_payload(df.select("doc_id", F.lit("abcd").alias("text")),
                               "doc_id", "text"),
        dim=8, mode="pixel",
    ).collect()[0]["features"]
    assert wav == [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0]

    media = synthesize_bmp_payload(df, "doc_id", "text")
    with _pytest.raises(Exception, match="learned feature-extraction"):
        extract_features(media, dim=8, mode="model").collect()
    with _pytest.raises(ValueError, match="unknown feature mode"):
        extract_features(media, dim=8, mode="bogus")


def test_audio_fhash_perceptual_properties(spark):
    """audio_fhash over REAL decoded PCM has the perceptual contract
    audio dedup needs: a DC offset leaves the hash IDENTICAL (every
    frame mean shifts equally, cross-multiplied comparisons cancel it),
    a POSITIVE gain leaves it identical (scales cancel), a small local
    edit flips at most the bits of the frames it touches, and distinct
    clips land far apart. Checked on the 8-bit synthesizer path AND on
    a hand-built 16-bit PCM WAV (the bit-depth branch)."""
    import struct

    from pyspark_ingestion_spark.operators.multimodal import (
        _audio_fhash_bits,
        audio_fhash,
        synthesize_wav_payload,
    )

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    base = "the quick brown fox jumps over the lazy dog " * 3  # 135 samples
    shifted = "".join(chr(ord(c) + 5) for c in base)           # DC offset +5
    edited = "zzz" + base[3:]                                  # local edit
    other = "completely different audio content every sample! " * 3
    df = spark.createDataFrame(
        [(1, base), (2, shifted), (3, edited), (4, other)],
        "doc_id long, text string",
    )
    sig = {
        r["doc_id"]: (r["fh_hi"], r["fh_lo"])
        for r in audio_fhash(
            synthesize_wav_payload(df, "doc_id", "text")
        ).collect()
    }
    assert sig[1] == sig[2], "DC offset must be hash-invariant"
    assert ham(sig[1], sig[3]) <= 4, "local edit must flip only leading bits"
    assert ham(sig[1], sig[4]) >= 8, "distinct clips must not collide"

    # 16-bit PCM branch + exact gain invariance (x3 stays in int16)
    def wav16(samples):
        data = b"".join(struct.pack("<h", s) for s in samples)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    samples = [((i * 37) % 501) - 250 for i in range(200)]
    h1 = _audio_fhash_bits(wav16(samples))
    h3 = _audio_fhash_bits(wav16([3 * s for s in samples]))
    hoff = _audio_fhash_bits(wav16([s + 97 for s in samples]))
    assert h1 == h3, "positive gain must be hash-invariant"
    assert h1 == hoff, "DC offset must be hash-invariant (16-bit)"
    hneg = _audio_fhash_bits(wav16([-s for s in samples]))
    assert ham(h1, hneg) >= 8, "inverted signal is a different clip"


def test_avi_mjpeg_video_decode_real(spark):
    """Video's honest-gate exit (r9): synthesize_avi_payload builds
    WELL-FORMED RIFF AVIs (hdrl/strl headers, word-aligned movi chunks,
    an idx1 whose offsets really point at the frame chunks) around
    genuinely-encoded MJPEG frames, and video_frame_stats decodes every
    frame through the real JPEG pipeline. Pins: (1) per-frame stats
    equal an independent Python model of the byte→frame split;
    (2) the idx1/movi cross-check — offsets and sizes match the chunks
    the walker finds; (3) the container walker fails LOUD on truncated
    payloads, non-AVI RIFF, non-MJPG streams, and a stream header whose
    declared frame count disagrees with movi."""
    import math
    import struct

    import pytest as _pytest

    from pyspark_ingestion_spark.operators.multimodal import (
        _avi_frame_payloads,
        synthesize_avi_payload,
        video_frame_stats,
    )

    texts = [
        (1, "hello world, this is a forty-seven byte string!"),  # 2 frames
        (2, "x"),                                                # 1 frame, padded
        (3, "A" * 96),                                           # exactly 3 frames
        (4, "".join(chr(32 + (i * 7) % 95) for i in range(200))),  # 7 frames
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    media = synthesize_avi_payload(df, "doc_id", "text")
    got = {
        (r["doc_id"], r["frame_idx"]): (
            r["width"], r["height"], r["n_values"], r["mean_val"], r["rms"]
        )
        for r in video_frame_stats(media).collect()
    }

    want = {}
    for doc_id, t in texts:
        data = t.encode()
        n_frames = max(1, -(-len(data) // 32))
        padded = data.ljust(n_frames * 32, b"\x00")
        for f in range(n_frames):
            b = list(padded[f * 32:(f + 1) * 32])
            want[(doc_id, f)] = (
                256, 8, 2048,
                round(sum(b) / 32.0, 6),
                round(math.sqrt(sum(x * x for x in b) / 32.0), 6),
            )
    assert got == want

    # idx1 really indexes the movi chunks the walker returns
    payload = bytes(media.filter("doc_id = 4").collect()[0]["payload"])
    _w, _h, frames = _avi_frame_payloads(payload)
    i1 = payload.index(b"idx1")
    (isz,) = struct.unpack_from("<I", payload, i1 + 4)
    entries = [
        struct.unpack_from("<4sIII", payload, i1 + 8 + 16 * k)
        for k in range(isz // 16)
    ]
    movi = payload.index(b"movi")
    assert len(entries) == len(frames) == 7
    for (fcc, flags, off, size), frame in zip(entries, frames):
        assert fcc == b"00dc" and flags == 0x10
        assert payload[movi + off:movi + off + 4] == b"00dc"
        (csz,) = struct.unpack_from("<I", payload, movi + off + 4)
        assert csz == size == len(frame)
        assert payload[movi + off + 8:movi + off + 8 + csz] == frame

    # a SECONDARY stream (the common MJPEG+PCM camera layout) must NOT
    # reject the file: splice an 'auds' strl into hdrl after the video
    # strl and re-walk — same dims, same frames (review fix: the walker
    # used to validate every strl as vids/MJPG)
    hdrl_kind = payload.index(b"hdrl")
    (hdrl_sz,) = struct.unpack_from("<I", payload, hdrl_kind - 4)
    strh_a = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"auds", b"\x01\x00\x00\x00",
                         0, 0, 0, 0, 1, 8000, 0, 8000, 8000, 0, 0, 0, 0, 0, 0)
    wf = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    astrl = (b"LIST"
             + struct.pack("<I", 4 + 8 + len(strh_a) + 8 + len(wf))
             + b"strl"
             + b"strh" + struct.pack("<I", len(strh_a)) + strh_a
             + b"strf" + struct.pack("<I", len(wf)) + wf)
    ins = hdrl_kind + hdrl_sz  # end of hdrl body
    with_audio = bytearray(payload[:ins] + astrl + payload[ins:])
    struct.pack_into("<I", with_audio, 4,
                     struct.unpack_from("<I", with_audio, 4)[0] + len(astrl))
    struct.pack_into("<I", with_audio, hdrl_kind - 4, hdrl_sz + len(astrl))
    w2, h2, frames2 = _avi_frame_payloads(bytes(with_audio))
    assert (w2, h2) == (_w, _h) and frames2 == frames

    # interleaved AUDIO DATA in movi ('01wb' chunks, the real camera
    # layout) must be excluded from the frame list — only stream 0's
    # '00dc'/'00db' chunks are video (review fix: the walker used to
    # take any '??dc'/'??db' chunk, so a hypothetical '01dc' second
    # video stream would have polluted the decode)
    movi2 = bytes(with_audio).index(b"movi")
    (movi_sz,) = struct.unpack_from("<I", with_audio, movi2 - 4)
    audio_chunk = b"01wb" + struct.pack("<I", 6) + b"\x80" * 6
    ins2 = movi2 + 4  # right after the 'movi' kind tag
    interleaved = bytearray(
        bytes(with_audio)[:ins2] + audio_chunk + bytes(with_audio)[ins2:]
    )
    struct.pack_into("<I", interleaved, 4,
                     struct.unpack_from("<I", interleaved, 4)[0]
                     + len(audio_chunk))
    struct.pack_into("<I", interleaved, movi2 - 4, movi_sz + len(audio_chunk))
    w3, h3, frames3 = _avi_frame_payloads(bytes(interleaved))
    assert (w3, h3) == (_w, _h) and frames3 == frames

    # fail-loud grammar: truncation, wrong form type, wrong codec,
    # frame-count mismatch between strh and movi
    with _pytest.raises(ValueError, match="truncated"):
        _avi_frame_payloads(payload[:40])
    with _pytest.raises(ValueError, match="not a RIFF AVI"):
        _avi_frame_payloads(b"RIFF\x04\x00\x00\x00WAVE")
    with _pytest.raises(ValueError, match="MJPG"):
        _avi_frame_payloads(payload.replace(b"MJPG", b"H264", 1))
    strh_at = payload.index(b"strh")
    doctored = bytearray(payload)
    struct.pack_into("<I", doctored, strh_at + 8 + 32, 99)  # declared frames
    with _pytest.raises(ValueError, match="declares 99 frames"):
        _avi_frame_payloads(bytes(doctored))


def test_video_frame_sample_decodes_only_sampled_frames(spark):
    """video_frame_stats(every_k=3) equals the full decode filtered to
    frame_idx % 3 == 0 — and the sampling happens BEFORE the JPEG
    stage (the container walk yields frame bytes; skipped frames are
    never entropy-decoded), which is the whole point of sampling at
    real video lengths. every_k=0 fails loud."""
    import pytest as _pytest

    from pyspark_ingestion_spark.operators.multimodal import (
        synthesize_avi_payload,
        video_frame_stats,
    )

    df = spark.createDataFrame(
        [(1, "".join(chr(32 + (i * 11) % 95) for i in range(250))),  # 8 frames
         (2, "short clip")],                                         # 1 frame
        "doc_id long, text string",
    )
    media = synthesize_avi_payload(df, "doc_id", "text")

    def rows(d):
        return sorted(tuple(r) for r in d.collect())

    full = video_frame_stats(media)
    sampled = video_frame_stats(media, every_k=3)
    assert rows(sampled) == rows(full.filter("frame_idx % 3 = 0"))
    assert {r["frame_idx"] for r in sampled.filter("doc_id = 1").collect()} \
        == {0, 3, 6}
    with _pytest.raises(ValueError, match="every_k"):
        video_frame_stats(media, every_k=0)


def test_rle8_inter_frame_video_decode_real(spark):
    """r13: the inter-frame gate exits at its entry level (BI_RLE8).
    Pins: (1) encode→decode roundtrip over a random delta-coded frame
    chain (every composed frame reproduced bit-exact); (2) delta frames
    really are deltas — decoding one WITHOUT its predecessors' state
    gives the wrong image (statefulness is load-bearing); (3) the full
    RLE8 escape set decodes (absolute mode with word padding, delta
    skip retaining previous pixels, EOL, EOB); (4) loud failures on
    truncation and bitmap overflow; (5) video_frame_stats over a real
    MRLE AVI equals the composed frames' palette-luma stats, and
    every_k emits sampled frames whose stats still reflect full
    inter-frame composition; (6) the per-frame-JPEG surfaces still
    reject stateful streams."""
    import random
    import struct

    from pyspark_ingestion_spark.operators.multimodal import (
        _avi_build,
        _avi_frame_payloads,
        _avi_stream_info,
        _rgbquad_luma_millis,
        _rle8_decode_frame,
        _rle8_encode_frame,
        synthesize_rle8_avi_payload,
        video_frame_stats,
    )

    rnd = random.Random(99)
    W, H = 32, 6
    truth = [bytes(rnd.randrange(256) for _ in range(W * H))]
    for _ in range(7):
        cur = bytearray(truth[-1])
        for _ in range(rnd.randrange(1, 4)):
            y = rnd.randrange(H)
            x0 = rnd.randrange(W)
            ln = rnd.randrange(1, W - x0 + 1)
            cur[y * W + x0:y * W + x0 + ln] = bytes([rnd.randrange(256)]) * ln
        truth.append(bytes(cur))
    enc = [_rle8_encode_frame(truth[0], W, H, None)]
    enc += [_rle8_encode_frame(b, W, H, a) for a, b in zip(truth, truth[1:])]

    prev = bytes(W * H)
    for i, e in enumerate(enc):
        prev = _rle8_decode_frame(e, W, H, prev)
        assert prev == truth[i], f"frame {i} composed wrong"

    # (2) state is load-bearing: a delta frame over a zero buffer is NOT
    # the composed image (and the delta stream is smaller than the key)
    assert _rle8_decode_frame(enc[3], W, H, bytes(W * H)) != truth[3]
    assert len(enc[1]) < len(enc[0])

    # (3) absolute mode (odd count ⇒ pad byte) + delta skip + EOL
    out = _rle8_decode_frame(
        bytes([0, 5, 9, 8, 7, 6, 5, 0, 0, 0, 0, 2, 1, 0, 3, 4, 0, 1]),
        8, 2, bytes([1]) * 16,
    )
    assert list(out[:8]) == [9, 8, 7, 6, 5, 1, 1, 1]   # absolute then retained
    assert list(out[8:]) == [1, 4, 4, 4, 1, 1, 1, 1]   # EOL, skip 1, run 3x4

    # (4) loud failures
    with pytest.raises(ValueError, match="truncated"):
        _rle8_decode_frame(bytes([4, 7]), W, H, bytes(W * H))  # no EOB
    with pytest.raises(ValueError, match="overflows"):
        _rle8_decode_frame(bytes([255, 1, 0, 1]), 8, 1, bytes(8))

    # (5) the Spark surface: stats == composed palette-luma stats
    df = spark.createDataFrame(
        [(1, "inter frame rle"), (2, "x")], "doc_id long, text string"
    )
    media = synthesize_rle8_avi_payload(df, "doc_id", "text")
    payload = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}[1]
    info = _avi_stream_info(payload)
    assert (info["codec"], info["width"], info["height"]) == ("rle8", 64, 4)
    luma = _rgbquad_luma_millis(info["palette"])
    data = b"inter frame rle"
    stats = {
        (r["doc_id"], r["frame_idx"]): (r["n_values"], r["mean_val"], r["rms"])
        for r in video_frame_stats(media).collect()
    }
    prev = bytes(64 * 4)
    for fi, fb in enumerate(info["frames"]):
        prev = _rle8_decode_frame(fb, 64, 4, prev)
        vals = [luma[b] for b in prev]
        n, s, s2 = len(vals), sum(vals), sum(v * v for v in vals)
        assert stats[(1, fi)] == (
            n, round(s / (1000.0 * n), 6), round((s2 / (1e6 * n)) ** 0.5, 6)
        )
        # composed content: row fi%4 holds byte fi, later rows hold what
        # an EARLIER frame wrote — the inter-frame dependency itself
        if fi >= 1:
            r = fi % 4
            assert prev[r * 64] == data[fi]
    sampled = {
        r["frame_idx"]
        for r in video_frame_stats(media, every_k=3).filter("doc_id = 1").collect()
    }
    assert sampled == {f for f in range(len(data)) if f % 3 == 0}
    got = video_frame_stats(media, every_k=3).filter(
        "doc_id = 1 AND frame_idx = 6"
    ).collect()[0]
    assert (got["n_values"], got["mean_val"], got["rms"]) == stats[(1, 6)]

    # (6) stateful streams never reach the per-frame JPEG surfaces
    with pytest.raises(ValueError, match="MJPG"):
        _avi_frame_payloads(payload)
    # and unknown codecs still fail loud at the walk
    with pytest.raises(ValueError, match="honest codec gate"):
        _avi_stream_info(payload.replace(b"MRLE", b"H264", 1))
    # BI_RLE8 claims are validated, not trusted: MRLE handler with a
    # non-RLE8 BITMAPINFOHEADER is rejected
    bogus = _avi_build(
        [enc[0]], W, H, handler=b"MRLE",
        compression=struct.pack("<I", 0), bit_count=8,
        palette=b"\x00\x00\x00\x00" * 256,
        keyframes=[True],
    )
    with pytest.raises(ValueError, match="biCompression"):
        _avi_stream_info(bogus)
