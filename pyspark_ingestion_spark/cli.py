"""Command-line entry points — parity with the reference's ``bin/`` scripts.

Reference CLIs (SURVEY §2.7): ``batch-ingestion.py`` (one table),
``batch-all-tables-ingestion.py`` (every table of a system),
``parse-data-dictionary.py`` (Excel → table-settings JSON). Same
commands here, minus the 3DES settings decryption (plain JSON + env-var
credentials) and the GCS upload tail (write straight to object-store
URIs instead — reference batch-all-tables-ingestion-to-gcs.py:96-115 is
obsolete by design).

Usage::

    python -m pyspark_ingestion_spark.cli ingest \
        --settings settings.json --system sap --table S.T1 \
        --base-path /lake [--source-path /staging/t1.parquet] \
        [--source-format csv] [--lake-format parquet]
    python -m pyspark_ingestion_spark.cli ingest-all \
        --settings settings.json --system sap --base-path /lake
    python -m pyspark_ingestion_spark.cli parse-dd \
        --csv data_dictionary.csv --out table-settings.json

``--source-path`` reads the staged table from files (the harness path);
without it the table is read over JDBC from the system's connection
settings — exactly the reference's flow, but with the watermark filter
pushed into the remote query (SURVEY §4 O-GAP1).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys

log = logging.getLogger("pyspark_ingestion_spark.cli")


def _read_source(spark, system_settings, table: str, source_path: str | None, fmt: str):
    from pyspark_ingestion_spark.sources.readers import DBMS_TO_URL, read_file, read_jdbc

    if source_path:
        return read_file(spark, source_path, file_format=fmt)
    url_builder = DBMS_TO_URL[system_settings.dbms]
    jdbc_url = url_builder(
        system_settings.host, system_settings.port, system_settings.service
    )
    ts = system_settings.tables[table]
    return read_jdbc(
        spark,
        jdbc_url,
        table,
        driver=system_settings.driver,
        fetchsize=ts.fetchsize,
        user=system_settings.user,
        password=system_settings.password,
    )


def _ingest_one(spark, systems, system: str, table: str, base_path: str,
                source_path: str | None, source_fmt: str, lake_fmt: str) -> bool:
    from pyspark_ingestion_spark.ingestion import ingest_table

    sys_settings = systems[system]
    ts = sys_settings.tables[table]
    table_path = f"{base_path}/{system}/{table}"
    df = _read_source(spark, sys_settings, table, source_path, source_fmt)
    result = ingest_table(df, system, table, table_path, ts, file_format=lake_fmt)
    log.info("%s.%s: moved=%s rows=%d watermark=%s", system, table,
             result.moved_something, result.n_rows, result.watermark.ref_last_value)
    return result.moved_something


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pyspark_ingestion_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_ing = sub.add_parser("ingest", help="incremental-ingest one table")
    p_all = sub.add_parser("ingest-all", help="incremental-ingest every table of a system")
    for p in (p_ing, p_all):
        p.add_argument("--settings", required=True)
        p.add_argument("--system", required=True)
        p.add_argument("--base-path", required=True)
        # two formats, two meanings — one flag used to cover both, so a
        # CSV staging read silently produced a CSV lake
        p.add_argument("--source-format", default="parquet",
                       help="file format of --source-path staged inputs")
        p.add_argument("--lake-format", default="parquet",
                       help="file format of the partitioned lake writes")
    p_ing.add_argument("--table", required=True)
    p_ing.add_argument("--source-path", default=None,
                       help="read the staged table from files instead of JDBC")

    p_dd = sub.add_parser("parse-dd", help="data dictionary CSV → table-settings JSON")
    p_dd.add_argument("--csv", required=True)
    p_dd.add_argument("--out", required=True)

    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    if args.cmd == "parse-dd":
        from pyspark_ingestion_spark.sources.settings import parse_data_dictionary_csv

        table_settings = parse_data_dictionary_csv(args.csv)
        with open(args.out, "w") as f:
            json.dump(
                {t: dataclasses.asdict(ts) for t, ts in table_settings.items()},
                f, indent=2,
            )
        log.info("wrote %d table settings to %s", len(table_settings), args.out)
        return 0

    from pyspark_ingestion_spark.session import get_spark_session
    from pyspark_ingestion_spark.sources.settings import load_settings

    from pyspark.sql import SparkSession

    systems = load_settings(args.settings)
    # getOrCreate may return a session owned by the embedding process
    # (tests, notebooks) — only stop what this CLI itself created.
    # getActiveSession() alone is THREAD-local: an embedder's session
    # created on another thread would read as None here while
    # getOrCreate still returns it — and we'd stop it. Check the
    # process-wide default too.
    pre_existing = (
        SparkSession.getActiveSession()
        or getattr(SparkSession, "_instantiatedSession", None)
    )
    spark = get_spark_session(app_name=f"ingest-{args.system}")
    try:
        if args.cmd == "ingest":
            _ingest_one(spark, systems, args.system, args.table, args.base_path,
                        args.source_path, args.source_format, args.lake_format)
        else:  # ingest-all: sequential like the reference; tables are
            # independent — parallelize with a pool at fleet scale
            for table in systems[args.system].tables:
                _ingest_one(spark, systems, args.system, table, args.base_path,
                            None, args.source_format, args.lake_format)
    finally:
        if pre_existing is None:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
