from pyspark_ingestion_spark.functions.scalar import (
    iso_week_string,
    month_string,
    partition_date,
    sap_timestamp,
    sha256_pseudonymize,
    stringify,
    year_string,
)

__all__ = [
    "iso_week_string",
    "month_string",
    "partition_date",
    "sap_timestamp",
    "sha256_pseudonymize",
    "stringify",
    "year_string",
]
