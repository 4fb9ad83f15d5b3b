from pyspark_ingestion_spark.ingestion.pipeline import IngestResult, ingest_table
from pyspark_ingestion_spark.ingestion.prep import (
    PREP_REGISTRY,
    TableSettings,
    prepare,
    prepare_c1,
    prepare_lims,
    prepare_sap,
)
from pyspark_ingestion_spark.ingestion.watermark import (
    SYNC_DATETIME_FORMAT,
    Watermark,
    format_watermark,
    read_watermark,
    write_watermark,
)

__all__ = [
    "IngestResult",
    "ingest_table",
    "PREP_REGISTRY",
    "TableSettings",
    "prepare",
    "prepare_c1",
    "prepare_lims",
    "prepare_sap",
    "SYNC_DATETIME_FORMAT",
    "Watermark",
    "format_watermark",
    "read_watermark",
    "write_watermark",
]
