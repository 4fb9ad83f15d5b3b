from pyspark_ingestion_spark.sources.readers import TABLES, load_table, register_views
from pyspark_ingestion_spark.sources.writers import write_partitioned

__all__ = ["TABLES", "load_table", "register_views", "write_partitioned"]
