"""pyspark_ingestion_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``gianmarcodonetti/pyspark-ingestion`` (incremental JDBC →
partitioned-lake ingestion with per-source preparation), extended with the
relational operator surface and LLM-training-data pipeline operators
(dedup, similarity search, text analysis) that a 100 TB-scale deployment
needs.

Design stance (see SURVEY.md §7):
- declarative DataFrame/SQL plans; Catalyst picks physical strategy
- zero row-at-a-time Python UDFs in hot paths (reference used 7 — see
  reference config.py:14-92); native columnar expressions instead
- partition-aligned writes, AQE on, broadcast hints for dim tables
"""

__version__ = "0.1.0"

from pyspark_ingestion_spark.session import get_spark_session

__all__ = ["get_spark_session", "__version__"]
