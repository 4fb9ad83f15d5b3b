"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference ingests from engines Spark has no built-in connector for
(its JDBC dialect dispatch, reference spark.py:24-61); the modern Spark
answer to "a source we don't have a connector for" is a Python
DataSource: implement ``partitions()`` + ``read()`` and the source
plans like any other scan — partition-parallel, schema-typed,
Arrow-batched back to the JVM.

``SyntheticSource`` is the engine's reference implementation of the
API: a deterministic generator (linear-congruential values) whose
output is exactly reproducible in SQL, so even the custom-source path
is oracle-checkable end-to-end. A real connector (REST API, message
queue, proprietary wire protocol) replaces the ``read`` body and keeps
the partition-planning shape: split the keyspace in ``partitions()``,
fetch one split per task in ``read()``.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: glibc LCG constants — the point is determinism, not randomness
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 32768


class SyntheticReader(DataSourceReader):
    """Partition-parallel deterministic row generator.

    Options: ``n`` total rows, ``partitions`` split count. Row i =
    (i, (i·A + C) mod M) — a pure function of i, so any split layout
    produces the same multiset.
    """

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_parts = int(options.get("partitions", 4))

    def partitions(self):
        step = (self.n + self.num_parts - 1) // self.num_parts
        return [
            InputPartition((lo, min(lo + step, self.n)))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, (i * _LCG_A + _LCG_C) % _LCG_M)


class SyntheticSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "graft_synth"

    def schema(self) -> str:
        return "id bigint, val bigint"

    def reader(self, schema):
        return SyntheticReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotent registration of the graft_synth format."""
    spark.dataSource.register(SyntheticSource)
