"""Driver-local table construction via the Arrow path (r14).

A list-backed ``spark.createDataFrame(rows, schema)`` plans as a scan
over a pickled Python RDD: EVERY evaluation of the frame re-enters a
Python worker to deserialize the rows (measured ~0.4 s per evaluation
at local[32] even for a 16-row table), and the engine's small fitted
tables — KMeans centroids, PQ codebooks, BPE merge lists, tier maps —
are evaluated many times across joins, broadcasts and collects.
Routing the same rows through pandas + Arrow ships them to the JVM
once at construction time: the frame plans as a ``LocalTableScan``
(~10 ms per evaluation, zero Python workers). Guide §4 (eliminate the
JVM↔Python boundary) and §6 (Arrow for driver transfers).
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession

#: which construction path non-empty local_rows_df calls took, counted
#: per process (r15, ADVICE): a silent Arrow→pickled-list fallback (e.g.
#: a pandas/Arrow env issue) would quietly reintroduce ~2.8 s of source
#: cost inside the bench's timed stream batches and read as a framework
#: regression across rounds — the bench surfaces these counters in its
#: JSON so that drift is attributable.
PATH_COUNTS = {"arrow": 0, "fallback": 0}


def local_rows_df(
    spark: SparkSession,
    rows: Iterable[Sequence[Any]],
    schema,
) -> DataFrame:
    """Build a DataFrame from driver-side ``rows`` (tuples/Rows indexed
    positionally) so that evaluations stay JVM-resident.

    ``schema`` is a DDL string or ``StructType`` — exactly what
    ``spark.createDataFrame`` takes. Values are unchanged versus the
    list path (the call sites carry ints, floats, strings and
    float-array columns, all of which Arrow maps losslessly); any
    conversion gap falls back to the list path, identical in value and
    only slower to evaluate.
    """
    rows = list(rows)
    if not rows:
        # empty frames evaluate trivially; skip the Arrow plumbing
        return spark.createDataFrame(rows, schema)
    try:
        import pandas as pd
        from pyspark.sql.types import StructType

        st = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
        names = st.fieldNames()
        pdf = pd.DataFrame(
            {n: [r[i] for r in rows] for i, n in enumerate(names)},
            columns=list(names),
        )
        df = spark.createDataFrame(pdf, st)
        PATH_COUNTS["arrow"] += 1
        return df
    except Exception:
        PATH_COUNTS["fallback"] += 1
        return spark.createDataFrame(rows, schema)
