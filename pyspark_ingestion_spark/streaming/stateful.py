"""Custom stateful streaming operators — ``applyInPandasWithState``.

The escape hatch for stateful semantics Spark's built-in windowed
aggregations can't express (per-key accumulators, custom eviction,
cross-batch counters). State lives in the state store (checkpointed,
partitioned by key) — nothing accumulates on the driver, so the shape
scales to arbitrarily many keys.

Batches arrive per key-group as Arrow pandas frames; the reference's
only stateful construct was a driver-side JSON watermark file
(reference ingestion/ingestion.py:143-164) — this is its distributed,
per-key generalization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

#: output schema of running_user_totals
USER_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "n LONG, total DOUBLE"


def _update_user_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into (n, total) state; emit the running totals."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum-of-value) maintained in the state store.

    Each micro-batch updates the key's state and emits the new running
    totals — update-mode output. On a static source processed in one
    AvailableNow batch the emitted rows equal the batch groupBy, which
    is what the oracle checks; across live micro-batches the same code
    yields the incremental view the reference's watermark loop
    approximated.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=USER_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
