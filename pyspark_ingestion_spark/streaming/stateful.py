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

_STATE_SCHEMA = "n LONG, nv LONG, total DOUBLE"


def _update_user_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into (n, nv, total) state; emit running totals.

    ``nv`` counts NON-NULL values: pandas sums an all-NaN series to 0.0
    where ``F.sum`` yields NULL, so without it a key whose values are
    all NULL would emit 0.0 and break the documented parity with the
    batch groupBy."""
    n, nv, total = state.get if state.exists else (0, 0, 0.0)
    for pdf in batches:
        n += len(pdf)
        nv += int(pdf["value"].count())
        total += float(pdf["value"].sum())
    state.update((n, nv, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2) if nv else None],
        }
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


# -------------------------------------------- transformWithStateInPandas
#
# The Spark 4 successor API: a StatefulProcessor object with typed state
# handles (value/list/map state, timers, initial state, TTL) instead of
# one GroupState blob. ENV-GATED at runtime: the worker-side state
# server speaks protobuf, which this container lacks (`google.protobuf.
# descriptor` is absent), so the pipeline below launches and then fails
# at StreamingPythonRunner init. The implementation is complete and the
# test skips itself when the runtime dependency is missing — the same
# honesty contract as the multimodal codec gate.

def tws_runtime_available() -> bool:
    """True when the transformWithState worker runtime can start
    (protobuf present). Driver-side API import alone is NOT enough."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``running_user_totals`` re-expressed on transformWithStateInPandas:
    per-user (n_events, total_value) in a ValueState handle, emitted
    every micro-batch in Update mode.

    Semantically identical to the applyInPandasWithState form above
    (which remains the portable implementation); this one exists so the
    engine tracks the current API — TTL, timers, and list/map state
    compose from the same handle when needed.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n, nv, total = (
                self._state.get() if self._state.exists() else (0, 0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                nv += int(pdf["value"].count())
                total += float(pdf["value"].sum())
            self._state.update((n, nv, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2) if nv else None],
                }
            )

        def close(self) -> None:
            pass

    return events.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        _Totals(),
        outputStructType=USER_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
