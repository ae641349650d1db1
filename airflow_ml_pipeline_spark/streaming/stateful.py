"""Custom stateful streaming operator via applyInPandasWithState (north-star
requirement: arbitrary per-key state machines that windowed aggregates can't
express).

The demonstrator keeps per-user running (count, total, max) state across
micro-batches and emits the updated snapshot each batch. With an
AvailableNow replay the final emitted snapshot per user equals the batch
aggregate — which is exactly how the declared query is oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
STATE_SCHEMA = "n long, total double, mx double"


def _running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [mx],
        }
    )


def user_running_totals(stream: DataFrame) -> DataFrame:
    """Per-user stateful running totals. State lives in the state store
    (checkpointed, partitioned by user) — memory stays bounded by key
    cardinality, not event count."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_running_totals_tws(stream: DataFrame) -> DataFrame:
    """Same per-user running-totals state machine on the Spark 4
    ``transformWithStateInPandas`` API (the successor to
    applyInPandasWithState): typed ValueState handles, explicit processor
    lifecycle (init/handleInputRows/close), composable timers. Kept
    alongside the legacy operator so both stateful surfaces stay covered.

    Requires a working ``google.protobuf`` (the TWS driver worker speaks
    protobuf to the JVM); this container ships a broken protobuf, so the
    operator is exercised by a skip-gated test rather than a declared
    query (tests/test_streaming.py::test_transform_with_state_totals).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
            if self._totals.exists():
                n, total, mx = self._totals.get()
            else:
                n, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._totals.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
