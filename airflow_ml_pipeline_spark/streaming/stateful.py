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
