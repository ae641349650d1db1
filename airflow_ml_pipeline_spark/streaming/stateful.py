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


ANOMALY_OUT_SCHEMA = (
    "event_id long, event_type string, ts_us long, value double, z double"
)
ANOMALY_STATE_SCHEMA = "buf array<double>"


def _anomaly_zscores(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-event-type rolling-baseline anomaly scorer. State is the raw
    trailing value buffer (bounded at ANOMALY_BASELINE_ROWS); arithmetic
    REPLICATES the batch twin's lattice exactly — trailing values are
    quantized to DECIMAL(.,6) with HALF_UP (what Spark's decimal cast
    does to a double), summed exactly, converted to double, and the z
    expression/rounding mirror the batch plan — so an AvailableNow
    replay's emitted anomalies equal `events_anomaly_zscore` row-for-row
    and the same DuckDB oracle checks both."""
    import math
    from collections import deque
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    from airflow_ml_pipeline_spark.operators.events import (
        ANOMALY_BASELINE_ROWS,
        ANOMALY_MIN_BASELINE,
        ANOMALY_Z,
    )

    six = Decimal("0.000001")
    buf: list[float] = list(state.get[0]) if state.exists else []
    out: dict[str, list] = {k: [] for k in ("event_id", "event_type", "ts_us", "value", "z")}
    # ONE sort over the whole micro-batch: applyInPandasWithState delivers a
    # key's rows as multiple Arrow chunks in shuffle-arrival order, so
    # sorting each chunk independently would feed the rolling buffer out of
    # global time order whenever a batch spans >1 chunk (review finding)
    chunks = [p for p in pdfs if len(p)]
    batch = (
        pd.concat(chunks).sort_values(["ts_us", "event_id"])
        if chunks
        else pd.DataFrame()
    )
    with localcontext() as ctx:
        # the oracle/batch sums are DECIMAL(38,12)-exact; the default
        # Python context (28 sig digits) could round a large
        # sum-of-squares where Spark would not
        ctx.prec = 50
        # Decimal(repr(v)), NOT Decimal(v): Spark's double->decimal cast
        # (and F.round) quantize the SHORTEST decimal rendering
        # (BigDecimal.valueOf via Double.toString), not the exact binary
        # expansion — repr() is Python's shortest rendering, so this
        # walks the identical lattice (review finding; e.g. 5e-07:
        # valueOf->0.000001, exact-binary->0.000000).
        #
        # INCREMENTAL running sums (r16 opt, guide §4): the quantized
        # window values and their exact Decimal sum / sum-of-squares are
        # maintained across rows — append adds (q, q²), eviction
        # subtracts them. Decimal arithmetic at prec 50 is EXACT for
        # these bounded 6-dp values, and exact addition/subtraction is
        # order-independent, so the running sums are bit-identical to
        # the previous shape's from-scratch re-quantize + re-sum of the
        # whole buffer on EVERY row (O(rows × baseline) Decimal ops →
        # O(rows); equality pinned by the stream-equals-batch oracle and
        # tests/test_streaming.py).
        qs = deque(
            Decimal(repr(float(v))).quantize(six, ROUND_HALF_UP) for v in buf
        )
        s_dec = sum(qs, Decimal(0))
        ss_dec = sum((q * q for q in qs), Decimal(0))
        for r in batch.itertuples():
            n = len(qs)
            if n >= ANOMALY_MIN_BASELINE:
                s = float(s_dec)
                ss = float(ss_dec)
                nn = float(n)
                var = (ss - s * s / nn) / (nn - 1)
                if var > 0:
                    z = (r.value - s / nn) / math.sqrt(var)
                    if abs(z) > ANOMALY_Z:
                        out["event_id"].append(r.event_id)
                        out["event_type"].append(key[0])
                        out["ts_us"].append(r.ts_us)
                        out["value"].append(r.value)
                        out["z"].append(
                            float(
                                Decimal(repr(float(z))).quantize(
                                    six, ROUND_HALF_UP
                                )
                            )
                        )
            buf.append(float(r.value))
            q = Decimal(repr(float(r.value))).quantize(six, ROUND_HALF_UP)
            qs.append(q)
            s_dec += q
            ss_dec += q * q
            if len(qs) > ANOMALY_BASELINE_ROWS:
                q0 = qs.popleft()
                s_dec -= q0
                ss_dec -= q0 * q0
        if len(buf) > ANOMALY_BASELINE_ROWS:
            buf = buf[-ANOMALY_BASELINE_ROWS:]
    state.update((buf,))
    yield pd.DataFrame(out)


def anomaly_zscore_stream(stream: DataFrame) -> DataFrame:
    """Streaming anomaly detection: the `events_anomaly_zscore` batch
    plan as a per-key state machine. Event time rides as unix MICROS
    (integers are timezone-proof across the Arrow boundary); state per
    event_type is one bounded float buffer, so store size is
    O(types x baseline), independent of stream length."""
    from pyspark.sql import functions as F

    ev = stream.select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "value",
    )
    return ev.groupBy("event_type").applyInPandasWithState(
        _anomaly_zscores,
        outputStructType=ANOMALY_OUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Event-time-timeout sessionizer (round 11, VERDICT r10 ask #5): the third
# stateful state class — CUSTOM applyInPandasWithState state with an
# EventTimeTimeout timer — gets the same eviction-TIMING treatment the
# session_window and tumbling classes got in r10. A per-user gap
# sessionizer: state is the open session; it closes (emits) either when
# the timer fires (watermark passes last_event + gap with no new data) or
# when a new event arrives >= gap away (data-driven close, which Spark
# delivers INSTEAD of the timeout when both land in one batch).
# ---------------------------------------------------------------------------

SESSIONIZER_GAP_US = 1800 * 1000000  # 30-min gap, matching the session class

SESSIONIZER_OUT_SCHEMA = (
    "user_id long, session_start_us long, n_events long, session_value double"
)
SESSIONIZER_STATE_SCHEMA = "start_us long, last_us long, n long, total string"


def _gap_sessions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Incremental gap sessionizer. The session value sum replicates the
    SQL_DSUM lattice exactly (the anomaly-scorer recipe): each value is
    quantized to DECIMAL(.,6) via Decimal(repr(v)) — Spark/DuckDB's
    shortest-rendering HALF_UP — summed exactly (the running sum crosses
    micro-batches as a STRING in state, never as a float), and converted
    to double only at emission. Rows of a batch are concatenated and
    sorted ONCE (multi-chunk Arrow delivery is shuffle-ordered)."""
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    six = Decimal("0.000001")
    out: dict[str, list] = {
        k: []
        for k in ("user_id", "session_start_us", "n_events", "session_value")
    }

    def emit(start_us: int, n: int, total: "Decimal") -> None:
        out["user_id"].append(key[0])
        out["session_start_us"].append(start_us)
        out["n_events"].append(n)
        out["session_value"].append(float(total))

    with localcontext() as ctx:
        ctx.prec = 50  # match the DECIMAL(25,6)-exact engine sums
        if state.hasTimedOut:
            start, last, n, total = state.get
            emit(start, n, Decimal(total))
            state.remove()
            yield pd.DataFrame(out)
            return

        if state.exists:
            start, last, n, total = state.get
            tot = Decimal(total)
        else:
            start, last, n, tot = None, None, 0, Decimal(0)
        chunks = [p for p in pdfs if len(p)]
        batch = (
            pd.concat(chunks).sort_values(["ts_us", "event_id"])
            if chunks
            else pd.DataFrame()
        )
        for r in batch.itertuples():
            if last is not None and r.ts_us - last >= SESSIONIZER_GAP_US:
                emit(start, n, tot)  # data-driven close, this batch's id
                start, n, tot = None, 0, Decimal(0)
            if start is None:
                start = int(r.ts_us)
            n += 1
            tot += Decimal(repr(float(r.value))).quantize(six, ROUND_HALF_UP)
            last = int(r.ts_us)
        # ADVICE r11 guard: Spark only invokes this fn with data or a
        # fired timer, but an empty delivery with no prior state would
        # leave last=None — update/arm only when a session is open. The
        # timer target is always > the current watermark here because
        # every batch's events arrive time-sliced ahead of the watermark
        # (the ingest harness's invariant), so setTimeoutTimestamp can't
        # throw its "timeout <= watermark" analyzer error.
        if last is not None:
            state.update((start, last, n, str(tot)))
            # ms floor: the GroupState timer API is millisecond-grained;
            # the oracle models exactly this floor ((last_us + gap) // 1000)
            state.setTimeoutTimestamp((last + SESSIONIZER_GAP_US) // 1000)
    yield pd.DataFrame(out)


def gap_sessions(stream: DataFrame) -> DataFrame:
    """Per-user custom sessionization with event-time timeout eviction.
    ``stream`` must carry (user_id, event_id, ts, value); the watermark
    is applied here (EventTimeTimeout requires one) and event time rides
    into the state machine as unix MICROS (tz-proof integers)."""
    from pyspark.sql import functions as F

    # ts stays in the projection: event-time timeout requires the
    # watermarked ATTRIBUTE to reach the stateful operator's input (the
    # analyzer checks the child's output, not the plan's history); the
    # state machine itself reads only the tz-proof ts_us integers
    ev = stream.withWatermark("ts", "30 minutes").select(
        "user_id",
        "event_id",
        "ts",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "value",
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _gap_sessions,
        outputStructType=SESSIONIZER_OUT_SCHEMA,
        stateStructType=SESSIONIZER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
