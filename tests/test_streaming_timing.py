"""Watermark-eviction timing contract (stream_session_eviction_timing).

The driver oracle restates Spark's eviction rule (watermark in batch b =
max event time of slices < b minus delay; emit when wm strictly passes
session end). These tests pin the preconditions that make that
restatement exact on the committed corpora, so a corpus regeneration or
a rule change fails HERE with a named reason instead of as an opaque
driver hash mismatch.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from airflow_ml_pipeline_spark.streaming.ingest import (
    SESSION_GAP_US,
    SESSION_N_SLICES,
    SESSION_WM_US,
    stream_session_eviction_timing,
)


def _sessions_and_wm(sf_dir: str):
    """(session end_us list, wm_us by batch) from the oracle-side SQL."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    ends = [
        r[0]
        for r in con.execute(f"""
        WITH seq AS (
            SELECT user_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             >= {SESSION_GAP_US}
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        tagged AS (
            SELECT user_id, ts,
                   SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM seq
        )
        SELECT MAX(epoch_us(ts)) + {SESSION_GAP_US}
        FROM tagged GROUP BY user_id, sid
        """).fetchall()
    ]
    wm = dict(
        con.execute(f"""
        WITH bounds AS (
            SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
            FROM events
        )
        SELECT ((epoch_us(ts) - mn) * {SESSION_N_SLICES}) // (mx - mn + 1)
                   + 1 AS b,
               MAX(epoch_us(ts)) - {SESSION_WM_US} AS wm_us
        FROM events CROSS JOIN bounds
        GROUP BY 1
        """).fetchall()
    )
    return ends, wm


def test_no_watermark_session_end_ties(sf_dir):
    """The oracle encodes Spark's eviction as STRICT wm > session_end.
    The strictness only matters on exact microsecond ties wm == end —
    assert the corpus has none, so the hash-green evidence genuinely
    witnesses the rule rather than riding on an untested boundary."""
    ends, wm = _sessions_and_wm(sf_dir)
    ties = [(e, b) for e in ends for b, w in wm.items() if e == w]
    assert ties == []


def test_emissions_cover_every_batch_and_tail_is_absent(spark, sf_dir):
    """The timing matrix is nontrivial: every batch 1..K emits sessions
    (K = the trailing no-data batch — skipping it would lose rows), no
    session claims batch 0 (the watermark is unset), and the corpus's
    undecided tail (sessions the final watermark never passes) is
    absent from the output."""
    out = stream_session_eviction_timing(spark, sf_dir)
    dist = {
        r.emitted_batch: r.c
        for r in out.groupBy("emitted_batch").agg(F.count("*").alias("c")).collect()
    }
    assert 0 not in dist
    for b in range(1, SESSION_N_SLICES + 1):
        assert dist.get(b, 0) > 0, f"batch {b} emitted nothing"
    ends, wm = _sessions_and_wm(sf_dir)
    final_wm = max(wm.values())
    undecided = [e for e in ends if e >= final_wm]
    assert len(undecided) > 0, "corpus has no undecided tail to witness"
    assert sum(dist.values()) == len(ends) - len(undecided)


def test_tumbling_emissions_cover_batches_and_tail_absent(spark, sf_dir):
    """The windowed-aggregation state class (companion test): every
    batch from the first watermark advance through the trailing no-data
    batch emits windows, batch 0 emits nothing, and windows past the
    final watermark are absent — total output rows = global (hour,
    event_type) groups whose end the final watermark passed."""
    import duckdb
    from airflow_ml_pipeline_spark.streaming.ingest import (
        stream_tumbling_eviction_timing,
    )

    out = stream_tumbling_eviction_timing(spark, sf_dir)
    dist = {
        r.emitted_batch: r.c
        for r in out.groupBy("emitted_batch").agg(F.count("*").alias("c")).collect()
    }
    assert 0 not in dist
    for b in range(1, SESSION_N_SLICES + 1):
        assert dist.get(b, 0) > 0, f"batch {b} emitted nothing"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    total, decided = con.execute(f"""
        WITH bounds AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
        agg AS (
            SELECT date_trunc('hour', ts) AS ws, event_type,
                   epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR) AS e
            FROM events GROUP BY 1, 2
        )
        SELECT COUNT(*),
               SUM(CASE WHEN e < (SELECT mx - {SESSION_WM_US} FROM bounds)
                        THEN 1 ELSE 0 END)
        FROM agg
    """).fetchone()
    assert sum(dist.values()) == decided
    assert decided < total, "corpus has no undecided window tail to witness"


def _stateful_sessions_and_wm(sf_dir: str):
    """(per-session (timeout_ms, next_slice) rows, wm_ms by batch) from
    the custom-state oracle's SQL building blocks."""
    from airflow_ml_pipeline_spark.streaming.stateful import SESSIONIZER_GAP_US

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    sessions = con.execute(f"""
        WITH bounds AS (
            SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
            FROM events
        ),
        sliced AS (
            SELECT e.user_id, e.event_id, e.ts,
                   ((epoch_us(e.ts) - b.mn) * {SESSION_N_SLICES})
                       // (b.mx - b.mn + 1) AS slice
            FROM events e CROSS JOIN bounds b
        ),
        seq AS (
            SELECT user_id, ts, slice,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             >= {SESSIONIZER_GAP_US}
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns
            FROM sliced
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        tagged AS (
            SELECT user_id, ts, slice,
                   SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM seq
        ),
        sess AS (
            SELECT user_id, sid,
                   (MAX(epoch_us(ts)) + {SESSIONIZER_GAP_US}) // 1000
                       AS timeout_ms,
                   MIN(slice) AS first_slice
            FROM tagged GROUP BY user_id, sid
        )
        SELECT timeout_ms,
               LEAD(first_slice) OVER (PARTITION BY user_id ORDER BY sid)
                   AS next_slice
        FROM sess
    """).fetchall()
    wm = dict(
        con.execute(f"""
        WITH bounds AS (
            SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
            FROM events
        )
        SELECT ((epoch_us(ts) - mn) * {SESSION_N_SLICES}) // (mx - mn + 1)
                   + 1 AS b,
               (MAX(epoch_us(ts)) // 1000) - {SESSION_WM_US // 1000} AS wm_ms
        FROM events CROSS JOIN bounds
        GROUP BY 1
        """).fetchall()
    )
    return sessions, wm


def test_no_timer_watermark_ms_ties(sf_dir):
    """GroupState timers are ms-grained; the oracle encodes Spark's
    ``timeoutTimestamp < watermark`` as strict wm_ms > timeout_ms.
    Strictness only matters on exact millisecond ties — assert the
    corpus has none, so the hash evidence witnesses the rule."""
    sessions, wm = _stateful_sessions_and_wm(sf_dir)
    ties = [
        (t, b) for (t, _) in sessions for b, w in wm.items() if t == w
    ]
    assert ties == []


def test_stateful_eviction_exercises_both_close_paths(spark, sf_dir):
    """The custom-state timing matrix is nontrivial: the trailing
    no-data batch K emits sessions (those are TIMER closes by
    construction — batch K has no data), at least one session closes on
    the DATA path strictly before its timer would have fired, and the
    undecided tail (no successor data, final watermark short) is
    absent."""
    from airflow_ml_pipeline_spark.streaming.ingest import (
        stream_stateful_eviction_timing,
    )

    out = stream_stateful_eviction_timing(spark, sf_dir)
    dist = {
        r.emitted_batch: r.c
        for r in out.groupBy("emitted_batch").agg(F.count("*").alias("c")).collect()
    }
    # batch K (trailing, NO data by construction) emitting anything
    # proves the TIMER path fires; batch-0 emissions are necessarily
    # DATA closes (the watermark is unset in batch 0 — unlike the
    # session_window class, the custom machine can close on arrival)
    assert dist.get(SESSION_N_SLICES, 0) > 0, "no timer closes in batch K"

    sessions, wm = _stateful_sessions_and_wm(sf_dir)
    BIG = 1 << 30
    expected: dict[int, int] = {}
    timer_first = data_first = undecided = 0
    for timeout_ms, next_slice in sessions:
        timer_b = min((b for b, w in wm.items() if w > timeout_ms), default=BIG)
        data_b = next_slice if next_slice is not None else BIG
        if timer_b == BIG and data_b == BIG:
            undecided += 1
            continue
        if data_b < timer_b:
            data_first += 1
        else:
            timer_first += 1
        b = min(timer_b, data_b)
        expected[b] = expected.get(b, 0) + 1
    assert timer_first > 0 and data_first > 0, (timer_first, data_first)
    assert undecided > 0, "corpus has no undecided tail to witness"
    # full per-batch distribution parity, not just the total
    assert dist == expected


# ---------------------------------------------------------------------------
# dropDuplicatesWithinWatermark eviction timing (VERDICT r11 ask #4)
# ---------------------------------------------------------------------------


def _ddww_replay(spark, tmp_path, slices, delay="10 seconds"):
    """Replay engineered (key, ts_us) slices through
    dropDuplicatesWithinWatermark and return {batch: {(key, us)}}."""
    import os
    import time

    B = 1_700_000_000_000_000
    arr = str(tmp_path / "arrivals")
    os.makedirs(arr)
    t0 = time.time() - 3600
    for i, rows in enumerate(slices):
        df = (
            spark.createDataFrame(
                [(k, t + B) for k, t in rows], "key string, us long"
            )
            .withColumn("ts", F.timestamp_micros("us"))
            .select("key", "ts")
        )
        tmp = str(tmp_path / f".b{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(arr, f"slice_{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (t0 + i, t0 + i))
    schema = spark.read.parquet(os.path.join(arr, "slice_0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(arr)
    )
    out = stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["key"]
    )
    seen: dict[int, set] = {}

    def sink(df, bid):
        seen[bid] = {
            (r["key"], r["us"]) for r in df.withColumn(
                "us", F.unix_micros("ts") - B
            ).collect()
        }

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {b: s for b, s in seen.items() if s}


def test_ddww_eviction_semantics_probe(spark, tmp_path):
    """The four facts the dedup-timing oracle encodes, each planted so a
    Spark behavior change (or a wrong restatement) flips an assertion:

    slice maxima: 5s, 20.000999s, 21s, 41s, 61s; delay 10s. Eviction
    threshold visible to batch b = floor-ms(max over slices <= b-2) -
    10s, non-strict, against microsecond-precision expiry = emitted ts +
    10s, never extended by dropped duplicates."""
    S = 1_000_000
    slices = [
        # kEq expiry = 10.000000s; kUs expiry = 10.000500s; kExt first
        # at 0, duplicate at 8s (would extend to 18s if extension
        # existed); pace rows pin each slice's max event time.
        [("kEq", 0), ("kUs", 500), ("kExt", 0), ("pace", 5 * S)],
        [("kExt", 8 * S), ("pace", 20 * S + 999)],
        # batch 2: threshold = floor(5s) - 10s < 0 -> ALL still blocked
        [("kEq", 21 * S), ("kUs", 21 * S + 1), ("kExt", 21 * S + 2),
         ("pace", 22 * S)],
        # batch 3: threshold = floor-ms(20.000999s) - 10s = 10.000s:
        #   kEq 10.000000 <= 10.000 evicts (NON-STRICT at equality)
        #   kUs 10.000500 >  10.000 survives (microsecond precision +
        #     ms-FLOOR of the watermark; unfloored 10.000999 would evict)
        #   kExt 10.000000 evicts (the 8s duplicate did NOT extend)
        [("kEq", 40 * S), ("kUs", 40 * S + 1), ("kExt", 40 * S + 2),
         ("pace", 41 * S)],
        # batch 4: threshold = floor(22s) - 10s = 12s: kUs evicts now
        [("kUs", 60 * S + 1), ("kEq", 60 * S), ("pace", 61 * S)],
    ]
    out = _ddww_replay(spark, tmp_path, slices)
    emitted = {
        (k, b) for b, rows in out.items() for (k, _us) in rows
    }
    # batch 0: every key is first-seen
    assert {("kEq", 0), ("kUs", 0), ("kExt", 0), ("pace", 0)} <= emitted
    # batch 2: nothing re-admitted (threshold below every expiry)
    assert not [k for (k, b) in emitted if b == 2 and k != "pace"]
    # batch 3: non-strict equality eviction + no-extension
    assert ("kEq", 3) in emitted
    assert ("kExt", 3) in emitted
    # batch 3: microsecond expiry survives the ms-floored watermark
    assert ("kUs", 3) not in emitted
    # batch 4: the 500us straggler is re-admitted one batch later, and
    # kEq (re-emitted at 40s, expiry 50s > 12s) stays blocked — the
    # reset-on-emission fact
    assert ("kUs", 4) in emitted
    assert ("kEq", 4) not in emitted


def test_dedup_timing_fixture_exercises_the_boundary(sf_dir):
    """The corpus-level timing signal is nontrivial at every shipped SF:
    (a) every slice is non-empty (batch mapping = slice mapping), (b)
    some key's emission blocks a j+2 arrival (trailing-2-delay zone) AND
    some key re-admits at j+2 — i.e. the eviction boundary genuinely
    cuts through the corpus rather than all keys landing on one side."""
    from airflow_ml_pipeline_spark.streaming.ingest import (
        DEDUP_N_SLICES,
        DEDUP_WM_MS,
        DEDUP_WM_US,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    K = DEDUP_N_SLICES
    rows = con.execute(f"""
    WITH bounds AS (
        SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
    ),
    arr0 AS (
        SELECT user_id, event_type, event_id, ts,
               ((epoch_us(ts) - b.mn) * {K}) // (b.mx - b.mn + 1) AS slice
        FROM events CROSS JOIN bounds b
    ),
    arr AS (
        SELECT * FROM (SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type, slice
            ORDER BY ts, event_id) rn FROM arr0) WHERE rn = 1
    ),
    smax AS (SELECT slice, MAX(epoch_us(ts)) mx_us FROM arr GROUP BY slice),
    -- per-key consecutive (slice j emission-candidate, j+2 arrival):
    -- the j+1 arrival is ALWAYS blocked (threshold lag), so the j+2
    -- boundary is where the signal lives
    pairs AS (
        SELECT a.user_id, a.event_type,
               epoch_us(a.ts) + {DEDUP_WM_US} AS expiry_us,
               ((s.mx_us // 1000) - {DEDUP_WM_MS}) * 1000 AS thr_us
        FROM arr a JOIN smax s ON s.slice = a.slice
        JOIN arr nxt ON nxt.user_id = a.user_id
                    AND nxt.event_type = a.event_type
                    AND nxt.slice = a.slice + 2
    )
    SELECT COUNT(*) FILTER (WHERE expiry_us > thr_us)  AS blocked,
           COUNT(*) FILTER (WHERE expiry_us <= thr_us) AS evicted,
           (SELECT COUNT(DISTINCT slice) FROM arr)      AS n_slices
    FROM pairs
    """).fetchone()
    blocked, evicted, n_slices = rows
    assert n_slices == K, f"expected {K} non-empty slices, got {n_slices}"
    assert blocked > 0, "no j+2 arrival falls inside the 2-delay zone"
    assert evicted > 0, "no j+2 arrival is past the eviction threshold"
