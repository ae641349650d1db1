"""O4/O5 scheduler contract tests — cron math, retry policy, catchup=False
tick semantics (reference dags/ml_pipeline_dag.py:24-31,237). Pure driver
logic; no Spark session needed."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from airflow_ml_pipeline_spark.plans.schedule import (
    RetryPolicy,
    ScheduledPipeline,
    next_run,
    parse_cron,
    run_with_retries,
)


# --- cron ---------------------------------------------------------------------


def test_reference_schedule_sunday_2am():
    # reference DAG: "0 2 * * 0" — every Sunday 02:00 UTC
    got = next_run("0 2 * * 0", datetime(2024, 1, 3, 12, 0))  # a Wednesday
    assert got == datetime(2024, 1, 7, 2, 0)
    assert got.weekday() == 6  # python Sunday
    # strictly-after: asked AT the fire time, next week comes back
    assert next_run("0 2 * * 0", got) == datetime(2024, 1, 14, 2, 0)


def test_cron_every_minute_and_steps():
    assert next_run("* * * * *", datetime(2024, 6, 1, 10, 30, 45)) == datetime(
        2024, 6, 1, 10, 31
    )
    assert next_run("*/15 * * * *", datetime(2024, 6, 1, 10, 31)) == datetime(
        2024, 6, 1, 10, 45
    )


def test_cron_lists_ranges_and_month_rollover():
    assert next_run("0 9-17 * * 1-5", datetime(2024, 1, 5, 18, 0)) == datetime(
        2024, 1, 8, 9, 0
    )  # Friday evening -> Monday 09:00
    assert next_run("30 6 1 * *", datetime(2024, 1, 15, 0, 0)) == datetime(
        2024, 2, 1, 6, 30
    )
    assert next_run("0 0 29 2 *", datetime(2023, 3, 1, 0, 0)) == datetime(
        2024, 2, 29, 0, 0
    )  # leap-day only fires in leap years


def test_cron_dom_dow_or_combination():
    # both restricted -> OR (crontab(5)): fires on the 13th AND on Fridays
    got = next_run("0 0 13 * 5", datetime(2024, 9, 10, 0, 0))
    assert got == datetime(2024, 9, 13, 0, 0)  # a Friday AND the 13th
    got2 = next_run("0 0 13 * 5", got)
    assert got2 == datetime(2024, 9, 20, 0, 0)  # next Friday, not next 13th


def test_cron_sunday_alias_7():
    assert parse_cron("0 0 * * 7")[4] == {0}


def test_cron_rejects_malformed():
    with pytest.raises(ValueError):
        parse_cron("0 2 * *")  # 4 fields
    with pytest.raises(ValueError):
        parse_cron("0 25 * * *")  # hour out of range
    with pytest.raises(ValueError):
        parse_cron("*/0 * * * *")  # zero step


# --- retry policy -------------------------------------------------------------


def test_retry_succeeds_after_failures_with_reference_delay():
    calls, sleeps = [], []
    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise RuntimeError("transient")
        return {"success": True}

    policy = RetryPolicy()  # reference defaults: retries=1, delay=5min
    out = run_with_retries(flaky, policy, sleeper=sleeps.append)
    assert out == {"success": True}
    assert len(calls) == 2
    assert sleeps == [300.0]


def test_retry_exhaustion_reraises():
    sleeps = []
    def always_fails():
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        run_with_retries(
            always_fails, RetryPolicy(retries=2), sleeper=sleeps.append
        )
    assert len(sleeps) == 2  # slept before each retry, not after the last


def test_retry_exponential_backoff():
    p = RetryPolicy(retries=3, retry_delay=timedelta(seconds=10),
                    exponential_backoff=True)
    assert [p.delay_before(i).total_seconds() for i in (1, 2, 3)] == [
        10.0, 20.0, 40.0,
    ]


# --- scheduled pipeline (catchup=False) --------------------------------------


def test_tick_fires_once_for_backlog():
    runs = []
    sp = ScheduledPipeline(
        cron="0 2 * * 0",
        runner=lambda: runs.append(1) or {"success": True},
        sleeper=lambda s: None,
    )
    sp.last_checked = datetime(2024, 1, 1, 0, 0)
    # three Sundays elapsed unchecked -> exactly ONE run (catchup=False)
    out = sp.tick(datetime(2024, 1, 22, 12, 0))
    assert out == {"success": True}
    assert runs == [1]
    # immediately after, nothing is due
    assert sp.tick(datetime(2024, 1, 22, 12, 5)) is None


def test_tick_retries_through_policy():
    attempts = []
    def flaky():
        attempts.append(1)
        if len(attempts) < 2:
            raise RuntimeError("transient")
        return {"success": True}

    sp = ScheduledPipeline(
        cron="* * * * *", runner=flaky, sleeper=lambda s: None
    )
    sp.last_checked = datetime(2024, 1, 1, 0, 0)
    assert sp.tick(datetime(2024, 1, 1, 0, 5)) == {"success": True}
    assert len(attempts) == 2
