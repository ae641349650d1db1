"""O4/O5 — schedule + retry policy for the pipeline runner.

Reference parity: dags/ml_pipeline_dag.py:24-31 (default_args: retries=1,
retry_delay=5min) and :237 (schedule="0 2 * * 0", catchup=False). The
reference delegates these to Airflow's scheduler; this module provides the
same contract as a dependency-free driver-side control plane, because on a
Spark deployment the scheduler is control flow — the scheduled work itself
is Spark jobs, and nothing about cron math or retry/backoff belongs on
executors.

- ``next_run(cron, after)``: 5-field cron (min hour dom mon dow) next-fire
  computation supporting ``*``, numbers, lists, ranges and ``*/step``.
  Day-of-month and day-of-week combine with OR when both are restricted —
  the standard (and Airflow's) crontab semantics.
- ``RetryPolicy`` / ``run_with_retries``: Airflow-style task retry with a
  fixed delay (the reference uses retries=1, delay=5min) and optional
  exponential backoff; the sleeper is injectable so tests run instantly.
- ``ScheduledPipeline``: ties both to ``plans.pipeline.run_pipeline`` with
  catchup=False semantics (a late tick runs ONCE for the latest missed
  fire, never replays the backlog).
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Callable

_FIELD_RANGES = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    """One cron field -> the set of matching values. dow: 7 == 0 (Sunday)."""
    vals: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"cron step must be positive: {spec}")
        if part == "*":
            lo_p, hi_p = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo_p, hi_p = int(a), int(b)
        else:
            lo_p = hi_p = int(part)
        if not (lo <= lo_p <= hi and lo <= hi_p <= hi):
            # dow 7 is an accepted alias for Sunday
            if (lo, hi) == (0, 6) and hi_p == 7:
                vals.add(0)
                hi_p = 6
            else:
                raise ValueError(f"cron field out of range [{lo},{hi}]: {spec}")
        vals.update(range(lo_p, hi_p + 1, step))
    return vals


def parse_cron(expr: str) -> list[set[int]]:
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"expected 5 cron fields, got {len(fields)}: {expr!r}")
    return [
        _parse_field(f, lo, hi) for f, (lo, hi) in zip(fields, _FIELD_RANGES)
    ]


def next_run(expr: str, after: datetime) -> datetime:
    """First fire time STRICTLY after ``after`` (minute resolution).

    dom/dow OR-combine when both are restricted (crontab(5) / Airflow
    semantics); otherwise the restricted one governs."""
    minute, hour, dom, mon, dow = parse_cron(expr)
    dom_star = dom == set(range(1, 32))
    dow_star = dow == set(range(0, 7))
    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    for _ in range(366 * 24 * 60):  # a year of minutes bounds any 5-field cron
        # cron dow: Sunday=0; python weekday(): Monday=0
        cron_dow = (t.weekday() + 1) % 7
        day_ok = (
            (t.day in dom or cron_dow in dow)
            if not dom_star and not dow_star
            else (t.day in dom and cron_dow in dow)
        )
        if t.month in mon and day_ok and t.hour in hour and t.minute in minute:
            return t
        t += timedelta(minutes=1)
    raise ValueError(f"no fire time within a year for {expr!r}")


@dataclass
class RetryPolicy:
    """Airflow default_args parity: retries + retry_delay (+ optional
    exponential backoff, Airflow's retry_exponential_backoff)."""

    retries: int = 1
    retry_delay: timedelta = timedelta(minutes=5)
    exponential_backoff: bool = False

    def delay_before(self, attempt: int) -> timedelta:
        """Delay before retry ``attempt`` (1-based)."""
        if self.exponential_backoff:
            return self.retry_delay * (2 ** (attempt - 1))
        return self.retry_delay


def run_with_retries(
    fn: Callable[[], dict],
    policy: RetryPolicy,
    sleeper: Callable[[float], None] = _time.sleep,
    on_retry: Callable[[int, Exception], None] | None = None,
) -> dict:
    """Run ``fn``; on exception retry up to ``policy.retries`` times with
    the policy's delay. The last failure re-raises (Airflow marks the task
    failed after retries are exhausted)."""
    attempt = 0
    while True:
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - retry-any mirrors Airflow
            attempt += 1
            if attempt > policy.retries:
                raise
            if on_retry is not None:
                on_retry(attempt, e)
            sleeper(policy.delay_before(attempt).total_seconds())


@dataclass
class ScheduledPipeline:
    """The reference DAG's schedule contract on the Spark runner.

    ``tick(now)`` fires at most one run: the latest cron fire in
    (last_checked, now] — catchup=False semantics, a backlog of missed
    fires collapses to one run. Returns the run result or None."""

    cron: str = "0 2 * * 0"  # reference: every Sunday 02:00 UTC
    policy: RetryPolicy = field(default_factory=RetryPolicy)
    runner: Callable[[], dict] | None = None
    last_checked: datetime | None = None
    sleeper: Callable[[float], None] = _time.sleep

    def due_at(self, now: datetime) -> datetime | None:
        """Latest fire in (last_checked, now], else None."""
        since = self.last_checked or now - timedelta(minutes=1)
        fire, latest = since, None
        while True:
            fire = next_run(self.cron, fire)
            if fire > now:
                return latest
            latest = fire

    def tick(self, now: datetime) -> dict | None:
        due = self.due_at(now)
        self.last_checked = now
        if due is None or self.runner is None:
            return None
        return run_with_retries(self.runner, self.policy, sleeper=self.sleeper)
