"""In-process periodic scheduler — the Celery-beat-equivalent capability.

The reference carries a vestigial Celery/Redis setup (compiled-only
``backend/backend/__pycache__/celery.*.pyc`` + ``api/__pycache__/tasks.*.pyc``
wiring daily feature/training tasks; SURVEY §2.3).  This scheduler provides the
same capability without a broker: named jobs on fixed intervals, run in a
daemon thread, with failure isolation and run history.

    sched = PeriodicScheduler()
    sched.add_job("daily_features", 24 * 3600, run_daily_feature_pipeline)
    sched.start()

Run outcomes fire pluggable ``on_failure`` / ``on_success`` notifiers (the
reference's Celery tasks wire ``send_mail`` into the daily pipelines —
bytecode-only ``api/__pycache__/tasks.cpython-311.pyc``; see
``scheduler/notify.py`` for the built-in log/webhook/email notifiers).
"""
from __future__ import annotations

import sys
import threading
import time
import traceback
from dataclasses import dataclass, field
from typing import Callable

from mmdx_tpu.scheduler.notify import Notifier, log_notifier, make_event


@dataclass
class Job:
    name: str
    interval_s: float
    fn: Callable[[], None]
    next_run: float = 0.0
    runs: int = 0
    failures: int = 0
    last_error: str | None = None
    on_failure: Notifier | None = None  # falls back to the scheduler's
    on_success: Notifier | None = None


@dataclass
class PeriodicScheduler:
    jobs: dict[str, Job] = field(default_factory=dict)
    poll_s: float = 1.0
    on_failure: Notifier = log_notifier
    on_success: Notifier | None = None  # default: successes are quiet
    _stop: threading.Event = field(default_factory=threading.Event)
    _thread: threading.Thread | None = None

    def add_job(self, name: str, interval_s: float, fn: Callable[[], None],
                run_immediately: bool = False,
                on_failure: Notifier | None = None,
                on_success: Notifier | None = None) -> Job:
        job = Job(name=name, interval_s=interval_s, fn=fn,
                  next_run=time.time() if run_immediately else time.time() + interval_s,
                  on_failure=on_failure, on_success=on_success)
        self.jobs[name] = job
        return job

    def _notify(self, hook: Notifier | None, job: Job, status: str) -> None:
        if hook is None:
            return
        try:
            hook(make_event(job.name, status, runs=job.runs,
                            failures=job.failures, error=job.last_error))
        except Exception as e:  # a dead mail relay must not kill the loop
            print(f"[mmdx-scheduler] notifier for {job.name} failed: {e}",
                  file=sys.stderr)

    def _tick(self, now: float | None = None) -> list[str]:
        """Run all due jobs once; returns the names that ran (tests call this
        directly for determinism)."""
        now = now if now is not None else time.time()
        ran = []
        for job in list(self.jobs.values()):
            if now >= job.next_run:
                job.next_run = now + job.interval_s
                job.runs += 1
                try:
                    job.fn()
                    job.last_error = None
                    self._notify(job.on_success or self.on_success, job, "ok")
                except Exception as e:  # failure isolation: job errors don't kill the loop
                    job.failures += 1
                    job.last_error = f"{e}\n{traceback.format_exc()}"
                    self._notify(job.on_failure or self.on_failure, job, "failed")
                ran.append(job.name)
        return ran

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def loop():
            while not self._stop.is_set():
                self._tick()
                self._stop.wait(self.poll_s)

        self._thread = threading.Thread(target=loop, daemon=True, name="mmdx-scheduler")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None


def default_daily_schedule() -> PeriodicScheduler:
    """Daily feature + training pipelines (the reference's Celery-beat intent)."""
    from mmdx_tpu.scheduler.commands import (
        run_daily_feature_pipeline,
        run_daily_training_pipeline,
    )

    sched = PeriodicScheduler()
    sched.add_job("daily_feature_pipeline", 24 * 3600, run_daily_feature_pipeline)
    sched.add_job("daily_training_pipeline", 24 * 3600, run_daily_training_pipeline)
    return sched
