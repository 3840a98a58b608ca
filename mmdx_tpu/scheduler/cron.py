"""In-process periodic scheduler — the Celery-beat-equivalent capability.

The reference carries a vestigial Celery/Redis setup (compiled-only
``backend/backend/__pycache__/celery.*.pyc`` + ``api/__pycache__/tasks.*.pyc``
wiring daily feature/training tasks; SURVEY §2.3).  This scheduler provides the
same capability without a broker: named jobs on fixed intervals, run in a
daemon thread, with failure isolation and run history.

    sched = PeriodicScheduler()
    sched.add_job("daily_features", 24 * 3600, run_daily_feature_pipeline)
    sched.start()
"""
from __future__ import annotations

import threading
import time
import traceback
from dataclasses import dataclass, field
from typing import Callable


@dataclass
class Job:
    name: str
    interval_s: float
    fn: Callable[[], None]
    next_run: float = 0.0
    runs: int = 0
    failures: int = 0
    last_error: str | None = None


@dataclass
class PeriodicScheduler:
    jobs: dict[str, Job] = field(default_factory=dict)
    poll_s: float = 1.0
    _stop: threading.Event = field(default_factory=threading.Event)
    _thread: threading.Thread | None = None

    def add_job(self, name: str, interval_s: float, fn: Callable[[], None],
                run_immediately: bool = False) -> Job:
        job = Job(name=name, interval_s=interval_s, fn=fn,
                  next_run=time.time() if run_immediately else time.time() + interval_s)
        self.jobs[name] = job
        return job

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
                except Exception as e:  # failure isolation: job errors don't kill the loop
                    job.failures += 1
                    job.last_error = f"{e}\n{traceback.format_exc()}"
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
