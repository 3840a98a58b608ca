"""Wall-clock daily scheduling (Celery-beat semantics): "at HH:MM" jobs,
missed-run catch-up across restarts, persisted run history. All tests drive
``_tick(now=...)`` with simulated clocks — no sleeping, no threads."""
import json
from datetime import datetime, timedelta

import pytest

from mmdx_tpu.scheduler.cron import (
    PeriodicScheduler,
    RunHistory,
    next_occurrence,
    prev_occurrence,
)


def ts(day_offset=0, hour=0, minute=0):
    base = datetime(2026, 3, 10) + timedelta(days=day_offset)
    return base.replace(hour=hour, minute=minute).timestamp()


def test_occurrence_math():
    # before today's 02:00 -> today's 02:00; after -> tomorrow's
    assert next_occurrence("02:00", ts(hour=1)) == ts(hour=2)
    assert next_occurrence("02:00", ts(hour=3)) == ts(day_offset=1, hour=2)
    # exactly at 02:00 -> strictly after
    assert next_occurrence("02:00", ts(hour=2)) == ts(day_offset=1, hour=2)
    assert prev_occurrence("02:00", ts(hour=3)) == ts(hour=2)
    assert prev_occurrence("02:00", ts(hour=1)) == ts(day_offset=-1, hour=2)
    with pytest.raises(ValueError, match="HH:MM"):
        next_occurrence("25:00", ts())
    with pytest.raises(ValueError, match="HH:MM"):
        next_occurrence("2am", ts())


def test_daily_job_fires_at_wallclock_and_reanchors():
    runs = []
    sched = PeriodicScheduler()
    sched.add_daily_job("daily", "02:00", lambda: runs.append(1),
                        now=ts(hour=1))
    # not due before 02:00
    assert sched._tick(now=ts(hour=1, minute=59)) == []
    # due at/after 02:00 (poll granularity: first tick past the mark)
    assert sched._tick(now=ts(hour=2, minute=0)) == ["daily"]
    assert runs == [1]
    # re-anchored to TOMORROW 02:00 — not now+24h (no drift from a late tick)
    late = ts(hour=2, minute=37)
    assert sched.jobs["daily"].next_run == ts(day_offset=1, hour=2)
    assert sched._tick(now=late) == []
    assert sched._tick(now=ts(day_offset=1, hour=2, minute=5)) == ["daily"]
    # anchored to day-2 02:00 despite running at 02:05
    assert sched.jobs["daily"].next_run == ts(day_offset=2, hour=2)


def test_missed_run_catch_up_across_restart(tmp_path):
    hist = tmp_path / "history.json"
    runs = []

    # process 1: runs the 02:00 job on day 0
    s1 = PeriodicScheduler(history_path=hist)
    s1.add_daily_job("daily", "02:00", lambda: runs.append("p1"),
                     now=ts(hour=1))
    assert s1._tick(now=ts(hour=2)) == ["daily"]
    rec = json.loads(hist.read_text())["daily"]
    assert rec["runs"] == 1 and rec["last_status"] == "ok"

    # process 2 starts day 2 at 14:00 — the day-1 AND day-2 02:00 windows
    # were missed while down -> catch-up fires at the next tick
    s2 = PeriodicScheduler(history_path=hist)
    s2.add_daily_job("daily", "02:00", lambda: runs.append("p2"),
                     now=ts(day_offset=2, hour=14))
    assert s2._tick(now=ts(day_offset=2, hour=14, minute=0, )) == ["daily"]
    assert runs == ["p1", "p2"]
    # after catch-up, re-anchored to the next wall-clock occurrence
    assert s2.jobs["daily"].next_run == ts(day_offset=3, hour=2)

    # process 3 restarts the same day AFTER the job already ran -> no catch-up
    s3 = PeriodicScheduler(history_path=hist)
    s3.add_daily_job("daily", "02:00", lambda: runs.append("p3"),
                     now=ts(day_offset=2, hour=15))
    assert s3._tick(now=ts(day_offset=2, hour=15)) == []
    assert s3.jobs["daily"].next_run == ts(day_offset=3, hour=2)

    # catch_up=False always waits for the next occurrence
    s4 = PeriodicScheduler(history_path=hist)
    s4.add_daily_job("daily", "02:00", lambda: runs.append("p4"),
                     catch_up=False, now=ts(day_offset=9, hour=14))
    assert s4._tick(now=ts(day_offset=9, hour=14)) == []


def test_first_ever_run_does_not_catch_up(tmp_path):
    """No history -> a brand-new job waits for its first scheduled slot."""
    sched = PeriodicScheduler(history_path=tmp_path / "h.json")
    sched.add_daily_job("daily", "02:00", lambda: None,
                        now=ts(hour=14))
    assert sched._tick(now=ts(hour=14)) == []
    assert sched.jobs["daily"].next_run == ts(day_offset=1, hour=2)


def test_history_records_failures_and_survives_corruption(tmp_path):
    hist = tmp_path / "h.json"
    sched = PeriodicScheduler(history_path=hist)

    def boom():
        raise RuntimeError("pipeline exploded")

    sched.add_daily_job("daily", "02:00", boom, now=ts(hour=1))
    assert sched._tick(now=ts(hour=2)) == ["daily"]
    rec = json.loads(hist.read_text())["daily"]
    assert rec["failures"] == 1 and rec["last_status"] == "failed"
    # a failed run still counts as an attempt -> catch-up doesn't re-fire
    s2 = PeriodicScheduler(history_path=hist)
    s2.add_daily_job("daily", "02:00", boom, now=ts(hour=5))
    assert s2.jobs["daily"].next_run == ts(day_offset=1, hour=2)

    # corrupted history file degrades to empty, not a crash
    hist.write_text("{not json")
    assert RunHistory(hist).get("daily") == {}


def test_interval_jobs_unchanged(tmp_path):
    """Interval jobs keep their now+period anchoring and also record history."""
    sched = PeriodicScheduler(history_path=tmp_path / "h.json")
    runs = []
    j = sched.add_job("hourly", 3600, lambda: runs.append(1))
    j.next_run = ts(hour=1)
    assert sched._tick(now=ts(hour=1)) == ["hourly"]
    assert j.next_run == ts(hour=2)
    assert json.loads((tmp_path / "h.json").read_text())["hourly"]["runs"] == 1
