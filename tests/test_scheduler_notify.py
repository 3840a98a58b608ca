"""Scheduler run-outcome notifications (the reference's Celery ``send_mail``
capability — bytecode-only ``api/__pycache__/tasks.cpython-311.pyc``;
SURVEY §2.3). Covers the on_failure/on_success hooks in cron.py, the built-in
webhook/email notifiers, env composition, and the command-runner wiring."""
import http.server
import json
import threading

import pytest

from mmdx_tpu.scheduler.cron import PeriodicScheduler
from mmdx_tpu.scheduler.notify import (
    log_notifier,
    make_email_notifier,
    make_webhook_notifier,
    notifier_from_env,
)


def test_on_failure_hook_fires_with_event():
    events = []
    sched = PeriodicScheduler(on_failure=events.append)

    def boom():
        raise RuntimeError("pipeline exploded")

    sched.add_job("daily_training", 10, boom, run_immediately=True)
    ran = sched._tick()
    assert ran == ["daily_training"]
    assert len(events) == 1
    ev = events[0]
    assert ev["job"] == "daily_training"
    assert ev["status"] == "failed"
    assert ev["failures"] == 1
    assert "pipeline exploded" in ev["error"]


def test_on_success_hook_and_per_job_override():
    sched_events, job_events = [], []
    sched = PeriodicScheduler(on_failure=sched_events.append,
                              on_success=sched_events.append)
    sched.add_job("a", 10, lambda: None, run_immediately=True)
    sched.add_job("b", 10, lambda: None, run_immediately=True,
                  on_success=job_events.append)  # per-job beats scheduler's
    sched._tick()
    assert [e["job"] for e in sched_events] == ["a"]
    assert [e["job"] for e in job_events] == ["b"]
    assert all(e["status"] == "ok" for e in sched_events + job_events)


def test_notifier_error_does_not_kill_the_loop_or_the_count(capsys):
    def bad_notifier(event):
        raise ConnectionError("mail relay down")

    sched = PeriodicScheduler(on_failure=bad_notifier)
    sched.add_job("j", 10, lambda: 1 / 0, run_immediately=True)
    sched.add_job("k", 10, lambda: None, run_immediately=True)
    ran = sched._tick()
    assert set(ran) == {"j", "k"}  # second job still ran
    assert sched.jobs["j"].failures == 1
    assert "notifier for j failed" in capsys.readouterr().err


class _Recorder(http.server.BaseHTTPRequestHandler):
    received: list = []

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        type(self).received.append(json.loads(body))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"ok")

    def log_message(self, *a):
        pass


@pytest.fixture()
def webhook_server():
    _Recorder.received = []
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Recorder)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/hook"
    srv.shutdown()


def test_webhook_notifier_posts_event_json(webhook_server):
    notify = make_webhook_notifier(webhook_server)
    sched = PeriodicScheduler(on_failure=notify)
    sched.add_job("daily_features", 10, lambda: 1 / 0, run_immediately=True)
    sched._tick()
    assert len(_Recorder.received) == 1
    ev = _Recorder.received[0]
    assert ev["job"] == "daily_features" and ev["status"] == "failed"
    assert "ZeroDivisionError" in ev["error"]


def test_email_notifier_builds_send_mail_equivalent():
    sent = []

    class FakeSMTP:
        def __init__(self, host, port, timeout=None):
            sent.append(("connect", host, port))

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def send_message(self, msg):
            sent.append(("send", msg["Subject"], msg["To"]))

    notify = make_email_notifier("smtp.local", 25, "mmdx@local",
                                 ["oncall@local"], smtp_factory=FakeSMTP)
    sched = PeriodicScheduler(on_failure=notify)
    sched.add_job("daily_training", 10, lambda: 1 / 0, run_immediately=True)
    sched._tick()
    assert ("connect", "smtp.local", 25) in sent
    assert ("send", "[mmdx] daily_training: failed", "oncall@local") in sent


def test_notifier_from_env_composes(webhook_server, capsys):
    notify = notifier_from_env({"MMDX_NOTIFY_WEBHOOK": webhook_server})
    notify({"job": "j", "status": "failed", "error": "x", "runs": 1,
            "failures": 1, "time": "t"})
    assert len(_Recorder.received) == 1  # webhook fired
    assert "[mmdx notify] j: failed" in capsys.readouterr().err  # log fired

    # bare env -> just the log notifier, no crash
    notifier_from_env({})({"job": "j", "status": "ok", "error": None,
                           "runs": 1, "failures": 0, "time": "t"})


def test_command_runner_notifies_on_failure(webhook_server, monkeypatch):
    from mmdx_tpu.scheduler.commands import _run

    monkeypatch.setenv("MMDX_NOTIFY_WEBHOOK", webhook_server)
    with pytest.raises(ValueError):
        _run("run_daily_training_pipeline",
             lambda: (_ for _ in ()).throw(ValueError("bad features")))
    assert len(_Recorder.received) == 1
    ev = _Recorder.received[0]
    assert ev["job"] == "run_daily_training_pipeline"
    assert ev["status"] == "failed" and "bad features" in ev["error"]
