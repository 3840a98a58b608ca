"""Real-HTTP e2e: the Procfile entrypoint's server stack over TCP sockets.

`Procfile` runs ``python -m mmdx_tpu.serve.wsgi`` — the hardened threaded
WSGI server (bounded accept backlog, per-connection socket timeouts,
pipelined micro-batcher). The other serving tests drive the WSGI app
in-process; these boot the REAL server on an ephemeral port and speak HTTP,
so the request path matches production byte-for-byte (reference deploy:
backend/Procfile:1 via gunicorn).
"""
import base64
import json
import threading
import urllib.error
import urllib.request

import pytest

from mmdx_tpu.checkpoints.bundle import new_random_bundle
from mmdx_tpu.serve.wsgi import make_app, make_server
from tests.test_serve import multipart_body


@pytest.fixture(scope="module")
def served():
    bundle = new_random_bundle(seed=0, small=True)
    app = make_app(
        bundle=bundle, generate_reports=True,
        gen_overrides=dict(max_new_tokens=6, min_new_tokens=1, num_beams=2),
    )
    srv = make_server("127.0.0.1", 0, app, request_timeout=120.0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield app, f"http://127.0.0.1:{port}"
    srv.shutdown()
    if app._batcher is not None:
        app._batcher.stop(drain=True)


def _post(url, body, ctype, timeout=300):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


def test_items_over_http(served):
    _, url = served
    with urllib.request.urlopen(f"{url}/api/items/", timeout=30) as r:
        assert r.status == 200
        assert json.loads(r.read()) == [{"name": "Item 1"}, {"name": "Item 2"}]


def test_predict_over_http(served, sample_image_paths):
    _, url = served
    img = sample_image_paths[0].read_bytes()
    body, ctype = multipart_body(
        {"patient_details": "58 year old male, dyspnea"},
        {"image": ("e1.jpg", img, "image/jpeg")},
    )
    status, raw = _post(f"{url}/api/predict/", body, ctype)
    assert status == 200
    payload = json.loads(raw)
    assert len(payload["diseases"]) == 13
    assert isinstance(payload["report_text"], str)


def test_concurrent_predicts_fuse_over_http(served, sample_image_paths):
    """N concurrent HTTP clients all succeed and the micro-batcher fuses at
    least two of them into one device batch (the whole point of serving
    batched; reference is strictly batch=1/request, views.py:60-103)."""
    app, url = served
    img = sample_image_paths[0].read_bytes()
    body, ctype = multipart_body(
        {"patient_details": "61F cough"},
        {"image": ("e1.jpg", img, "image/jpeg")},
    )
    def round4():
        results = [None] * 4

        def hit(i):
            results[i] = _post(f"{url}/api/predict/", body, ctype)[0]

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        return results

    # warm rounds: compile every fused-batch bucket the probe can hit
    # (1/2/4 — a new bucket size compiles on first sight under the CPU
    # conftest, which would otherwise serialize the measured round into
    # four bucket-1 batches and flake the fusing assert)
    _post(f"{url}/api/predict/", body, ctype)
    assert round4() == [200, 200, 200, 200]
    before = app._batcher.stats()["batches"]
    assert round4() == [200, 200, 200, 200]
    stats = app._batcher.stats()
    n_batches = stats["batches"] - before
    assert n_batches < 4, stats  # at least one fused batch


def test_errors_over_http(served):
    _, url = served
    body, ctype = multipart_body({"patient_details": "x"}, {})
    try:
        _post(f"{url}/api/predict/", body, ctype)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert json.loads(e.read())["error"] == "Missing 'image' file."
    try:
        with urllib.request.urlopen(f"{url}/api/predict/", timeout=30):
            raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_json_predict_over_http(served, sample_image_paths):
    _, url = served
    payload = json.dumps({
        "image_base64": base64.b64encode(
            sample_image_paths[0].read_bytes()
        ).decode(),
        "patient_details": "70M smoker",
    }).encode()
    status, raw = _post(f"{url}/api/predict/", payload, "application/json")
    assert status == 200
    assert len(json.loads(raw)["diseases"]) == 13
