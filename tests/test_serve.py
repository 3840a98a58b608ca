"""Serving API tests: WSGI routes match the reference's JSON contracts."""
import base64
import io
import json

import numpy as np
import pytest

from mmdx_tpu.checkpoints.bundle import new_random_bundle
from mmdx_tpu.serve.multipart import parse_boundary, parse_multipart
from mmdx_tpu.serve.wsgi import make_app


def call(app, method, path, body=b"", content_type=""):
    status_headers = {}

    def start_response(status, headers):
        status_headers["status"] = status
        status_headers["headers"] = dict(headers)

    environ = {
        "REQUEST_METHOD": method,
        "PATH_INFO": path,
        "CONTENT_TYPE": content_type,
        "CONTENT_LENGTH": str(len(body)),
        "wsgi.input": io.BytesIO(body),
    }
    chunks = app(environ, start_response)
    return status_headers["status"], status_headers["headers"], b"".join(chunks)


def multipart_body(fields: dict, files: dict):
    boundary = b"testboundary123"
    out = []
    for name, value in fields.items():
        out += [b"--" + boundary,
                f'Content-Disposition: form-data; name="{name}"'.encode(),
                b"", value.encode()]
    for name, (fname, data, ctype) in files.items():
        out += [b"--" + boundary,
                f'Content-Disposition: form-data; name="{name}"; filename="{fname}"'.encode(),
                f"Content-Type: {ctype}".encode(), b"", data]
    out.append(b"--" + boundary + b"--")
    return b"\r\n".join(out), f"multipart/form-data; boundary=testboundary123"


@pytest.fixture(scope="module")
def app():
    bundle = new_random_bundle(seed=0, small=True)
    return make_app(bundle=bundle, generate_reports=True,
                    gen_overrides=dict(max_new_tokens=6, min_new_tokens=1, num_beams=2))


def test_multipart_parser():
    body, ctype = multipart_body({"patient_details": "67M smoker"},
                                 {"image": ("x.jpg", b"\xff\xd8JPEGDATA", "image/jpeg")})
    parts = parse_multipart(body, parse_boundary(ctype))
    assert parts["patient_details"].text == "67M smoker"
    assert parts["image"].data == b"\xff\xd8JPEGDATA"
    assert parts["image"].filename == "x.jpg"


def test_items_route(app):
    status, _, body = call(app, "GET", "/api/items/")
    assert status.startswith("200")
    assert json.loads(body) == [{"name": "Item 1"}, {"name": "Item 2"}]


def test_predict_route(app, sample_image_paths):
    img = sample_image_paths[0].read_bytes()
    body, ctype = multipart_body({"patient_details": "31 year old male, cough"},
                                 {"image": ("e1.jpg", img, "image/jpeg")})
    status, _, raw = call(app, "POST", "/api/predict/", body, ctype)
    assert status.startswith("200"), raw
    payload = json.loads(raw)
    assert set(payload) == {"diseases", "report_text"}
    assert len(payload["diseases"]) == 13
    from mmdx_tpu.config import DISEASES

    assert [d["name"] for d in payload["diseases"]] == DISEASES
    for d in payload["diseases"]:
        assert 0.0 <= d["probability"] <= 100.0  # percentages, 2dp (views.py:92-97)
        assert round(d["probability"], 2) == d["probability"]


def test_predict_json_route(app, sample_image_paths):
    payload = {
        "image_base64": base64.b64encode(sample_image_paths[1].read_bytes()).decode(),
        "patient_details": "78 year old female, fever",
    }
    status, _, raw = call(app, "POST", "/api/predict/", json.dumps(payload).encode(),
                          "application/json")
    assert status.startswith("200")
    assert len(json.loads(raw)["diseases"]) == 13


def test_predict_missing_image(app):
    body, ctype = multipart_body({"patient_details": "x"}, {})
    status, _, raw = call(app, "POST", "/api/predict/", body, ctype)
    assert status.startswith("400")
    assert "image" in json.loads(raw)["error"].lower()


def test_load_sample_route(app, monkeypatch):
    monkeypatch.setenv("sample_images", "/root/reference/backend/sample_images")
    monkeypatch.setenv("sample_details",
                       "/root/reference/backend/sample_details/patient_details.json")
    status, _, raw = call(app, "POST", "/api/load-sample/")
    assert status.startswith("200")
    payload = json.loads(raw)
    assert set(payload) == {"image_name", "image_mime", "image_base64", "patient_details"}
    base64.b64decode(payload["image_base64"])


def test_frontend_served(app):
    status, headers, body = call(app, "GET", "/")
    assert status.startswith("200")
    assert b"MMDX" in body
    assert "text/html" in headers["Content-Type"]


def test_scheduler_tick():
    from mmdx_tpu.scheduler.cron import PeriodicScheduler

    calls = []
    sched = PeriodicScheduler()
    sched.add_job("ok", 100, lambda: calls.append(1), run_immediately=True)
    sched.add_job("boom", 100, lambda: 1 / 0, run_immediately=True)
    ran = sched._tick()
    assert set(ran) == {"ok", "boom"}
    assert calls == [1]
    assert sched.jobs["boom"].failures == 1
    assert "ZeroDivisionError" in sched.jobs["boom"].last_error
    assert sched._tick() == []  # not due again yet


def test_load_sample_packaged_fallback(app, monkeypatch, tmp_path):
    """Without env overrides and no local dirs, the packaged samples serve."""
    monkeypatch.delenv("sample_images", raising=False)
    monkeypatch.delenv("sample_details", raising=False)
    monkeypatch.chdir(tmp_path)
    status, _, raw = call(app, "POST", "/api/load-sample/")
    assert status.startswith("200"), raw
    payload = json.loads(raw)
    assert payload["image_name"] in {"s1.jpg", "s2.jpg"}
    assert "year old" in payload["patient_details"]


def test_predict_503_on_saturation(app, sample_image_paths, monkeypatch):
    """A saturated batcher surfaces as 503 + Retry-After (load shedding),
    not an unbounded queue or a 500."""
    from mmdx_tpu.runtime.batcher import BatcherSaturated

    class _Saturated:
        def infer(self, image, text, timeout=None):
            raise BatcherSaturated("input queue at capacity (128)")

    monkeypatch.setattr(app, "_get_batcher", lambda: _Saturated())
    img_bytes = open(sample_image_paths[0], "rb").read()
    body, ctype = multipart_body({"patient_details": "x"},
                                 {"image": ("a.jpg", img_bytes, "image/jpeg")})
    status, headers, payload = call(app, "POST", "/api/predict/", body, ctype)
    assert status.startswith("503")
    assert headers.get("Retry-After") == "1"
    assert "capacity" in json.loads(payload)["error"]


def test_stats_route(app, sample_image_paths):
    """GET /api/stats/ reports status counts, latency percentiles, and live
    batcher counters (observability surface; the reference has none — its
    registry 'metrics' are hardcoded examples, training_pipeline.py:1112)."""
    status, _, raw = call(app, "GET", "/api/stats/")
    assert status.startswith("200")
    before = json.loads(raw)
    assert before["engine_mode"] == app.engine_mode

    img = sample_image_paths[0].read_bytes()
    body, ctype = multipart_body({"patient_details": "55F dyspnea"},
                                 {"image": ("e1.jpg", img, "image/jpeg")})
    ok_before = before["predict_status_counts"].get("200", 0)
    status, _, _ = call(app, "POST", "/api/predict/", body, ctype)
    assert status.startswith("200")
    bad, ctype2 = multipart_body({"patient_details": "x"}, {})
    call(app, "POST", "/api/predict/", bad, ctype2)  # a 400

    status, _, raw = call(app, "GET", "/api/stats/")
    after = json.loads(raw)
    assert after["predict_status_counts"]["200"] == ok_before + 1
    assert after["predict_status_counts"].get("400", 0) >= 1
    lat = after["predict_latency_ms"]
    assert lat["count"] >= 1 and lat["p50"] > 0 and lat["p99"] >= lat["p50"]
    b = after["batcher"]
    assert b["submitted"] >= 1 and b["batches"] >= 1
    assert b["queue_depth"] > 0 and b["shed"] == 0


def test_predict_timeout_is_503_not_500(app, sample_image_paths, monkeypatch):
    """A predict that exceeds the per-request budget (cold compile, overload)
    answers 503 + Retry-After — the batch is still computing and will warm
    the cache; a 500 would mislead clients into treating it as terminal."""

    class _Slow:
        def infer(self, image, text, timeout=None):
            raise TimeoutError()

    monkeypatch.setattr(app, "_get_batcher", lambda: _Slow())
    img_bytes = open(sample_image_paths[0], "rb").read()
    body, ctype = multipart_body({"patient_details": "x"},
                                 {"image": ("a.jpg", img_bytes, "image/jpeg")})
    status, headers, payload = call(app, "POST", "/api/predict/", body, ctype)
    assert status.startswith("503")
    assert headers.get("Retry-After") == "1"
    assert "retry" in json.loads(payload)["error"]


def test_warmup_compiles_serving_path(app):
    """warmup_async pushes a dummy request through the real batcher so the
    first client never pays the jit compile; it must leave the batcher
    healthy for subsequent traffic."""
    t = app.warmup_async()
    t.join(timeout=300)
    assert not t.is_alive()
    assert app._batcher is not None
    before = app._batcher.stats()["batches"]
    assert before >= 1  # the warmup batch itself ran


def test_multipart_malformed_bytes_is_400_not_500(app):
    """Undecodable header bytes from a broken client parse leniently (no
    matching parts) and surface as the 400 contract error, never a
    UnicodeDecodeError-turned-500 (found by fuzzing)."""
    body = (b"--testboundary123\r\nContent-Disposition: form-data; "
            b"\x17\x14\xfeQ\xe0\x82\xff\xee}\r\n\r\nx\r\n--testboundary123--")
    status, _, raw = call(app, "POST", "/api/predict/", body,
                          "multipart/form-data; boundary=testboundary123")
    assert status.startswith("400")
    assert json.loads(raw)["error"] == "Missing 'image' file."


def test_json_predict_malformed_is_400(app):
    for body in (b"{not json", b'{"image_base64": "!!!notb64@@@"}', b"[1,2]"):
        status, _, raw = call(app, "POST", "/api/predict/", body,
                              "application/json")
        assert status.startswith("400"), (body, status, raw)


def test_boot_warmup_precompiles_bucket_ladder(rng):
    """warmup_async compiles the single-request program AND the batched
    bucket ladder (classify {8-ish, max_batch} + coalesced-generate
    {gen_bucket(2), gen_max_batch}) so the first traffic burst never pays a
    cold compile (measured 30-60s per bucket over the TPU remote-compile
    tunnel)."""
    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.serve.wsgi import make_app

    bundle = new_random_bundle(seed=0, small=True)
    app = make_app(
        bundle=bundle, generate_reports=True, max_batch=4,
        gen_overrides=dict(max_new_tokens=4, min_new_tokens=1, num_beams=2),
    )
    batcher = app._get_batcher()
    batcher.gen_max_batch = 4  # keep the CPU warmup cheap
    classify_sizes, gen_sizes = [], []
    real_classify, real_generate = (
        batcher.engine.classify_batch, batcher.engine.generate_reports)

    def rec_classify(images, texts, pad_to=None, host_outputs=False):
        # the compiled program's batch size is the padded bucket
        classify_sizes.append(pad_to or len(images))
        return real_classify(images, texts, pad_to=pad_to,
                             host_outputs=host_outputs)

    def rec_generate(z_img, z_txt, gen=None, greedy=False):
        gen_sizes.append(int(z_img.shape[0]))
        return real_generate(z_img, z_txt, gen, greedy=greedy)

    batcher.engine.classify_batch = rec_classify
    batcher.engine.generate_reports = rec_generate
    try:
        t = app.warmup_async()
        t.join(timeout=600)
        assert not t.is_alive()
        assert app._warmup_state == "done"
        # the warm request (bucket 1) + the batched ladder sizes ran
        assert any(b >= 4 for b in classify_sizes), classify_sizes
        assert 1 in gen_sizes and 4 in gen_sizes, gen_sizes
    finally:
        batcher.engine.classify_batch = real_classify
        batcher.engine.generate_reports = real_generate
        batcher.stop()


def test_multichip_serving_predict(sample_image_paths):
    """The serving app runs the whole predict path (batcher -> classify ->
    generate) on a device MESH: weights tp/replicate-shard per the parallel
    rules, every batch dp-shards over "data" (multi-chip serving is new
    capability — the reference is strictly single-device, SURVEY §2.4).
    Runs on the 8-virtual-device CPU mesh the driver's dryrun validates."""
    from mmdx_tpu.parallel.mesh import make_mesh

    bundle = new_random_bundle(seed=0, small=True)
    mesh_app = make_app(
        bundle=bundle, generate_reports=True, mesh=make_mesh(n_model=2),
        gen_overrides=dict(max_new_tokens=6, min_new_tokens=1, num_beams=2),
    )
    try:
        assert mesh_app._get_batcher().engine.mesh is not None
        img = sample_image_paths[0].read_bytes()
        body, ctype = multipart_body(
            {"patient_details": "44 year old female, chest pain"},
            {"image": ("e1.jpg", img, "image/jpeg")})
        status, _, raw = call(mesh_app, "POST", "/api/predict/", body, ctype)
        assert status.startswith("200"), raw
        payload = json.loads(raw)
        assert len(payload["diseases"]) == 13
        assert isinstance(payload["report_text"], str)
        # dp x tp really is the engine's layout
        assert dict(mesh_app._get_batcher().engine.mesh.shape) == {
            "data": 4, "model": 2}
    finally:
        mesh_app._batcher.stop()
