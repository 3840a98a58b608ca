"""SPA swap-in proof: the reference's BUILT React/Vite frontend served by our
server, driven with the SPA's exact request shapes.

The reference builds its frontend into ``backend/dist`` (``npm run
build-for-django``, frontend/package.json) and Django serves it from there
(settings.py:73). Our server serves ANY dist dir via ``MMDX_FRONTEND_DIR`` —
here the reference's actual build artifacts (read directly from the read-only
reference tree; skipped when absent). The API-call tests replicate
HomePage.jsx's axios flows byte-for-byte: the multipart FormData field names
("image" file + "patient_details", HomePage.jsx:60-62), the trailing-slash
routes (":66 '/api/predict/'"), the body-less POST to /api/load-sample/
(":88") and its base64->File round-trip (":44-48,94"), and the
``e.response.data.error`` message surface (":72-76").
"""
import base64
import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import pytest

from mmdx_tpu.checkpoints.bundle import new_random_bundle
from mmdx_tpu.serve.wsgi import make_app, make_server
from tests.test_serve import multipart_body

REF_DIST = Path("/root/reference/backend/dist")

pytestmark = pytest.mark.skipif(
    not (REF_DIST / "index.html").exists(),
    reason="reference SPA build not present on this machine")


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    import os

    os.environ["MMDX_FRONTEND_DIR"] = str(REF_DIST)
    try:
        bundle = new_random_bundle(seed=0, small=True)
        app = make_app(
            bundle=bundle, generate_reports=True,
            gen_overrides=dict(max_new_tokens=6, min_new_tokens=1,
                               num_beams=2),
        )
        srv = make_server("127.0.0.1", 0, app, request_timeout=120.0)
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield app, f"http://127.0.0.1:{port}"
        srv.shutdown()
        if app._batcher is not None:
            app._batcher.stop(drain=True)
    finally:
        os.environ.pop("MMDX_FRONTEND_DIR", None)


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _post(url, body=b"", ctype=None, timeout=300):
    headers = {"Content-Type": ctype} if ctype else {}
    req = urllib.request.Request(url, data=body, headers=headers,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_reference_spa_assets_served(served):
    """GET / returns the reference build's index.html; its referenced hashed
    assets resolve with correct mime types (the SPA boots from our server)."""
    _, url = served
    status, ctype, body = _get(f"{url}/")
    assert status == 200 and ctype.startswith("text/html")
    html = body.decode()
    assert html == (REF_DIST / "index.html").read_text()

    # serve exactly the asset files the page references
    import re

    js = re.search(r'src="(/assets/[^"]+\.js)"', html).group(1)
    css = re.search(r'href="(/assets/[^"]+\.css)"', html).group(1)
    s, t, b = _get(f"{url}{js}")
    assert s == 200 and "javascript" in t
    assert b == (REF_DIST / js.lstrip("/")).read_bytes()
    # the bundle is the REAL reference app: it targets our exact routes
    for route in (b"/api/predict/", b"/api/load-sample/", b"/api/items/"):
        assert route in b
    s, t, _ = _get(f"{url}{css}")
    assert s == 200 and t == "text/css"
    s, t, _ = _get(f"{url}/vite.svg")
    assert s == 200 and "svg" in t

    # path traversal out of the dist dir stays 404
    req = urllib.request.Request(f"{url}/assets/../../manage.py")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200  # urllib collapses dots; server must 404 raw
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_spa_load_sample_then_predict_flow(served):
    """The HomePage happy path, requests shaped exactly as the SPA ships
    them: body-less POST load-sample -> base64ToFile -> multipart FormData
    {image, patient_details} -> predict JSON {diseases[13], report_text}."""
    _, url = served
    # axios api.post("/api/load-sample/") — no body, no content type
    s, sample = _post(f"{url}/api/load-sample/")
    assert s == 200
    assert set(sample) >= {"image_name", "image_mime", "image_base64",
                           "patient_details"}

    # base64ToFile(data.image_base64, data.image_mime, data.image_name)
    blob = base64.b64decode(sample["image_base64"])
    body, ctype = multipart_body(
        {"patient_details": sample["patient_details"]},
        {"image": (sample["image_name"], blob, sample["image_mime"])},
    )
    s, data = _post(f"{url}/api/predict/", body, ctype)
    assert s == 200
    # Backend shape the SPA consumes (HomePage.jsx:70,253-309): probability
    # is the 0-100 number its severity coloring thresholds (>=70/40) read
    assert len(data["diseases"]) == 13
    for d in data["diseases"]:
        assert set(d) == {"name", "probability"}
        assert 0.0 <= d["probability"] <= 100.0
    assert isinstance(data["report_text"], str) and data["report_text"]


def test_spa_error_surface(served):
    """The SPA renders e.response.data.error — our 400s must carry it."""
    _, url = served
    body, ctype = multipart_body({"patient_details": "no image attached"}, {})
    try:
        _post(f"{url}/api/predict/", body, ctype)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert json.loads(e.read())["error"] == "Missing 'image' file."
