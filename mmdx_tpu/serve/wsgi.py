"""WSGI serving app — the reference Django REST API, framework-free.

Routes and JSON contracts mirror the reference exactly so its React frontend
swaps in unchanged (reference ``backend/api/urls.py:6-10``, ``views.py``):

  GET  /api/items/        -> [{"name": "Item 1"}, {"name": "Item 2"}]  (:22-24)
  POST /api/predict/      -> {"diseases": [{name, probability%}], "report_text"}
                             (:60-103; probabilities as 0-100 with 2dp)
  POST /api/load-sample/  -> {image_name, image_mime, image_base64,
                              patient_details}  (:110-158)

Env config mirrors the reference's: ``MMDX_BUNDLE_PATH``/``CXR_BUNDLE_PATH``
(views.py:196), ``sample_images``/``sample_details`` dir overrides
(views.py:117-118), ``PORT``.  CORS is allow-all like the reference
(settings.py:34).
"""
from __future__ import annotations

import base64
import concurrent.futures
import io
import json
import mimetypes
import os
import random
import traceback
from pathlib import Path

from PIL import Image

from mmdx_tpu.config import DISEASES


class DiagnosisApp:
    """WSGI application; model loads lazily on first predict."""

    def __init__(self, bundle=None, engine_mode: str = "parity",
                 generate_reports: bool = True, gen_overrides: dict | None = None,
                 greedy: bool = False, batch_window_ms: float = 5.0,
                 max_batch: int = 32, queue_depth: int = 0, mesh=None):
        self._bundle = bundle
        self.engine_mode = engine_mode
        # multi-chip serving: a jax.sharding.Mesh (or MMDX_SERVE_MESH=<tp>,
        # which builds a ("data","model") mesh over all devices with that
        # tensor-parallel degree) dp-shards every classify/generate batch;
        # the reference serves strictly single-device
        self.mesh = mesh
        self.generate_reports = generate_reports
        self.gen_overrides = gen_overrides
        self.greedy = greedy
        self.batch_window_ms = batch_window_ms
        self.max_batch = max_batch
        self.queue_depth = queue_depth
        self._batcher = None
        self._lock = __import__("threading").Lock()
        # MMDX_FRONTEND_DIR swaps the bundled single-file page for any built
        # SPA dist directory — e.g. the reference's React/Vite build
        # (reference backend/dist, copied there by `npm run build-for-django`,
        # frontend/package.json) — proving the swap-in claim: same routes,
        # same JSON, the reference frontend runs against this server unchanged
        self._static_dir = Path(os.environ.get(
            "MMDX_FRONTEND_DIR",
            Path(__file__).resolve().parent / "frontend"))
        # /api/stats/ observability: status counters + a ring of recent
        # predict latencies (the reference has no metrics surface at all;
        # its registry metadata numbers are hardcoded examples, reference
        # training_pipeline.py:1112)
        self._stats_lock = __import__("threading").Lock()
        self._status_counts: dict[str, int] = {}
        self._latencies = __import__("collections").deque(maxlen=1024)
        # first-request budget: cold jit compiles run 1-6 min on the remote-
        # compile TPU path, far past the steady-state 30s; a timed-out
        # request answers 503 + Retry-After (the work still completes and
        # warms the cache), never a terminal 500
        self.predict_timeout_s = float(os.getenv("MMDX_PREDICT_TIMEOUT_S", "120"))
        # readiness signal for orchestration, surfaced by /api/stats/
        self._warmup_state = "off"

    def warmup_async(self):
        """Compile the serving programs before traffic: push one dummy
        request through the real batcher path (bucket-1 classify + the full
        report decode) from a daemon thread. Callers that want cold-start
        isolation run this at server boot (``main()`` does unless
        MMDX_WARMUP=0); requests arriving meanwhile simply queue behind the
        warmup batch."""
        import threading

        self._warmup_state = "running"

        def run():
            try:
                batcher = self._get_batcher()
                # warm with the SAME wire prep the predict handler applies
                # (decode + host shorter-side resize), so the compiled raw
                # shape is exactly what traffic submits. Use a PACKAGED
                # SAMPLE X-RAY, not a flat synthetic: in turbo mode without
                # persisted scales the FIRST batch calibrates the int8
                # tower, and a gray card would pin the activation grid to
                # degenerate ranges
                import numpy as np

                from mmdx_tpu.io.images import wire_image_u8

                rs = batcher.engine.bundle.config.image.resize_size
                sample_dir = (Path(__file__).resolve().parent
                              / "sample_data/sample_images")
                samples = sorted(sample_dir.glob("*.jpg"))
                if samples:
                    img = wire_image_u8(samples[0].read_bytes(), rs, square=True)
                else:
                    img = np.full((rs, rs, 1), 128, np.uint8)
                batcher.infer(img, "warmup", timeout=None)
                # pre-compile the BATCHED bucket programs (classify + the
                # coalesced-generate ladder) so the first traffic burst
                # doesn't pay 30-60 s per cold bucket; the persistent
                # compile cache makes this near-free on restarts.
                # MMDX_WARMUP_BUCKETS=0 keeps only the bucket-1 warm above.
                if os.getenv("MMDX_WARMUP_BUCKETS", "1") != "0":
                    eng = batcher.engine
                    # channel count is part of the compiled shape: warm the
                    # sample's variant AND the other one (grayscale wires as
                    # 1ch, color as 3ch — traffic may send either)
                    img3 = img[:, :, None] if img.ndim == 2 else img
                    other = (np.repeat(img3, 3, -1) if img3.shape[-1] == 1
                             else img3[:, :, :1])
                    zi = zt = None
                    for b in batcher.classify_buckets:
                        for v in (img, other):
                            if b == 1 and v is img:
                                continue  # warmed by the infer above
                            # one real image + pad_to=b compiles the same
                            # bucket program traffic uses, without decoding
                            # b copies of the sample
                            _, zi, zt = eng.classify_batch(
                                [v], ["warmup"], pad_to=b,
                                host_outputs=True)
                    if batcher.generate and zi is not None:
                        # warm the gen buckets with REAL classify outputs:
                        # traffic z arrives as the engine dtype (bf16 in
                        # fast/turbo) and jit keys on dtype — f32 zeros here
                        # would warm programs traffic never runs, leaving
                        # the first coalesced generate per bucket to compile
                        # mid-traffic
                        for b in sorted({batcher.gen_bucket(2),
                                         batcher.gen_max_batch}):
                            if b > 1:
                                eng.generate_reports(
                                    np.repeat(zi[:1], b, axis=0),
                                    np.repeat(zt[:1], b, axis=0),
                                    batcher.gen, greedy=batcher.greedy,
                                )
                self._warmup_state = "done"
                print("[mmdx] warmup complete (serving programs compiled)",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — warmup is best-effort
                self._warmup_state = f"failed: {type(e).__name__}"
                print(f"[mmdx] warmup failed: {type(e).__name__}: {e}",
                      flush=True)

        t = threading.Thread(target=run, daemon=True, name="mmdx-warmup")
        t.start()
        return t

    # -- model plumbing -------------------------------------------------
    def _engine(self):
        from mmdx_tpu.pipelines.inference_pipeline import get_engine, get_model_bundle

        if self._bundle is None:
            self._bundle = get_model_bundle()
        if self.mesh is None:
            spec = os.getenv("MMDX_SERVE_MESH", "")
            if spec and spec != "0":
                from mmdx_tpu.parallel.mesh import make_mesh

                self.mesh = make_mesh(n_model=int(spec))
                print(f"[mmdx] serving on a "
                      f"{dict(self.mesh.shape)} device mesh", flush=True)
        return get_engine(self._bundle, mode=self.engine_mode, mesh=self.mesh)

    def _get_batcher(self):
        """Concurrent requests fuse into one device batch (double-checked
        lock; the reference serves strictly batch=1 per request,
        views.py:60-103)."""
        if self._batcher is None:
            with self._lock:
                if self._batcher is None:
                    from mmdx_tpu.runtime.batcher import MicroBatcher

                    self._batcher = MicroBatcher(
                        self._engine(), max_batch=self.max_batch,
                        max_wait_ms=self.batch_window_ms,
                        generate=self.generate_reports, greedy=self.greedy,
                        gen_overrides=self.gen_overrides,
                        queue_depth=self.queue_depth,
                    )
        return self._batcher

    # -- WSGI -----------------------------------------------------------
    def __call__(self, environ, start_response):
        path = environ.get("PATH_INFO", "/")
        method = environ.get("REQUEST_METHOD", "GET")
        try:
            if path in ("/api/items", "/api/items/") and method == "GET":
                return self._json(start_response, 200,
                                  [{"name": "Item 1"}, {"name": "Item 2"}])
            if path in ("/api/predict", "/api/predict/") and method == "POST":
                return self._predict(environ, start_response)
            if path in ("/api/load-sample", "/api/load-sample/") and method == "POST":
                return self._load_sample(start_response)
            if path in ("/api/stats", "/api/stats/") and method == "GET":
                return self._json(start_response, 200, self._stats())
            if method == "OPTIONS":
                return self._json(start_response, 200, {})
            if method == "GET":
                return self._static(path, start_response)
            return self._json(start_response, 404, {"error": "not found"})
        except Exception as e:  # request-level 500, like DRF's handler
            traceback.print_exc()
            return self._json(start_response, 500, {"error": str(e)})

    def _json(self, start_response, status: int, payload):
        body = json.dumps(payload).encode("utf-8")
        reasons = {200: "OK", 400: "Bad Request", 404: "Not Found",
                   500: "Internal Server Error", 503: "Service Unavailable"}
        headers = [
            ("Content-Type", "application/json"),
            ("Content-Length", str(len(body))),
            ("Access-Control-Allow-Origin", "*"),
            ("Access-Control-Allow-Headers", "*"),
            ("Access-Control-Allow-Methods", "GET, POST, OPTIONS"),
        ]
        if status == 503:
            # load-shed hint: one micro-batch round-trip is the natural retry
            headers.append(("Retry-After", "1"))
        start_response(f"{status} {reasons.get(status, 'OK')}", headers)
        return [body]

    # -- routes ----------------------------------------------------------
    def _read_body(self, environ) -> bytes:
        length = int(environ.get("CONTENT_LENGTH") or 0)
        return environ["wsgi.input"].read(length) if length else b""

    def _predict(self, environ, start_response):
        """Timing/status wrapper around the predict handler (feeds /api/stats/)."""
        import time

        status_cell = {}

        def recording_start_response(status, headers, exc_info=None):
            status_cell["code"] = status.split(" ", 1)[0]
            if exc_info is not None:
                return start_response(status, headers, exc_info)
            return start_response(status, headers)

        t0 = time.perf_counter()
        try:
            return self._predict_inner(environ, recording_start_response)
        finally:
            with self._stats_lock:
                code = status_cell.get("code", "500")
                self._status_counts[code] = self._status_counts.get(code, 0) + 1
                if code == "200":
                    self._latencies.append(time.perf_counter() - t0)

    def _stats(self) -> dict:
        with self._stats_lock:
            lat = sorted(self._latencies)
            counts = dict(self._status_counts)

        def pct(p):
            if not lat:
                return None
            return round(lat[min(len(lat) - 1, int(p / 100 * len(lat)))] * 1e3, 1)

        return {
            "engine_mode": self.engine_mode,
            "warmup": self._warmup_state,
            "predict_status_counts": counts,
            "predict_latency_ms": {
                "count": len(lat), "p50": pct(50), "p90": pct(90),
                "p99": pct(99),
            },
            "batcher": self._batcher.stats() if self._batcher else None,
        }

    def _predict_inner(self, environ, start_response):
        from mmdx_tpu.serve.multipart import parse_boundary, parse_multipart

        ctype = environ.get("CONTENT_TYPE", "")
        body = self._read_body(environ)
        image_bytes: bytes | None = None
        patient_details = ""

        if ctype.startswith("multipart/form-data"):
            boundary = parse_boundary(ctype)
            if not boundary:
                return self._json(start_response, 400, {"error": "Missing boundary."})
            parts = parse_multipart(body, boundary)
            if "image" in parts:
                image_bytes = parts["image"].data
            patient_details = parts.get("patient_details").text if "patient_details" in parts else ""
        elif ctype.startswith("application/json"):
            try:
                payload = json.loads(body or b"{}")
                if payload.get("image_base64"):
                    image_bytes = base64.b64decode(payload["image_base64"])
            except (json.JSONDecodeError, ValueError, AttributeError):
                # malformed JSON / invalid base64 / non-object payload are
                # client errors, not 500s
                return self._json(start_response, 400,
                                  {"error": "Invalid JSON body."})
            patient_details = payload.get("patient_details", "")
            if not isinstance(patient_details, str):
                patient_details = str(patient_details)

        if not image_bytes:
            return self._json(start_response, 400, {"error": "Missing 'image' file."})
        from mmdx_tpu.io.images import decode_image, wire_image_u8

        try:
            # validate/decode BEFORE touching the batcher: a junk upload to
            # a cold server must 400 without booting the engine
            image_raw = decode_image(image_bytes)
        except Exception:
            return self._json(start_response, 400, {"error": "Invalid image format."})
        batcher = self._get_batcher()
        try:
            rs = int(batcher.engine.bundle.config.image.resize_size)
        except AttributeError:  # engines/fakes without a config surface
            rs = 256
        # stage-1 shorter-side resize + square crop HERE, in the per-request
        # handler thread: PIL releases the GIL (concurrent requests decode in
        # parallel instead of serializing inside the batcher's classify
        # stage), and the post-resize (rs, rs) image is what crosses the
        # ~50 MB/s host->device tunnel — 4-12x fewer bytes than the raw
        # decode, one compiled shape for any aspect ratio, reference-exact
        # semantics (io.images.wire_image_u8)
        image_arr = wire_image_u8(image_raw, rs, square=True)

        from mmdx_tpu.runtime.batcher import BatcherSaturated

        try:
            preds = batcher.infer(
                image_arr, patient_details, timeout=self.predict_timeout_s
            )
        except BatcherSaturated as e:
            # bounded-queue backpressure: shed load instead of queueing
            # unboundedly (the reference has no equivalent; Django would
            # just stack threads)
            return self._json(start_response, 503, {"error": str(e)})
        except (TimeoutError, concurrent.futures.TimeoutError):
            # both names: they only became aliases in Python 3.11, and
            # pyproject supports >= 3.10
            # not a terminal failure: the batch is still computing (first
            # request of a cold server pays the jit compile) — tell the
            # client to come back, the result warms the compile cache
            return self._json(start_response, 503, {
                "error": "inference still in progress (server warming up "
                         "or overloaded); retry shortly"
            })

        raw_probs = preds.get("disease_probs") or {}
        diseases = []
        for name in DISEASES:
            p = float(raw_probs.get(name, 0.0))
            if p <= 1.0:
                p *= 100.0  # reference normalizes to 0-100 percentages (views.py:92-97)
            diseases.append({"name": name, "probability": round(p, 2)})
        return self._json(start_response, 200, {
            "diseases": diseases,
            "report_text": preds.get("report_text", ""),
        })

    def _load_sample(self, start_response):
        pkg_samples = Path(__file__).resolve().parent / "sample_data"
        images_dir = Path(os.getenv("sample_images", "sample_images/"))
        details_json = Path(os.getenv("sample_details", "sample_details/patient_details.json"))
        if not images_dir.exists() and (pkg_samples / "sample_images").exists():
            # fall back to the packaged synthetic samples
            images_dir = pkg_samples / "sample_images"
            details_json = pkg_samples / "patient_details.json"
        if not images_dir.exists():
            return self._json(start_response, 500,
                              {"error": f"Images dir not found: {images_dir.resolve()}"})
        details_map = {}
        if details_json.exists():
            try:
                details_map = json.loads(details_json.read_text(encoding="utf-8"))
            except Exception as e:
                return self._json(start_response, 500,
                                  {"error": f"Failed to read details JSON: {e}"})
        exts = {".png", ".jpg", ".jpeg"}
        candidates = [p for p in images_dir.iterdir()
                      if p.is_file() and p.suffix.lower() in exts]
        if not candidates:
            return self._json(start_response, 404,
                              {"error": f"No images found in {images_dir.resolve()}."})
        with_details = [p for p in candidates if p.name in details_map]
        chosen = random.choice(with_details or candidates)
        image_bytes = chosen.read_bytes()
        return self._json(start_response, 200, {
            "image_name": chosen.name,
            "image_mime": mimetypes.guess_type(chosen.name)[0] or "image/png",
            "image_base64": base64.b64encode(image_bytes).decode("ascii"),
            "patient_details": details_map.get(
                chosen.name,
                "Age/sex, symptoms (onset/duration), key history, recent "
                "surgery/hospitalization, meds/O2, vitals, clinical question.",
            ),
        })

    def _static(self, path: str, start_response):
        """Serve the bundled single-page frontend."""
        rel = "index.html" if path in ("/", "") else path.lstrip("/")
        f = (self._static_dir / rel).resolve()
        if not str(f).startswith(str(self._static_dir.resolve())) or not f.is_file():
            return self._json(start_response, 404, {"error": "not found"})
        body = f.read_bytes()
        ctype = mimetypes.guess_type(f.name)[0] or "application/octet-stream"
        start_response("200 OK", [("Content-Type", ctype),
                                  ("Content-Length", str(len(body)))])
        return [body]


def make_app(**kwargs) -> DiagnosisApp:
    return DiagnosisApp(**kwargs)


def make_server(host: str, port: int, app, request_timeout: float = 60.0,
                backlog: int = 128):
    """Threaded WSGI server, production-hardened.

    * threaded: concurrent requests land in the MicroBatcher's queue and
      fuse into one device batch (wsgiref's default server is
      single-threaded, so concurrent clients would serialize and the
      batcher would never see a batch);
    * bounded accept backlog (``request_queue_size``) so a connection storm
      queues in the kernel up to a limit instead of piling threads —
      combined with the batcher's bounded queue + 503, load sheds at two
      layers (the reference's gunicorn setup relies on the same pattern,
      reference backend/Procfile:1);
    * per-connection socket timeout so a stalled client can't pin a
      handler thread forever.
    """
    import socketserver
    from wsgiref.simple_server import WSGIServer, make_server as _make

    class ThreadingWSGIServer(socketserver.ThreadingMixIn, WSGIServer):
        daemon_threads = True
        request_queue_size = backlog
        timeout = request_timeout

        def process_request(self, request, client_address):
            request.settimeout(request_timeout)
            super().process_request(request, client_address)

    return _make(host, port, app, server_class=ThreadingWSGIServer)


def main():
    """Server: python -m mmdx_tpu.serve.wsgi.

    Env: PORT (8000); MMDX_ENGINE_MODE=parity|fast|turbo; MMDX_GENERATE=1|0
    (report generation on/off); MMDX_GEN_MODE=beam|greedy;
    MMDX_BATCH_WINDOW_MS (micro-batching window, default 5);
    MMDX_MAX_BATCH (fused batch cap, default 32);
    MMDX_QUEUE_DEPTH (bounded request queue before 503s, default
    4*max_batch); MMDX_REQUEST_TIMEOUT_S (socket timeout, default 60);
    MMDX_PREDICT_TIMEOUT_S (per-request inference budget, default 120 —
    timeouts answer 503 + Retry-After, and the computed batch still warms
    the cache); MMDX_WARMUP=0 to skip the boot-time compile warmup;
    MMDX_BUNDLE_PATH.

    SIGTERM/SIGINT drain the batcher (in-flight requests complete) before
    the process exits.
    """
    import signal
    import threading

    port = int(os.getenv("PORT", "8000"))
    app = make_app(
        engine_mode=os.getenv("MMDX_ENGINE_MODE", "parity"),
        generate_reports=os.getenv("MMDX_GENERATE", "1") == "1",
        greedy=os.getenv("MMDX_GEN_MODE", "beam") == "greedy",
        batch_window_ms=float(os.getenv("MMDX_BATCH_WINDOW_MS", "5")),
        max_batch=int(os.getenv("MMDX_MAX_BATCH", "32")),
        queue_depth=int(os.getenv("MMDX_QUEUE_DEPTH", "0")),
    )
    server = make_server(
        "0.0.0.0", port, app,
        request_timeout=float(os.getenv("MMDX_REQUEST_TIMEOUT_S", "60")),
    )

    def _shutdown(signum, frame):
        print(f"[mmdx] signal {signum}: draining batcher and stopping")
        if app._batcher is not None:
            app._batcher.stop(drain=True)
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _shutdown)
    signal.signal(signal.SIGINT, _shutdown)
    if os.getenv("MMDX_WARMUP", "1") != "0":
        app.warmup_async()
    print(f"[mmdx] serving on http://0.0.0.0:{port} "
          f"(mode={app.engine_mode}, generate={app.generate_reports}, "
          f"threaded + pipelined micro-batcher, "
          f"queue_depth={app.queue_depth or 4 * app.max_batch})")
    try:
        server.serve_forever()
    finally:
        if app._batcher is not None:
            app._batcher.stop(drain=True)


if __name__ == "__main__":
    main()
