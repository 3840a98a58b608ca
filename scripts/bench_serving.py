#!/usr/bin/env python
"""Concurrent serving load benchmark: p50/p99 request latency + throughput.

Boots the real WSGI server (threaded + pipelined micro-batcher) in-process,
fires N concurrent closed-loop clients at /api/predict/ for a fixed duration,
and reports latency percentiles, throughput, and the 503 (load-shed) count.

Usage:
  python scripts/bench_serving.py [--clients 32] [--seconds 30]
      [--mode fast|turbo|parity] [--gen beam|greedy|off] [--port 8901]

The reference serves one torch inference per request (reference
backend/api/views.py:60-103); this measures our replacement under real
concurrency.
"""
import argparse
import base64
import io
import json
import statistics
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--mode", default="fast")
    ap.add_argument("--gen", default="beam", choices=["beam", "greedy", "off"])
    ap.add_argument("--port", type=int, default=8901)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--window-ms", type=float, default=8.0)
    ap.add_argument("--small", action="store_true",
                    help="tiny-dims bundle + short gen (CPU smoke run)")
    args = ap.parse_args()

    if args.small:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.serve.wsgi import make_app, make_server

    bundle = new_random_bundle(seed=0, small=args.small)
    if args.small:
        import dataclasses

        bundle.config = dataclasses.replace(
            bundle.config, generation=dataclasses.replace(
                bundle.config.generation, max_new_tokens=8, min_new_tokens=2,
            ),
        )
    app = make_app(
        bundle=bundle, engine_mode=args.mode,
        generate_reports=args.gen != "off", greedy=args.gen == "greedy",
        batch_window_ms=args.window_ms, max_batch=args.max_batch,
    )
    server = make_server("127.0.0.1", args.port, app)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"[serve-bench] server up on :{args.port} mode={args.mode} "
          f"gen={args.gen} max_batch={args.max_batch}", file=sys.stderr)

    # production boot path: the warmup thread compiles the single-request
    # program AND the batched bucket ladder (classify + coalesced-generate)
    # before traffic — wait for it so the warm rounds below only confirm
    t0 = time.perf_counter()
    app.warmup_async().join()
    print(f"[serve-bench] boot warmup ({app._warmup_state}) in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # one sample request payload (packaged sample X-ray)
    img = (Path(__file__).resolve().parents[1]
           / "mmdx_tpu/serve/sample_data/sample_images/s1.jpg").read_bytes()
    payload = json.dumps({
        "image_base64": base64.b64encode(img).decode(),
        "patient_details": "62 year old male, cough and fever, smoker",
    }).encode()

    import http.client

    def request():
        conn = http.client.HTTPConnection("127.0.0.1", args.port, timeout=120)
        try:
            conn.request("POST", "/api/predict/", body=payload,
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            r.read()
            return r.status
        finally:
            conn.close()

    # warm every compile bucket: fire the full client count in rounds until a
    # round comes back fast. One round is NOT enough in turbo mode — the first
    # batch runs int8 calibration and compiles the *calibration* program; the
    # post-calibration serving program only compiles on the NEXT batch (this
    # burned a 35 s "p50" into an early measurement).
    print("[serve-bench] warming (compiles fused-batch buckets)...",
          file=sys.stderr)
    for rnd in range(6):
        t0 = time.perf_counter()
        warm_threads = [
            threading.Thread(target=request) for _ in range(args.clients)]
        for t in warm_threads:
            t.start()
        for t in warm_threads:
            t.join()
        wall = time.perf_counter() - t0
        print(f"[serve-bench] warm round {rnd}: {wall:.1f}s", file=sys.stderr)
        if wall < 5.0:
            break

    latencies: list[float] = []
    codes: dict[int, int] = {}
    lock = threading.Lock()
    stop_at = time.perf_counter() + args.seconds

    def client():
        while time.perf_counter() < stop_at:
            t0 = time.perf_counter()
            try:
                status = request()
            except Exception:  # noqa: BLE001
                status = -1
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)
                codes[status] = codes.get(status, 0) + 1

    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    # batcher's own view (fusing + coalescing diagnostics) before shutdown
    batcher_stats = {}
    try:
        conn = http.client.HTTPConnection("127.0.0.1", args.port, timeout=30)
        conn.request("GET", "/api/stats/")
        batcher_stats = json.loads(
            conn.getresponse().read()).get("batcher", {})
        conn.close()
    except Exception:  # noqa: BLE001 — diagnostics only
        pass
    server.shutdown()

    ok = codes.get(200, 0)
    lat_sorted = sorted(latencies)

    def pct(p):
        return lat_sorted[min(len(lat_sorted) - 1, int(p / 100 * len(lat_sorted)))]

    result = {
        "clients": args.clients,
        "mode": args.mode,
        "gen": args.gen,
        "duration_s": round(wall, 1),
        "requests_ok": ok,
        "requests_503": codes.get(503, 0),
        "requests_other": sum(v for k, v in codes.items() if k not in (200, 503)),
        "throughput_rps": round(ok / wall, 1),
        "p50_ms": round(pct(50) * 1e3, 1),
        "p90_ms": round(pct(90) * 1e3, 1),
        "p99_ms": round(pct(99) * 1e3, 1),
        "batcher": batcher_stats,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
