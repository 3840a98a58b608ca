#!/usr/bin/env python
"""Device-trace the served beam-4 decode and print per-op cost, by source.

Captures one warm engine.generate_reports call under jax.profiler and
aggregates device-op durations (the round-2/3 ground-truth method,
NOTES.md). Use after any decode change to see where the ~2 ms/step goes.

Usage: python scripts/trace_beam.py [batch] [--greedy]
"""
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_trace(log_dir: str, steps: int, top: int = 30):
    paths = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("[trace] no trace file found", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    rows = defaultdict(lambda: [0.0, 0, "", ""])
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        name = e.get("name", "?")
        if name.startswith(("jit_", "while")):
            continue
        a = e.get("args", {})
        r = rows[name]
        r[0] += e.get("dur", 0) / 1e3
        r[1] += 1
        r[2] = a.get("source", "")
        r[3] = a.get("shape_with_layout", "")[:46]
        total += e.get("dur", 0) / 1e3
    print(f"[trace] total device {total:.1f} ms; {total / steps * 1e3:.0f} "
          f"us/step over ~{steps} steps", file=sys.stderr)
    print(f"{'us/step':>8} {'x':>5}  name / source / shape", file=sys.stderr)
    for name, (d, n, src, shp) in sorted(rows.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{d / steps * 1e3:8.1f} {n:5}  {name[:34]:<34} "
              f"{src.split('/')[-1]:<24} {shp}", file=sys.stderr)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.runtime.engine import InferenceEngine

    b = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 64
    greedy = "--greedy" in sys.argv
    bundle = new_random_bundle(seed=0)
    engine = InferenceEngine(bundle, mode="fast")
    steps = bundle.config.generation.max_new_tokens
    print(f"[trace_beam] device={jax.devices()[0].device_kind} B={b} "
          f"greedy={greedy}", file=sys.stderr, flush=True)

    def z(seed):
        r = np.random.default_rng(seed)
        return (
            jnp.asarray(r.standard_normal((b, bundle.config.fusion.d_img)),
                        jnp.float32),
            jnp.asarray(r.standard_normal((b, bundle.config.fusion.d_txt)),
                        jnp.float32),
        )

    zi, zt = z(0)
    engine.generate_reports(zi, zt, greedy=greedy)  # compile + warm
    log_dir = "/tmp/mmdx_beam_trace"
    zi, zt = z(1)
    jax.profiler.start_trace(log_dir)
    engine.generate_reports(zi, zt, greedy=greedy)
    jax.profiler.stop_trace()
    parse_trace(log_dir, steps)


if __name__ == "__main__":
    main()
