#!/usr/bin/env python
"""Diagnostic: full int8 turbo tower vs bf16 folded tower at serving batch.

Times both towers with salted on-device loops (NOTES.md measurement rules),
then captures a device trace of the int8 tower and prints the top ops by
total duration — the tool for finding unfused requant chains / non-int8
convs.

Usage: python scripts/bench_int8_tower.py [batch] [--trace]
"""
import functools
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_trace(log_dir: str, top: int = 25):
    """Aggregate device-op durations from the newest trace.json.gz."""
    paths = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("[trace] no trace file found", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device tracks: pid names containing "TPU" and thread names with XLA Ops
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dur_by_name = defaultdict(float)
    n_by_name = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        dur_by_name[name] += dur
        n_by_name[name] += 1
        total += dur
    print(f"[trace] total device time {total:.2f} ms across "
          f"{sum(n_by_name.values())} events", file=sys.stderr)
    for name, d in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"[trace] {d:9.3f} ms  x{n_by_name[name]:<4} {name[:110]}",
              file=sys.stderr)


def main():
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    from mmdx_tpu.checkpoints.bundle import new_random_bundle
    from mmdx_tpu.models.resnet_int8 import (
        calibrate_backbone, folded_backbone, folded_forward,
        int8_backbone_apply, quantize_backbone,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 512
    do_trace = "--trace" in sys.argv
    skip_bf16 = "--nobf16" in sys.argv
    tag = "current"
    apply_fn = int8_backbone_apply
    bundle = new_random_bundle(seed=0)
    v = jax.device_put(bundle.variables)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)) * 0.8, jnp.bfloat16)
    print(f"[i8tower] device={jax.devices()[0].device_kind} B={batch}",
          file=sys.stderr, flush=True)

    scales = calibrate_backbone(v, x[:32].astype(jnp.float32))
    q = jax.device_put(jax.jit(lambda vv: quantize_backbone(vv, scales))(v))
    bp = v["params"]["image_encoder"]["backbone"]
    bs = v["batch_stats"]["image_encoder"]["backbone"]

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop_bf16(bp, bs, x, salt0, iters: int):
        folded = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                              folded_backbone(bp, bs))
        def body(_, carry):
            acc, salt = carry
            xi = x + (salt % 2).astype(jnp.bfloat16) * 1e-3
            feats, _ = folded_forward(folded, xi, compute_dtype=jnp.bfloat16)
            s = jnp.sum(feats.astype(jnp.float32))
            return acc + s, (jnp.abs(s) * 1003.0).astype(jnp.int32) % 97
        acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0), salt0))
        return acc

    def make_loop_int8():
        # fresh jit object per A/B arm: re-traces int8_backbone_apply under
        # whatever MMDX_INT8_S2D_* env the caller just flipped
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop_int8(q, x, salt0, iters: int):
            def body(_, carry):
                acc, salt = carry
                xi = x + (salt % 2).astype(jnp.bfloat16) * 1e-3
                feats = apply_fn(q, xi)
                s = jnp.sum(feats.astype(jnp.float32))
                return acc + s, (jnp.abs(s) * 1003.0).astype(jnp.int32) % 97
            acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0), salt0))
            return acc
        return loop_int8

    _salt = iter(range(1, 100000))

    def timed(loop, *args, reps=3, lo=2, hi=12):
        float(loop(*args, jnp.int32(next(_salt)), iters=lo))
        float(loop(*args, jnp.int32(next(_salt)), iters=hi))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(*args, jnp.int32(next(_salt)), iters=lo))
            dl = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(loop(*args, jnp.int32(next(_salt)), iters=hi))
            dh = time.perf_counter() - t0
            per = (dh - dl) / (hi - lo)
            best = per if best is None else min(best, per)
        return best

    wait = x.astype  # noqa: keep x alive

    if not skip_bf16:
        t_bf16 = timed(loop_bf16, bp, bs, x)
        print(f"[i8tower] bf16 folded tower: {t_bf16 * 1e3:.2f} ms/batch",
              file=sys.stderr, flush=True)
    t_i8 = timed(make_loop_int8(), q, x)
    print(f"[i8tower] int8 turbo tower ({tag}): {t_i8 * 1e3:.2f} ms/batch",
          file=sys.stderr, flush=True)

    import os

    # A/B: space-to-depth rewrite of the three stage-boundary 3x3 s2 convs
    # (bit-exact; flag default-off until this measurement wins on-chip)
    os.environ["MMDX_INT8_S2D_CONV2"] = "1"
    t_s2d2 = timed(make_loop_int8(), q, x)
    os.environ.pop("MMDX_INT8_S2D_CONV2", None)
    print(f"[i8tower] int8 turbo tower (s2d conv2): {t_s2d2 * 1e3:.2f} "
          f"ms/batch ({'WIN' if t_s2d2 < t_i8 else 'lose'} "
          f"{(t_i8 - t_s2d2) * 1e3:+.2f} ms)", file=sys.stderr, flush=True)

    # A/B: stem s2d OFF (it defaults ON but landed during the outage —
    # falsifiable here; flip the default if the direct 7x7 form wins)
    os.environ["MMDX_INT8_S2D_STEM"] = "0"
    t_nostem = timed(make_loop_int8(), q, x)
    os.environ.pop("MMDX_INT8_S2D_STEM", None)
    print(f"[i8tower] int8 turbo tower (direct 7x7 stem): "
          f"{t_nostem * 1e3:.2f} ms/batch (s2d stem "
          f"{'WINS' if t_i8 < t_nostem else 'LOSES'} "
          f"{(t_nostem - t_i8) * 1e3:+.2f} ms)", file=sys.stderr, flush=True)

    # A/B: Pallas fused stride-1 bottlenecks (one HBM read+write per block)
    # per stage set — flag default-off until a set wins here on-chip
    for stages in ("1", "2", "1,2"):
        os.environ["MMDX_INT8_FUSED_BLOCKS"] = stages
        try:
            t_fb = timed(make_loop_int8(), q, x)
            print(f"[i8tower] int8 turbo tower (fused blocks s{stages}): "
                  f"{t_fb * 1e3:.2f} ms/batch "
                  f"({'WIN' if t_fb < t_i8 else 'lose'} "
                  f"{(t_i8 - t_fb) * 1e3:+.2f} ms)",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[i8tower] fused blocks s{stages}: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr, flush=True)
        finally:
            os.environ.pop("MMDX_INT8_FUSED_BLOCKS", None)

    if do_trace:
        log_dir = "/tmp/mmdx_i8_trace"
        jax.profiler.start_trace(log_dir)
        float(make_loop_int8()(q, x, jnp.int32(next(_salt)), iters=3))
        jax.profiler.stop_trace()
        parse_trace(log_dir)


if __name__ == "__main__":
    main()
