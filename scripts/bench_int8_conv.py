#!/usr/bin/env python
"""Diagnostic: int8 vs bf16 convs at ResNet stage shapes (round-3 groundwork).

The tower is HBM-roofline-bound (NOTES round 2); int8 activations halve the
bytes AND double the MXU rate. This measures XLA's int8 conv support and
speedup at the dominant shapes before any productionization (quantized
"turbo" mode would be opt-in with a calibration story).

Usage: python scripts/bench_int8_conv.py [batch]
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    import numpy as np

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rng = np.random.default_rng(0)
    print(f"[int8] device={jax.devices()[0].device_kind} B={batch}", flush=True)

    _salt = iter(range(1, 100000))

    def timed(fn, *args, reps=3, lo=2, hi=12):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(args, salt0, iters: int):
            def body(_, carry):
                acc, salt = carry
                y = fn(salt, *args)
                s = jnp.sum(y.astype(jnp.float32))
                return acc + s, (jnp.abs(s) * 1003.0).astype(jnp.int32) % 97
            acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0), salt0))
            return acc
        float(loop(args, jnp.int32(next(_salt)), lo))
        float(loop(args, jnp.int32(next(_salt)), hi))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter(); float(loop(args, jnp.int32(next(_salt)), lo)); dl = time.perf_counter() - t0
            t0 = time.perf_counter(); float(loop(args, jnp.int32(next(_salt)), hi)); dh = time.perf_counter() - t0
            per = (dh - dl) / (hi - lo)
            best = per if best is None else min(best, per)
        return best

    # stage-1-like 3x3 (HBM-bound) and stage-3-like (mixed)
    for (hh, ww, c) in ((56, 56, 64), (14, 14, 256)):
        kshape = (3, 3, c, c)
        xb = jnp.asarray(rng.standard_normal((batch, hh, ww, c)) * 0.1, jnp.bfloat16)
        kb = jnp.asarray(rng.standard_normal(kshape) * 0.05, jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 128, (batch, hh, ww, c)), jnp.int8)
        ki = jnp.asarray(rng.integers(-127, 128, kshape), jnp.int8)
        dn = lax.conv_dimension_numbers(xb.shape, kshape, ("NHWC", "HWIO", "NHWC"))

        def f_bf16(salt, x, k):
            x = x + (salt % 2).astype(jnp.bfloat16) * 1e-3
            return lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                            dimension_numbers=dn)

        def f_int8(salt, x, k):
            x = (x + (salt % 2).astype(jnp.int8)).astype(jnp.int8)
            y = lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                         dimension_numbers=dn,
                                         preferred_element_type=jnp.int32)
            # dequant epilogue back to bf16 (what a real turbo mode would fuse)
            return (y.astype(jnp.float32) * 7.8e-5).astype(jnp.bfloat16)

        fl = 2 * batch * hh * ww * 9 * c * c
        for label, fn, args in (("bf16", f_bf16, (xb, kb)), ("int8", f_int8, (xi, ki))):
            try:
                t = timed(fn, *args)
                print(f"[int8] {hh}x{ww}x{c} 3x3 {label}: {t*1e3:.3f} ms "
                      f"({fl/t/1e12:.0f} TF/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[int8] {hh}x{ww}x{c} {label}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
