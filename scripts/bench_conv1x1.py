#!/usr/bin/env python
"""Is XLA's conv lowering the ResNet MFU problem? Time stage-3-shaped ops.

Stage 3 (6 bottlenecks at 14x14x1024) costs 20.7 ms of the 39.9 ms tower at
B=512 (~33% MFU). Its 1x1 convs are plain matmuls in disguise; this compares
lax.conv vs reshape+dot for the 1x1s and times the 3x3 separately, plus a
full bottleneck assembled both ways.

Usage: python scripts/bench_conv1x1.py [batch]
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
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"[conv] device={jax.devices()[0].device_kind} B={batch}", flush=True)

    def timed(fn, *args, reps=3, lo=2, hi=12):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(args, iters: int):
            def body(_, carry):
                acc, salt = carry
                y = fn(salt, *args)
                s = jnp.sum(y.astype(jnp.float32))
                return acc + s, (jnp.abs(s) * 1003.0).astype(jnp.int32) % 97
            acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0), jnp.int32(1)))
            return acc
        float(loop(args, lo)); float(loop(args, hi))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter(); float(loop(args, lo)); dl = time.perf_counter() - t0
            t0 = time.perf_counter(); float(loop(args, hi)); dh = time.perf_counter() - t0
            per = (dh - dl) / (hi - lo)
            best = per if best is None else min(best, per)
        return best

    h = w = 14
    cin, m = 1024, 256
    x = jnp.asarray(rng.standard_normal((batch, h, w, cin)) * 0.1, dt)
    k1 = jnp.asarray(rng.standard_normal((1, 1, cin, m)) * 0.05, dt)
    k3 = jnp.asarray(rng.standard_normal((3, 3, m, m)) * 0.05, dt)
    k1b = jnp.asarray(rng.standard_normal((1, 1, m, cin)) * 0.05, dt)
    xm = jnp.asarray(rng.standard_normal((batch, h, w, m)) * 0.1, dt)

    dn = lax.conv_dimension_numbers(x.shape, k1.shape, ("NHWC", "HWIO", "NHWC"))

    def conv1x1_conv(salt, x, k):
        xi = x + (salt % 2).astype(dt) * 1e-3
        return lax.conv_general_dilated(xi, k, (1, 1), "SAME", dimension_numbers=dn)

    def conv1x1_dot(salt, x, k):
        xi = x + (salt % 2).astype(dt) * 1e-3
        b_, hh, ww, c = xi.shape
        y = jnp.dot(xi.reshape(b_ * hh * ww, c), k[0, 0],
                    preferred_element_type=jnp.float32)
        return y.astype(dt).reshape(b_, hh, ww, -1)

    dn3 = lax.conv_dimension_numbers(xm.shape, k3.shape, ("NHWC", "HWIO", "NHWC"))

    def conv3x3(salt, x, k):
        xi = x + (salt % 2).astype(dt) * 1e-3
        return lax.conv_general_dilated(xi, k, (1, 1), "SAME", dimension_numbers=dn3)

    flops_1x1 = 2 * batch * h * w * cin * m
    flops_3x3 = 2 * batch * h * w * 9 * m * m
    for label, fn, args, fl in (
        ("1x1 1024->256 lax.conv", conv1x1_conv, (x, k1), flops_1x1),
        ("1x1 1024->256 reshape+dot", conv1x1_dot, (x, k1), flops_1x1),
        ("3x3 256->256 lax.conv", conv3x3, (xm, k3), flops_3x3),
    ):
        t = timed(fn, *args)
        print(f"[conv] {label}: {t*1e3:.3f} ms  ({fl/t/1e12:.0f} TF/s)", flush=True)

    # full stage-3 bottleneck: convs vs matmul-1x1s (+fused bn/relu epilogues)
    def block_conv(salt, x, k1, k3, k1b):
        y = conv1x1_conv(salt, x, k1)
        y = jnp.maximum(y, 0)
        y = conv3x3(jnp.int32(0), y, k3)
        y = jnp.maximum(y, 0)
        y = conv1x1_conv(jnp.int32(0), y, k1b)
        return jnp.maximum(y + x, 0)

    def block_dot(salt, x, k1, k3, k1b):
        y = conv1x1_dot(salt, x, k1)
        y = jnp.maximum(y, 0)
        y = conv3x3(jnp.int32(0), y, k3)
        y = jnp.maximum(y, 0)
        y = conv1x1_dot(jnp.int32(0), y, k1b)
        return jnp.maximum(y + x, 0)

    fl_block = 2 * flops_1x1 + flops_3x3
    for label, fn in (("bottleneck convs", block_conv), ("bottleneck dot-1x1", block_dot)):
        t = timed(fn, x, k1, k3, k1b)
        print(f"[conv] {label}: {t*1e3:.3f} ms ({fl_block/t/1e12:.0f} TF/s; "
              f"x6 = {t*6e3:.2f} ms/stage3)", flush=True)


if __name__ == "__main__":
    main()
