#!/usr/bin/env python
"""Attribute the int8 fused-FFN kernel's 48%-of-peak gap on-chip.

The round-3 classify trace pins fused_ffn_ln_int8 at 0.814 ms/layer at
[16384, 768] x 3072 vs a 0.39 ms int8-MXU ideal. Suspects: the f32 VPU
epilogue (erf-gelu + per-row quantize) serializing against the MXU inside
each block, and the row-block size. This sweeps kernel VARIANTS (cloned
here, production kernel untouched) with salted args per timed call
(NOTES.md measurement rules).

Usage: python scripts/bench_ffn_variants.py [m] [hidden] [dff]
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mmdx_tpu.ops.pallas_ffn import (
    _gelu_exact, _quant_rows, quant_weight_cols,
)


def log(s):
    print(s, file=sys.stderr, flush=True)


def make_kernel(gelu: str, quant: str, eps=1e-12):
    def kernel(x_ref, wi_ref, wis_ref, bi_ref, wo_ref, wos_ref, bo_ref,
               ln_scale_ref, ln_bias_ref, out_ref):
        x = x_ref[...]
        xf = x.astype(jnp.float32)
        if quant == "noclip":
            s1 = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True),
                             1e-12) / 127.0
            xi = jnp.round(xf / s1).astype(jnp.int32).astype(jnp.int8)
        else:
            xi, s1 = _quant_rows(xf)
        mid = jax.lax.dot_general(
            xi, wi_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        mid = mid * (s1 * wis_ref[...]) + bi_ref[...].astype(jnp.float32)
        if gelu == "exact":
            mid = _gelu_exact(mid)
        elif gelu == "tanh":
            mid = 0.5 * mid * (1.0 + jnp.tanh(
                0.7978845608028654 * (mid + 0.044715 * mid * mid * mid)))
        elif gelu == "relu":
            mid = jnp.maximum(mid, 0.0)
        elif gelu == "none":
            pass
        if quant == "noclip":
            s2 = jnp.maximum(jnp.max(jnp.abs(mid), -1, keepdims=True),
                             1e-12) / 127.0
            mi = jnp.round(mid / s2).astype(jnp.int32).astype(jnp.int8)
        else:
            mi, s2 = _quant_rows(mid)
        y = jax.lax.dot_general(
            mi, wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        y = y * (s2 * wos_ref[...]) + bo_ref[...].astype(jnp.float32) + xf
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        normed = (y - mean) * jax.lax.rsqrt(var + eps)
        out_ref[...] = (
            normed * ln_scale_ref[...].astype(jnp.float32)
            + ln_bias_ref[...].astype(jnp.float32)
        ).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("block_rows", "gelu", "quant")
)
def ffn_variant(x, wi, bi, wo, bo, lns, lnb, block_rows, gelu, quant):
    m, h = x.shape
    f = wi.shape[1]
    wi_i8, wis = quant_weight_cols(wi)
    wo_i8, wos = quant_weight_cols(wo)
    bm = min(block_rows, max(32, m))
    pad = -m % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    grid = ((m + pad) // bm,)
    out = pl.pallas_call(
        make_kernel(gelu, quant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, h), lambda i: (i, 0)),
            pl.BlockSpec((h, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, h), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m + pad, h), x.dtype),
    )(x, wi_i8, wis, bi[None, :], wo_i8, wos, bo[None, :],
      lns[None, :], lnb[None, :])
    return out[:m]


def main():
    import numpy as np

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    f = int(sys.argv[3]) if len(sys.argv) > 3 else 3072
    layers = 12

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, h)) * 0.5, jnp.bfloat16)
    wi = jnp.asarray(rng.standard_normal((h, f)) * 0.03, jnp.bfloat16)
    bi = jnp.asarray(rng.standard_normal((f,)) * 0.02, jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((f, h)) * 0.03, jnp.bfloat16)
    bo = jnp.asarray(rng.standard_normal((h,)) * 0.02, jnp.bfloat16)
    lns = jnp.ones((h,), jnp.bfloat16)
    lnb = jnp.zeros((h,), jnp.bfloat16)
    log(f"[ffnv] device={jax.devices()[0].device_kind} m={m} h={h} f={f}; "
        f"int8 ideal/layer = {2 * 2 * m * h * f / 394e12 * 1e3:.3f} ms")

    variants = []
    for br in (128, 256, 512, 1024):
        variants.append((f"br{br}", br, "exact", "clip"))
    variants += [
        ("br256-tanh", 256, "tanh", "clip"),
        ("br256-relu", 256, "relu", "clip"),
        ("br256-nogelu", 256, "none", "clip"),
        ("br256-noclip", 256, "exact", "noclip"),
        ("br512-noclip", 512, "exact", "noclip"),
    ]

    base = None
    _salt = iter(range(1, 10**6))
    import jax.lax as lax

    for name, br, gelu, quant in variants:
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(x, salt0, iters: int, _br=br, _g=gelu, _q=quant):
            def body(_, carry):
                acc, salt, xc = carry
                xc = (xc + salt.astype(jnp.bfloat16) * 1e-6).astype(jnp.bfloat16)
                for _l in range(layers):
                    xc = ffn_variant(xc, wi, bi, wo, bo, lns, lnb,
                                     block_rows=_br, gelu=_g, quant=_q)
                s = jnp.sum(xc.astype(jnp.float32))
                return acc + s, (jnp.abs(s) * 7.0).astype(jnp.int32) % 5, xc
            acc, _, _ = lax.fori_loop(
                0, iters, body, (jnp.float32(0), salt0, x))
            return acc

        try:
            float(loop(x, jnp.int32(next(_salt)), iters=1))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(x, jnp.int32(next(_salt)), iters=1))
                d1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(loop(x, jnp.int32(next(_salt)), iters=5))
                d5 = time.perf_counter() - t0
                per = (d5 - d1) / 4
                best = per if best is None else min(best, per)
            ms_layer = best * 1e3 / layers
            note = ""
            if base is None and name == "br256":
                base = best
            log(f"[ffnv] {name:>14}: {best * 1e3:7.2f} ms/12L = "
                f"{ms_layer:.3f} ms/layer{note}")
        except Exception as e:  # noqa: BLE001
            log(f"[ffnv] {name:>14}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
