#!/usr/bin/env python
"""Attribute the fused BERT attention block's gap to its int8-MXU ideal.

Round-3 trace: 0.45 ms/layer at [16384,768], L=32, 12 heads vs ~0.22 ideal
(QKV int8 0.15 + proj 0.05 + tiny scores). Suspects: the 12-head python
loop's small-matmul latency, softmax's broadcast divide, exp cost. Variants
cloned here; production kernel untouched until a winner is measured.

Usage: python scripts/bench_attn_variants.py [batch] [seq]
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mmdx_tpu.ops.pallas_ffn import _quant_rows, quant_weight_cols

NEG_INF = -1e9


def log(s):
    print(s, file=sys.stderr, flush=True)


def make_kernel(softmax: str, *, seq_len, num_heads, head_dim, eps=1e-12):
    def kernel(x_ref, kmask_ref, wqkv_ref, wqkvs_ref, bqkv_ref, wo_ref,
               wos_ref, bo_ref, lns_ref, lnb_ref, out_ref):
        r, hidden = x_ref.shape
        x = x_ref[...]
        xf = x.astype(jnp.float32)
        xi, sx = _quant_rows(xf)
        qkv = jax.lax.dot_general(
            xi, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        qkv = (qkv * (sx * wqkvs_ref[...])
               + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)

        row_img = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // seq_len
        col_img = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // seq_len
        mask = jnp.where(row_img == col_img, 0.0, NEG_INF)
        mask = mask + kmask_ref[...].astype(jnp.float32)

        scale = 1.0 / float(head_dim) ** 0.5
        if softmax == "batched":
            # one rank-3 batched dot per phase instead of 12 small 2D dots:
            # costs two [R, H] <-> [heads, R, d] relayouts per block
            q3 = qkv[:, :hidden].reshape(r, num_heads, head_dim
                                         ).transpose(1, 0, 2)
            k3 = qkv[:, hidden:2 * hidden].reshape(r, num_heads, head_dim
                                                   ).transpose(1, 0, 2)
            v3 = qkv[:, 2 * hidden:].reshape(r, num_heads, head_dim
                                             ).transpose(1, 0, 2)
            s = jax.lax.dot_general(
                q3, k3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale + mask[None]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
            c3 = jax.lax.dot_general(
                p, v3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [heads, R, d]
            ctx = c3.transpose(1, 0, 2).reshape(r, hidden)
            ci, sc = _quant_rows(ctx)
            out = jax.lax.dot_general(
                ci, wo_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            y = xf + out * (sc * wos_ref[...]) + bo_ref[...].astype(jnp.float32)
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
            y = (y - mu) * jax.lax.rsqrt(var + eps)
            y = (y * lns_ref[...].astype(jnp.float32)
                 + lnb_ref[...].astype(jnp.float32))
            out_ref[...] = y.astype(out_ref.dtype)
            return
        ctx_heads = []
        for h in range(num_heads):
            q = qkv[:, h * head_dim:(h + 1) * head_dim]
            k = qkv[:, hidden + h * head_dim:hidden + (h + 1) * head_dim]
            v = qkv[:, 2 * hidden + h * head_dim:
                    2 * hidden + (h + 1) * head_dim]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + mask
            if softmax == "div":
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
            elif softmax == "recip":
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                p = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
                     ).astype(x.dtype)
            elif softmax == "exp2":
                LOG2E = 1.4426950408889634
                s2 = s * LOG2E
                s2 = s2 - jnp.max(s2, axis=-1, keepdims=True)
                e = jnp.exp2(s2)
                p = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
                     ).astype(x.dtype)
            elif softmax == "nomax":
                e = jnp.exp(s - 20.0)  # bound exp arg without a row reduce
                p = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
                     ).astype(x.dtype)
            ctx_heads.append(jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        ctx = jnp.concatenate(ctx_heads, axis=1)

        ci, sc = _quant_rows(ctx)
        out = jax.lax.dot_general(
            ci, wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        y = xf + out * (sc * wos_ref[...]) + bo_ref[...].astype(jnp.float32)
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        y = (y - mu) * jax.lax.rsqrt(var + eps)
        y = (y * lns_ref[...].astype(jnp.float32)
             + lnb_ref[...].astype(jnp.float32))
        out_ref[...] = y.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("seq_len", "num_heads",
                                             "rows", "softmax"))
def attn_variant(x, kmask, wqkv, bqkv, wo, bo, lns, lnb,
                 seq_len, num_heads, rows, softmax):
    import math

    m, hidden = x.shape
    head_dim = hidden // num_heads
    base = math.lcm(seq_len, 128)
    r = base * max(1, rows // base)
    pad = -m % r
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        kmask = jnp.pad(kmask, (0, pad))
    grid = ((m + pad) // r,)
    wqkv_i8, wqkvs = quant_weight_cols(wqkv)
    wo_i8, wos = quant_weight_cols(wo)
    out = pl.pallas_call(
        make_kernel(softmax, seq_len=seq_len, num_heads=num_heads,
                    head_dim=head_dim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, hidden), lambda i: (i, 0)),
            pl.BlockSpec((1, r), lambda i: (0, i)),
            pl.BlockSpec((hidden, 3 * hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r, hidden), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m + pad, hidden), x.dtype),
    )(x, kmask[None, :], wqkv_i8, wqkvs, bqkv[None, :], wo_i8, wos,
      bo[None, :], lns[None, :], lnb[None, :])
    return out[:m]


def main():
    import jax.lax as lax
    import numpy as np

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    hidden, heads, layers = 768, 12, 12
    m = batch * seq
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, hidden)) * 0.5, jnp.bfloat16)
    kmask = jnp.zeros((m,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((hidden, 3 * hidden)) * 0.03,
                       jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal((3 * hidden,)) * 0.02, jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((hidden, hidden)) * 0.03,
                     jnp.bfloat16)
    bo = jnp.asarray(rng.standard_normal((hidden,)) * 0.02, jnp.bfloat16)
    lns = jnp.ones((hidden,), jnp.bfloat16)
    lnb = jnp.zeros((hidden,), jnp.bfloat16)
    log(f"[attnv] device={jax.devices()[0].device_kind} B={batch} L={seq}")

    variants = [
        ("r128-batched", 128, "batched"),
        ("r128-div", 128, "div"),
        ("r128-recip", 128, "recip"),
        ("r128-exp2", 128, "exp2"),
        ("r128-nomax", 128, "nomax"),
        ("r256-recip", 256, "recip"),
        ("r512-recip", 512, "recip"),
    ]
    _salt = iter(range(1, 10**6))
    for name, rows, sm in variants:
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(x, salt0, iters: int, _r=rows, _s=sm):
            def body(_, carry):
                acc, salt, xc = carry
                xc = (xc + salt.astype(jnp.bfloat16) * 1e-6
                      ).astype(jnp.bfloat16)
                for _l in range(layers):
                    xc = attn_variant(xc, kmask, wqkv, bqkv, wo, bo, lns,
                                      lnb, seq_len=seq, num_heads=heads,
                                      rows=_r, softmax=_s)
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
            log(f"[attnv] {name:>12}: {best * 1e3:7.2f} ms/12L = "
                f"{best * 1e3 / layers:.3f} ms/layer")
        except Exception as e:  # noqa: BLE001
            log(f"[attnv] {name:>12}: FAILED {type(e).__name__}: "
                f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
