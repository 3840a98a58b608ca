"""Pallas beam-decode self-attention over the flat physical KV cache.

The beam decode's per-step self-attention (T5Attention.step_beam — the
reference serving hot loop's core, reference inference_pipeline.py:190) is
HBM-bound: each step must read the whole KV cache. With XLA einsums, batching
the per-head matmul over [B, K, h*d] (or [B, h, K, d]) storage makes the
compiler RELAYOUT the entire cache in HBM every step (measured: the beam step
costs ~4x the greedy step at identical cache bytes). This kernel reads the
flat cache exactly once per step and does the per-head split inside VMEM,
where relayouts are free:

  grid = (B,); one sample per program. K = nb * Lmax rows of the
  position-major cache fit VMEM whole (724 x 512 bf16 = 0.74MB), so no
  flash-style streaming is needed: per head h, q_h [nb, d] x k_h [K, d]^T
  -> scores [nb, K] (+ relative/causal bias row + ancestry mask) -> f32
  softmax -> p x v_h -> ctx_h [nb, d].

The ancestry mask rides in its compact [B, nb, K] f32 form and the bias in
[h, K]; the [B, h, nb, K] broadcast sum the XLA path materializes never
exists here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_decode_attention(q, k, v, mask, bias, interpret: bool = False):
    """q [B, nb, h*d], k/v [B, K, h*d] (flat, position-major), mask [B, nb, K]
    f32 additive (0 / -inf), bias [h, K] f32 additive -> ctx [B, nb, h*d].

    Contraction is per head: out[b, i, h*d:h*d+d] = softmax_k(q_h . k_h + bias
    [h] + mask[b, i]) . v_h.  dtype of q/k/v is preserved (softmax in f32).
    """
    b, nb, hd = q.shape
    _, kk, _ = k.shape
    h = bias.shape[0]
    d = hd // h
    assert h * d == hd, (h, d, hd)

    def kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, out_ref):
        for g in range(q_ref.shape[0]):
            m = mask_ref[g]  # [nb, K] f32
            for hi in range(h):
                qh = q_ref[g, :, hi * d:(hi + 1) * d]  # [nb, d]
                kh = k_ref[g, :, hi * d:(hi + 1) * d]  # [K, d]
                vh = v_ref[g, :, hi * d:(hi + 1) * d]
                s = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [nb, K]
                s = s + bias_ref[hi:hi + 1, :] + m
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
                ctx = jax.lax.dot_general(
                    p, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [nb, d]
                out_ref[g, :, hi * d:(hi + 1) * d] = ctx.astype(out_ref.dtype)

    # gb = samples per grid program. Measured: gb=1 wins (150 vs 142
    # reports/s e2e at gb=4) — the in-kernel sample loop serializes compute
    # behind larger DMA chunks, while the 1-sample pipeline already streams;
    # the ~58%-of-HBM-bw kernel time is softmax/VPU-bound, not grid overhead.
    gb = 1
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    return pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, nb, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, kk, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, kk, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, nb, kk), lambda i: (i, 0, 0)),
            full((h, kk)),
        ],
        out_specs=pl.BlockSpec((gb, nb, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nb, hd), q.dtype),
        # in+out double-buffers exceed the 16MB default scoped cap at gb>2
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, mask, bias)
