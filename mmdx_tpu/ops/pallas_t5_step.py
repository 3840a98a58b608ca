"""Pallas fused cross-attention + FFN half of the T5 decoder step.

The beam/greedy decode step's non-self-attention work — cross_ln ->
cross-attention over the K=4 synthetic encoder tokens -> residual -> ffn_ln
-> 2048-wide ReLU FFN -> residual — lowers through XLA to ~20 tiny ops per
layer per step ([N, 512] dots, [N, 8, 4] batched matvecs, RMSNorm fusions,
layout copies), each paying fixed issue overhead: ~290 us/step of the beam
budget and a similar share of greedy's (round-3 device trace; the reference's
serving hot loop, reference backend/ml/pipelines/inference_pipeline.py:190).
All operands for a whole layer fit VMEM (~9 MB: 5 MB weights + 2 MB cross
K/V + activations), so this kernel runs the entire chain as ONE program —
one dispatch instead of ~20, with every intermediate VMEM-resident.

Mosaic's vector layout inference rejects reshapes that split/merge the LANE
dim ([N, h*d] -> [N, h, d]), so the per-head split uses static minor-dim
slices and the per-sample cross-attention is packed as ONE block-diagonal
[N, N*K] score matmul per head (off-diagonal entries are -inf and vanish in
the softmax — exactly the ops/pallas_beam_attn trick). K/V arrive
pre-flattened [N*K, h*d] and the encoder bias as a [1, N*K] row so no
in-kernel reshape ever touches the lane dim.

Numerics mirror the XLA path closely (T5 RMSNorm's f32 variance + bf16
cast-before-scale quirk, f32 softmax, f32 dot accumulation with bf16
outputs); score dots run on the MXU instead of a VPU multiply-reduce, so
results can differ at ulp level — bounded by tests/test_pallas_t5_step.py
and the token-parity fuzz with the flag enabled.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _rmsnorm(x, scale, eps, dtype):
    """T5 RMSNorm exactly as models/t5.RMSNorm: f32 variance, y cast to the
    compute dtype BEFORE the (f32) scale multiply, result cast back."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = (x32 * jax.lax.rsqrt(var + eps)).astype(dtype)
    return (scale * y.astype(jnp.float32)).astype(dtype)


def _dot(a, b, dtype):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dtype)


def _kernel(h_ref, cls_ref, wq_ref, woc_ref, ck_ref, cv_ref, bias_ref,
            fls_ref, wi_ref, wof_ref, out_ref, ctx_ref, *, heads: int,
            kk: int, eps: float):
    n, dm = h_ref.shape
    d = dm // heads
    dtype = h_ref.dtype
    x = h_ref[...]

    # ---- cross-attention sublayer ----
    y = _rmsnorm(x, cls_ref[...], eps, dtype)
    q = _dot(y, wq_ref[...], dtype)  # [n, dm]
    # block-diagonal sample mask: query row i may only see key rows
    # [i*kk, (i+1)*kk). bias_ref's column j already holds sample j//kk's
    # additive encoder mask for key j%kk, i.e. the right value on every
    # diagonal block.
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n * kk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n * kk), 1) // kk
    m = jnp.where(row == col, 0.0, NEG_INF) + bias_ref[...]
    for hi in range(heads):
        sl = slice(hi * d, (hi + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], ck_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n, n*kk]
        s = s + m
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        ctx_ref[:, sl] = _dot(p, cv_ref[:, sl], dtype)
    x = x + _dot(ctx_ref[...], woc_ref[...], dtype)

    # ---- FFN sublayer ----
    y = _rmsnorm(x, fls_ref[...], eps, dtype)
    hmid = jnp.maximum(_dot(y, wi_ref[...], dtype), 0)
    out_ref[...] = x + _dot(hmid, wof_ref[...], dtype)


@functools.partial(jax.jit, static_argnames=("heads", "eps", "interpret"))
def cross_ffn_block(hidden, cross_ln_scale, wq, wo_c, ck, cv, enc_bias,
                    ffn_ln_scale, wi, wo_f, heads: int, eps: float = 1e-6,
                    interpret: bool = False):
    """hidden [N, D]; cross_ln_scale/ffn_ln_scale f32 [D]; wq/wo_c [D, D];
    ck/cv [N, K, D] (cross K/V, head-major minor dim); enc_bias f32 [N, K]
    additive; wi [D, d_ff]; wo_f [d_ff, D]. Returns the layer output [N, D]:
    FFN(residual(cross_attention(hidden))).
    """
    n, dm = hidden.shape
    kk = ck.shape[1]
    dff = wi.shape[1]
    dt = hidden.dtype
    full2 = lambda a, b: pl.BlockSpec((a, b), lambda: (0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, kk=kk, eps=eps),
        in_specs=[
            full2(n, dm),
            full2(1, dm),
            full2(dm, dm),
            full2(dm, dm),
            full2(n * kk, dm),
            full2(n * kk, dm),
            full2(1, n * kk),
            full2(1, dm),
            full2(dm, dff),
            full2(dff, dm),
        ],
        out_specs=full2(n, dm),
        out_shape=jax.ShapeDtypeStruct((n, dm), dt),
        scratch_shapes=[pltpu.VMEM((n, dm), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(hidden.astype(dt), cross_ln_scale[None, :].astype(jnp.float32),
      wq.astype(dt), wo_c.astype(dt),
      ck.astype(dt).reshape(n * kk, dm), cv.astype(dt).reshape(n * kk, dm),
      enc_bias.astype(jnp.float32).reshape(1, n * kk),
      ffn_ln_scale[None, :].astype(jnp.float32),
      wi.astype(dt), wo_f.astype(dt))
