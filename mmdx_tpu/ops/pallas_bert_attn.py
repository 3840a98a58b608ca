"""Pallas fused BERT attention block for short (bucketed) sequences.

The serving text tower runs at pad buckets 32-96 where XLA's attention is
pathological: scores [B, heads, L, L] put L in the lane dim (32 lanes of a
128-lane tile -> 4x padded traffic) and the QKV/scores/softmax/ctx/out chain
round-trips HBM repeatedly — measured 16.5 ms of the 78 ms classify budget
at B=512, L=32 (round-2 device trace), for an op whose true FLOPs are
trivial. The generic flash kernel (ops/pallas_attention.py) is wrong here
too: its (B*heads, 1) grid at L=32 is 6k+ tiny programs.

This kernel fuses the ENTIRE attention block

    LayerNorm(x + (softmax(QK^T / sqrt(d) + mask) V) Wo + bo)

with one HBM read of x and one write of the output per layer:

  * G = R//L images are packed per grid program (R ~ 512 rows), so the QKV
    projection is ONE [R, H] x [H, 3H] MXU matmul with the merged weights
    VMEM-resident across the whole grid;
  * per head, scores for ALL G images are ONE [R, d] x [d, R] -> [R, R]
    matmul with a block-diagonal additive mask (rows may only attend within
    their own image) — G-fold FLOP waste on an op that is ~1% of the
    budget, in exchange for MXU-shaped [R, R] tiles instead of [L, L];
  * the key-padding mask rides in as an additive [R] vector (0 / -1e9);
  * f32 softmax/accumulators, bf16 tiles — same numerics as the XLA path
    (parity-tested in tests/test_pallas_bert_attn.py).

Replaces the reference's BertSelfAttention+SelfOutput torch modules
(reference backend/ml/pipelines/training_pipeline.py:348-508 delegates to HF
BERT) on the TPU fast path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


def _kernel(x_ref, kmask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
            lns_ref, lnb_ref, out_ref, *, seq_len: int, num_heads: int,
            head_dim: int, eps: float):
    r, hidden = x_ref.shape
    x = x_ref[...]
    qkv = jnp.dot(x, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)  # [R, 3H]

    # block-diagonal image mask + key-padding mask (additive, f32)
    row_img = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // seq_len
    col_img = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // seq_len
    mask = jnp.where(row_img == col_img, 0.0, NEG_INF)
    mask = mask + kmask_ref[...].astype(jnp.float32)  # [1, R] broadcast

    scale = 1.0 / float(head_dim) ** 0.5
    ctx_heads = []
    for h in range(num_heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, hidden + h * head_dim:hidden + (h + 1) * head_dim]
        v = qkv[:, 2 * hidden + h * head_dim:2 * hidden + (h + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + mask  # [R, R]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        ctx_heads.append(jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype))  # [R, d]
    ctx = jnp.concatenate(ctx_heads, axis=1)  # [R, H]

    out = jnp.dot(ctx, wo_ref[...], preferred_element_type=jnp.float32)
    y = x.astype(jnp.float32) + out + bo_ref[...].astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    y = (y - mu) * jax.lax.rsqrt(var + eps)
    y = y * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    out_ref[...] = y.astype(out_ref.dtype)


def _kernel_int8(x_ref, kmask_ref, wqkv_ref, wqkvs_ref, bqkv_ref, wo_ref,
                 wos_ref, bo_ref, lns_ref, lnb_ref, out_ref, *, seq_len: int,
                 num_heads: int, head_dim: int, eps: float):
    """int8-matmul variant: the QKV and output projections (97% of the
    block's true FLOPs) run int8 x int8 -> int32 on the MXU with per-row
    dynamic activation scales and per-channel weight scales; the tiny
    scores/softmax/ctx chain stays bf16/f32 exactly as in ``_kernel``."""
    from mmdx_tpu.ops.pallas_ffn import _quant_rows

    r, hidden = x_ref.shape
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    xi, sx = _quant_rows(xf)
    qkv = jax.lax.dot_general(
        xi, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    qkv = (qkv * (sx * wqkvs_ref[...])
           + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)  # [R, 3H]

    row_img = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) // seq_len
    col_img = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1) // seq_len
    mask = jnp.where(row_img == col_img, 0.0, NEG_INF)
    mask = mask + kmask_ref[...].astype(jnp.float32)  # [1, R] broadcast

    scale = 1.0 / float(head_dim) ** 0.5
    ctx_heads = []
    for h in range(num_heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, hidden + h * head_dim:hidden + (h + 1) * head_dim]
        v = qkv[:, 2 * hidden + h * head_dim:2 * hidden + (h + 1) * head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + mask  # [R, R]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        ctx_heads.append(jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))  # [R, d] f32
    ctx = jnp.concatenate(ctx_heads, axis=1)  # [R, H]

    ci, sc = _quant_rows(ctx)
    out = jax.lax.dot_general(
        ci, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = xf + out * (sc * wos_ref[...]) + bo_ref[...].astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    y = (y - mu) * jax.lax.rsqrt(var + eps)
    y = y * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    out_ref[...] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seq_len", "num_heads", "eps",
                                             "int8_matmuls", "interpret"))
def fused_attention_block(x, kmask, wqkv, bqkv, wo, bo, ln_scale, ln_bias,
                          seq_len: int, num_heads: int, eps: float = 1e-12,
                          int8_matmuls: bool = False, interpret: bool = False):
    """x: [B*L, H] (L = seq_len); kmask: [B*L] f32 additive key-padding mask
    (0 valid / -1e9 pad); wqkv: [H, 3H] (q|k|v column blocks, head-major
    within each); returns LayerNorm(x + attention(x) Wo + bo) as [B*L, H].
    """
    import math

    m, hidden = x.shape
    head_dim = hidden // num_heads
    assert m % seq_len == 0, (m, seq_len)
    # R must be a multiple of seq_len (whole images per block) AND of 128
    # (the kmask block's lane dim). Larger R = better-shaped projection
    # matmuls but quadratically more block-diagonal score waste ([R, R] vs
    # G*[L, L]); on-chip sweep (scripts/bench_bert_attn_rows.py, v5e-1,
    # B=512 L=32): R=128 6.86ms/12 layers, 256 7.03, 384 9.41, 512 9.40,
    # 768 11.0 — score waste dominates, so default to the smallest legal R.
    # MMDX_BERT_ATTN_ROWS retargets it.
    import os

    target = int(os.environ.get("MMDX_BERT_ATTN_ROWS", "128"))
    base = math.lcm(seq_len, 128)
    r = base * max(1, target // base)
    pad = -m % r
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        # padded junk rows attend within their own junk block; keys valid (0)
        # so their softmax stays finite — outputs are cropped anyway
        kmask = jnp.pad(kmask, (0, pad))
    grid = ((m + pad) // r,)

    if int8_matmuls:
        from mmdx_tpu.ops.pallas_ffn import quant_weight_cols

        wqkv_i8, wqkvs = quant_weight_cols(wqkv)
        wo_i8, wos = quant_weight_cols(wo)
        out = pl.pallas_call(
            functools.partial(_kernel_int8, seq_len=seq_len,
                              num_heads=num_heads, head_dim=head_dim, eps=eps),
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
            interpret=interpret,
        )(x, kmask[None, :], wqkv_i8, wqkvs, bqkv[None, :], wo_i8, wos,
          bo[None, :], ln_scale[None, :], ln_bias[None, :])
        return out[:m]

    out = pl.pallas_call(
        functools.partial(_kernel, seq_len=seq_len, num_heads=num_heads,
                          head_dim=head_dim, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, hidden), lambda i: (i, 0)),
            pl.BlockSpec((1, r), lambda i: (0, i)),
            pl.BlockSpec((hidden, 3 * hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r, hidden), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m + pad, hidden), x.dtype),
        interpret=interpret,
    )(x, kmask[None, :], wqkv, bqkv[None, :], wo, bo[None, :],
      ln_scale[None, :], ln_bias[None, :])
    return out[:m]
