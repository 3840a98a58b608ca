"""Pallas flash-style attention: blockwise online-softmax, fp32 accumulators.

Keeps the [L, L] score tile in VMEM (XLA's unfused path materializes the full
[B, H, L, L] probability tensor in HBM — at serving batch 256 x 12 heads x 96
tokens that is ~100MB of traffic per tower pass) and scales to long sequences
by iterating key blocks with the online-softmax recurrence, so sequence caps
are configuration, not architecture (SURVEY §5).

API: ``flash_attention(q, k, v, bias)`` over [B, H, L, D] with an additive
bias broadcastable to [B, H, Lq, Lk] (padding and/or causal masks are encoded
in the bias, matching models/bert.py and models/t5.py conventions).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, block_k: int,
                  scale: float):
    """Grid (BH, q_blocks). q [1, Lq_blk, D]; k/v [1, Lk, D]; bias [1, Lq_blk, Lk]."""
    q = q_ref[0].astype(jnp.float32) * scale  # [Lq, D]
    lk = k_ref.shape[1]
    lq, d = q.shape
    n_blocks = pl.cdiv(lk, block_k)

    def body(i, carry):
        acc, m, denom = carry
        start = i * block_k
        k_blk = k_ref[0, pl.ds(start, block_k), :].astype(jnp.float32)  # [bk, D]
        v_blk = v_ref[0, pl.ds(start, block_k), :].astype(jnp.float32)
        b_blk = bias_ref[0, :, pl.ds(start, block_k)].astype(jnp.float32)  # [Lq, bk]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + b_blk  # [Lq, bk]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m - m_new)
        denom = denom * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, denom

    acc = jnp.zeros((lq, d), jnp.float32)
    m0 = jnp.full((lq, 1), NEG_INF, jnp.float32)
    denom0 = jnp.zeros((lq, 1), jnp.float32)
    acc, _, denom = jax.lax.fori_loop(0, n_blocks, body, (acc, m0, denom0))
    out_ref[0] = (acc / denom).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "scale"))
def flash_attention(q, k, v, bias, block_q: int = 128, block_k: int = 128,
                    scale: float = 1.0):
    """q,k,v: [B, H, L, D]; bias: [B or 1, H or 1, Lq, Lk] additive.

    Returns [B, H, Lq, D] in q.dtype. ``scale`` multiplies q (use
    1/sqrt(head_dim) for BERT-style scaling; T5 uses 1.0).
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bias = jnp.broadcast_to(bias, (b, h, lq, lk))

    # pad ragged dims: query rows are junk-computed then cropped; padded keys
    # are masked to -inf via the bias so they never contribute
    block_q_eff = min(block_q, lq)
    block_k_eff = min(block_k, lk)
    lq_pad = -lq % block_q_eff
    lk_pad = -lk % block_k_eff
    if lq_pad or lk_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, lq_pad), (0, lk_pad)),
                       constant_values=NEG_INF)
        out = flash_attention(q, k, v, bias, block_q=block_q, block_k=block_k,
                              scale=scale)
        return out[:, :, :lq, :]
    bh = b * h
    q2 = q.reshape(bh, lq, d)
    k2 = k.reshape(bh, lk, d)
    v2 = v.reshape(bh, lk, d)
    bias2 = bias.reshape(bh, lq, lk)

    block_q = min(block_q, lq)
    block_k = min(block_k, lk)
    grid = (bh, pl.cdiv(lq, block_q))

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, lk), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
    )(q2, k2, v2, bias2)
    return out.reshape(b, h, lq, d)
