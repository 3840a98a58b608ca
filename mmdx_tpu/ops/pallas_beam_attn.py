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

NEG_INF = -1e9

# sweep overrides (scripts/bench_beam_attn_kernel.py); None = auto
_FORCE_GB = None
_FORCE_VMEM_MB = None


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_decode_attention(q, kv, mask, bias, interpret: bool = False):
    """q [B, nb, h*d], kv [B, K, 2*h*d] (flat, position-major, K rows packed
    as k|v in the minor dim — ONE buffer so the decode step issues one
    dynamic_update_slice instead of two), mask [B, nb, K] f32 additive
    (0 / -inf), bias [h, K] f32 additive -> ctx [B, nb, h*d].

    Contraction is per head: out[b, i, h*d:h*d+d] = softmax_k(q_h . k_h + bias
    [h] + mask[b, i]) . v_h.  dtype of q/kv is preserved (softmax in f32).
    """
    b, nb, hd2 = kv.shape[0], q.shape[1], kv.shape[2]
    hd = hd2 // 2
    _, kk, _ = kv.shape
    h = bias.shape[0]
    d = hd // h
    assert h * d == hd, (h, d, hd)

    def kernel(q_ref, kv_ref, mask_ref, bias_ref, out_ref):
        gb = q_ref.shape[0]
        rq, rk = gb * nb, gb * kk
        # nb=1 (flat greedy): q/mask/out ride as 2D blocks (unit beam dim
        # dropped at the wrapper) — Mosaic rejects every singleton-middle-dim
        # shape cast ([gb,64]<->[gb,1,64]) whether from reshape, scalar
        # indexing, or the store, so the kernel must never see rank 3
        q_all = q_ref[...] if nb == 1 else q_ref[...].reshape(rq, hd)
        kv_all = kv_ref[...].reshape(rk, 2 * hd)
        k_all = kv_all[:, :hd]
        v_all = kv_all[:, hd:]
        # block-diagonal sample mask + per-sample ancestry mask, tiled so
        # diagonal blocks line up (off-diagonal contributions are -inf and
        # vanish in the softmax — exact per-sample attention)
        if gb > 1:
            row_g = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 0) // nb
            col_g = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 1) // kk
            bd = jnp.where(row_g == col_g, 0.0, NEG_INF)
            msk = mask_ref[...] if nb == 1 else mask_ref[...].reshape(rq, kk)
            m = bd + jnp.tile(msk, (1, gb))
        else:
            m = mask_ref[...] if nb == 1 else mask_ref[...].reshape(rq, kk)
        for hi in range(h):
            qh = q_all[:, hi * d:(hi + 1) * d]  # [rq, d]
            kh = k_all[:, hi * d:(hi + 1) * d]  # [rk, d]
            vh = v_all[:, hi * d:(hi + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rq, rk]
            s = s + jnp.tile(bias_ref[hi:hi + 1, :], (1, rk // kk)) + m
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
            ctx = jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rq, d]
            if nb == 1:
                out_ref[:, hi * d:(hi + 1) * d] = ctx.astype(out_ref.dtype)
            else:
                out_ref[:, :, hi * d:(hi + 1) * d] = (
                    ctx.astype(out_ref.dtype).reshape(gb, nb, d)
                )

    # gb = samples per grid program, packed along BOTH score axes (same
    # trick as ops/pallas_bert_attn): nb=4-row dots per sample left the
    # kernel latency-bound (~58% of HBM bw, and per-program time barely
    # scaled with K under segmented decode); packing gives [gb*nb, gb*K]
    # MXU-shaped tiles. FLOP waste is gb-fold on an op that is ~1% FLOPs.
    # gb=2 preferred: on-chip sweep at the 8-aligned kk=728 cache reads
    # 777 GB/s at gb=2 vs 702/709 at gb=4/8 (scripts/
    # bench_beam_attn_kernel.py, /tmp/sweep728.log round 3).
    gb = _pick_gb(b, kk, hd, nb=nb)
    vmem_mb = _FORCE_VMEM_MB or 48
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    if nb == 1:  # 2D q/mask/out blocks (see kernel note)
        q_spec = pl.BlockSpec((gb, hd), lambda i: (i, 0))
        mask_spec = pl.BlockSpec((gb, kk), lambda i: (i, 0))
        out_spec = pl.BlockSpec((gb, hd), lambda i: (i, 0))
        out_shape = jax.ShapeDtypeStruct((b, hd), q.dtype)
        q_in, mask_in = q.reshape(b, hd), mask.reshape(b, kk)
    else:
        q_spec = pl.BlockSpec((gb, nb, hd), lambda i: (i, 0, 0))
        mask_spec = pl.BlockSpec((gb, nb, kk), lambda i: (i, 0, 0))
        out_spec = pl.BlockSpec((gb, nb, hd), lambda i: (i, 0, 0))
        out_shape = jax.ShapeDtypeStruct((b, nb, hd), q.dtype)
        q_in, mask_in = q, mask
    out = pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            q_spec,
            pl.BlockSpec((gb, kk, 2 * hd), lambda i: (i, 0, 0)),
            mask_spec,
            full((h, kk)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        # in+out double-buffers exceed the 16MB default scoped cap at gb>2;
        # sample blocks are independent -> parallel grid semantics (lets
        # Mosaic overlap program i+1's DMA with program i's compute)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q_in, kv, mask_in, bias)
    return out.reshape(b, nb, hd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_decode_attention_partial(q, kv, mask, bias, interpret: bool = False):
    """``beam_decode_attention`` returning UN-normalized softmax partials so
    the current step's own-token contribution can compose OUTSIDE the kernel:

      acc [B, nb, h*d] f32 = sum_k exp(s_k - m) . v_k   (over CACHE rows)
      m   [B, nb, h]   f32 = max_k s_k
      l   [B, nb, h]   f32 = sum_k exp(s_k - m)

    with s = q_h . k_h + bias + mask. Full attention including the current
    token is then  ctx = (acc*e^(m-m') + e^(s_own-m') v_new) / (l*e^(m-m') +
    e^(s_own-m')),  m' = max(m, s_own).

    Why: reading the OLD cache here lets the step's 6 per-layer cache
    dynamic-update-slices move OFF the serial qkv->attention critical path
    (each exposed ~17 us/step of DMA latency in the round-5 trace while the
    isolated op costs 0.6 us). The caller masks the own column to -inf
    (every masked column contributes exp(-1e9-m) == 0 exactly in f32, so a
    fully-masked first step yields acc=0, l=0 and the composition reduces to
    ctx = v_new). nb >= 2 only (the greedy nb=1 2D form keeps in-kernel
    writes).
    """
    b, nb, hd2 = kv.shape[0], q.shape[1], kv.shape[2]
    hd = hd2 // 2
    _, kk, _ = kv.shape
    h = bias.shape[0]
    d = hd // h
    assert h * d == hd, (h, d, hd)
    assert nb >= 2, "partial variant is for beam (nb>=2)"

    def kernel(q_ref, kv_ref, mask_ref, bias_ref, acc_ref, ml_ref):
        gb = q_ref.shape[0]
        rq, rk = gb * nb, gb * kk
        q_all = q_ref[...].reshape(rq, hd)
        kv_all = kv_ref[...].reshape(rk, 2 * hd)
        k_all = kv_all[:, :hd]
        v_all = kv_all[:, hd:]
        if gb > 1:
            row_g = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 0) // nb
            col_g = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 1) // kk
            bd = jnp.where(row_g == col_g, 0.0, NEG_INF)
            m_msk = bd + jnp.tile(mask_ref[...].reshape(rq, kk), (1, gb))
        else:
            m_msk = mask_ref[...].reshape(rq, kk)
        cols = []
        for hi in range(h):
            qh = q_all[:, hi * d:(hi + 1) * d]
            kh = k_all[:, hi * d:(hi + 1) * d]
            vh = v_all[:, hi * d:(hi + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s + jnp.tile(bias_ref[hi:hi + 1, :], (1, rk // kk)) + m_msk
            mr = jnp.max(s, axis=-1, keepdims=True)  # [rq, 1]
            e = jnp.exp(s - mr)
            lr = jnp.sum(e, axis=-1, keepdims=True)  # [rq, 1]
            acc = jax.lax.dot_general(
                e.astype(q_ref.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rq, d] f32
            acc_ref[:, :, hi * d:(hi + 1) * d] = acc.reshape(gb, nb, d)
            cols.append(mr)
            cols.append(lr)
        # ml layout: [gb, nb, 2h] with column 2*hi = m_h, 2*hi+1 = l_h
        ml = jnp.concatenate(cols, axis=-1)  # [rq, 2h]
        ml_ref[...] = ml.reshape(gb, nb, 2 * h)

    # the partial kernel prefers LARGER sample packing than the in-kernel-
    # write variant: on-chip sweep at serving shape (kk=728) measured 239.1 /
    # 248.9 / 254-260 reports/s at gb=2/4/8 (gb=16 flat vs 8) — the extra
    # f32 acc/ml output DMA amortizes over more rows
    gb = _pick_gb(b, kk, hd, nb=nb, prefer_rows=32)
    vmem_mb = _FORCE_VMEM_MB or 48
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    acc, ml = pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, nb, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, kk, 2 * hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, nb, kk), lambda i: (i, 0, 0)),
            full((h, kk)),
        ],
        out_specs=[
            pl.BlockSpec((gb, nb, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, nb, 2 * h), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nb, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, 2 * h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q, kv, mask, bias)
    m = ml[..., 0::2]
    l = ml[..., 1::2]
    return acc, m, l


def _pick_gb(b: int, kk: int, hd: int, itemsize: int = 2, nb: int = 4,
             prefer_rows: int = 8) -> int:
    # target gb*nb ~ prefer_rows query rows per dot. The in-kernel-write
    # kernel prefers 8 rows (gb=2 at nb=4, on-chip sweep round 3); the
    # partial variant prefers 32 (gb=8 — see beam_decode_attention_partial).
    if _FORCE_GB:
        return _FORCE_GB
    first = max(1, prefer_rows // max(nb, 1))
    order = [first] + [g for g in (2, 4, 8, 1) if g != first]
    return next(g for g in order
                if b % g == 0
                and g * kk * hd * 2 * itemsize <= 12 * 2**20)


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_decode_attention_int8(q, kv, kvs, mask, bias, interpret: bool = False):
    """int8-KV-cache variant of ``beam_decode_attention``.

    kv [B, K, 2*h*d] int8 (per-row, per-head quantized K|V), kvs [B, 2*h, K]
    f32 per-(row, head) dequant scales (rows 0..h-1 = K scales, h..2h-1 = V
    scales); q/mask/bias as in the bf16 kernel. The cache — the beam step's
    dominant HBM stream, re-read per layer per step — moves at HALF the
    bytes; dequantization happens after the DMA:

      scores_h = (q_h . k_i8_h) * sk[row]   (scale folds out of the dot:
                                             it is constant per key row)
      ctx_h    = (softmax * sv[row]) . v_i8_h  (same trick on the V side)

    int8 values are exactly representable in bf16, so the casts are lossless;
    the only deviation from the bf16 kernel is the quantization itself
    (bounded in tests/test_kv_int8.py).
    """
    b, nb, hd2 = kv.shape[0], q.shape[1], kv.shape[2]
    hd = hd2 // 2
    _, kk, _ = kv.shape
    h = bias.shape[0]
    d = hd // h
    assert h * d == hd, (h, d, hd)
    assert kvs.shape == (b, 2 * h, kk), (kvs.shape, (b, 2 * h, kk))

    def kernel(q_ref, kv_ref, s_ref, mask_ref, bias_ref, out_ref):
        gb = q_ref.shape[0]
        rq, rk = gb * nb, gb * kk
        # nb=1: q/mask/out are 2D blocks (see bf16 kernel note)
        q_all = q_ref[...] if nb == 1 else q_ref[...].reshape(rq, hd)
        # int8 -> bf16 via int32 (Mosaic has no direct small-int -> float)
        kv_all = kv_ref[...].reshape(rk, 2 * hd).astype(jnp.int32).astype(
            q_ref.dtype)
        k_all = kv_all[:, :hd]
        v_all = kv_all[:, hd:]
        if gb > 1:
            row_g = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 0) // nb
            col_g = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 1) // kk
            bd = jnp.where(row_g == col_g, 0.0, NEG_INF)
            msk = mask_ref[...] if nb == 1 else mask_ref[...].reshape(rq, kk)
            m = bd + jnp.tile(msk, (1, gb))
        else:
            m = mask_ref[...] if nb == 1 else mask_ref[...].reshape(rq, kk)
        for hi in range(h):
            qh = q_all[:, hi * d:(hi + 1) * d]
            kh = k_all[:, hi * d:(hi + 1) * d]
            vh = v_all[:, hi * d:(hi + 1) * d]
            # per-key scale rows, laid out along the packed rk axis; the
            # block-diagonal mask kills cross-sample terms, so only the
            # in-sample (correct) scales ever matter
            sk = jnp.concatenate(
                [s_ref[g, hi:hi + 1, :] for g in range(gb)], axis=-1)
            sv = jnp.concatenate(
                [s_ref[g, h + hi:h + hi + 1, :] for g in range(gb)], axis=-1)
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sk
            s = s + jnp.tile(bias_ref[hi:hi + 1, :], (1, rk // kk)) + m
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = ((e / jnp.sum(e, axis=-1, keepdims=True)) * sv).astype(
                q_ref.dtype)
            ctx = jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if nb == 1:
                out_ref[:, hi * d:(hi + 1) * d] = ctx.astype(out_ref.dtype)
            else:
                out_ref[:, :, hi * d:(hi + 1) * d] = (
                    ctx.astype(out_ref.dtype).reshape(gb, nb, d)
                )

    gb = _pick_gb(b, kk, hd, itemsize=1, nb=nb)
    vmem_mb = _FORCE_VMEM_MB or 48
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    if nb == 1:  # 2D q/mask/out blocks (see bf16 kernel note)
        q_spec = pl.BlockSpec((gb, hd), lambda i: (i, 0))
        mask_spec = pl.BlockSpec((gb, kk), lambda i: (i, 0))
        out_spec = pl.BlockSpec((gb, hd), lambda i: (i, 0))
        out_shape = jax.ShapeDtypeStruct((b, hd), q.dtype)
        q_in, mask_in = q.reshape(b, hd), mask.reshape(b, kk)
    else:
        q_spec = pl.BlockSpec((gb, nb, hd), lambda i: (i, 0, 0))
        mask_spec = pl.BlockSpec((gb, nb, kk), lambda i: (i, 0, 0))
        out_spec = pl.BlockSpec((gb, nb, hd), lambda i: (i, 0, 0))
        out_shape = jax.ShapeDtypeStruct((b, nb, hd), q.dtype)
        q_in, mask_in = q, mask
    out = pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            q_spec,
            pl.BlockSpec((gb, kk, 2 * hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((gb, 2 * h, kk), lambda i: (i, 0, 0)),
            mask_spec,
            full((h, kk)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(q_in, kv, kvs, mask_in, bias)
    return out.reshape(b, nb, hd)
