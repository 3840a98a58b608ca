"""Pallas fused transformer-FFN block: LN-residual + GELU MLP in one kernel.

Computes BERT's post-LN feed-forward block (models/bert.py):

    out = LayerNorm(hidden + (gelu(hidden @ Wi + bi) @ Wo + bo))

in a single kernel, tiled over rows.  The [rows, d_ff] intermediate, the
residual add, and the LayerNorm statistics all stay in VMEM — the XLA path
round-trips the d_ff intermediate (at serving batch 512 x 48 tokens x 3072
that's ~300MB of HBM traffic per layer per direction) plus separate residual
and LN passes.  Both weight matrices (~9.4MB bf16 for BERT-base) fit in VMEM
alongside a 256-row block.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf approximation (|err| < 1.5e-7).

    Mosaic has no erf/erfc lowering; this keeps the kernel's exact-GELU within
    f32 rounding of jax.nn.gelu(approximate=False).
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _gelu_tanh(x):
    """torch/HF "gelu_new" tanh approximation — one tanh instead of the
    erf chain's divide + exp (see the int8 kernel's A/B note)."""
    return 0.5 * x * (1.0 + jnp.tanh(
        0.7978845608028654 * (x + 0.044715 * x * x * x)))


def _quant_rows(xf):
    """Per-row symmetric int8 quantization of an f32 tile already in VMEM.

    Returns (int8 values, f32 [rows, 1] dequant scales). Per-row dynamic
    scales cost only a VPU reduce here (the tile never re-reads HBM — the
    objection to dynamic quantization in models/resnet_int8.py does not
    apply inside a fused kernel) and track activation ranges exactly,
    so no calibration pass or static activation scales are needed.
    """
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    # f32 -> int8 via int32: Mosaic has no direct small-int <-> float casts
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int32).astype(jnp.int8)
    return q, s


def quant_weight_cols(w):
    """Per-output-channel symmetric int8 weight quantization (host/XLA side).

    w: [in, out] -> (int8 [in, out], f32 [1, out] dequant scales). Runs
    outside the Pallas call; XLA executes it once per jit invocation
    (~microseconds against the 16k-row serving matmuls it feeds).
    """
    ws = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0,
                             keepdims=True), 1e-12) / 127.0
    wi = jnp.clip(jnp.round(w.astype(jnp.float32) / ws), -127, 127).astype(jnp.int8)
    return wi, ws


def _ffn_kernel_int8(x_ref, wi_ref, wis_ref, bi_ref, wo_ref, wos_ref, bo_ref,
                     ln_scale_ref, ln_bias_ref, out_ref, *, eps: float):
    """int8 variant: both matmuls run int8 x int8 -> int32 on the MXU (2x the
    bf16 rate on v5e) with per-row dynamic activation scales and per-channel
    weight scales; gelu/residual/LayerNorm stay f32 in VMEM."""
    x = x_ref[...]  # [BM, H]
    xf = x.astype(jnp.float32)
    xi, sx = _quant_rows(xf)
    mid = jax.lax.dot_general(
        xi, wi_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    mid = mid * (sx * wis_ref[...]) + bi_ref[...].astype(jnp.float32)
    # tanh-gelu, NOT the exact-erf gelu the bf16 kernel uses: the A-S erf's
    # divide+exp chain is the kernel's VPU serializer — on-chip A/B at
    # [16384,768]x3072 (scripts/bench_ffn_variants.py): erf 0.745 ms/layer,
    # tanh 0.426 = the no-gelu floor = 92% of the int8-MXU ideal. The tanh
    # approximation's deviation from exact gelu (<= ~3e-3 abs) is an order
    # below this kernel's own per-element int8 quantization noise, so the
    # W8A8 guardrail (tests/test_int8_text.py, rel < 0.02) is unaffected.
    mid = _gelu_tanh(mid)
    mi, sm = _quant_rows(mid)
    y = jax.lax.dot_general(
        mi, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * (sm * wos_ref[...]) + bo_ref[...].astype(jnp.float32) + xf
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    normed = (y - mean) * jax.lax.rsqrt(var + eps)
    out_ref[...] = (
        normed * ln_scale_ref[...].astype(jnp.float32)
        + ln_bias_ref[...].astype(jnp.float32)
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "eps", "interpret"))
def fused_ffn_ln_int8(x, wi, bi, wo, bo, ln_scale, ln_bias,
                      block_rows: int = 256, eps: float = 1e-12,
                      interpret: bool = False):
    """int8-matmul variant of ``fused_ffn_ln`` (same signature/semantics, W8A8
    quantization noise on the output — guardrail in tests/test_int8_text.py).

    Weights quantize per-output-channel here (outside the kernel, once per
    call); activations quantize per-row inside the kernel where the tiles
    already live in VMEM.
    """
    m, h = x.shape
    f = wi.shape[1]
    wi_i8, wis = quant_weight_cols(wi)
    wo_i8, wos = quant_weight_cols(wo)
    bm = min(block_rows, max(32, m))  # int8 sublane tile is 32
    pad = -m % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    grid = ((m + pad) // bm,)

    out = pl.pallas_call(
        functools.partial(_ffn_kernel_int8, eps=eps),
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
        interpret=interpret,
    )(x, wi_i8, wis, bi[None, :], wo_i8, wos, bo[None, :],
      ln_scale[None, :], ln_bias[None, :])
    return out[:m]


def _ffn_kernel(x_ref, wi_ref, bi_ref, wo_ref, bo_ref, ln_scale_ref, ln_bias_ref,
                out_ref, *, eps: float):
    x = x_ref[...]  # [BM, H]
    mid = jnp.dot(x, wi_ref[...], preferred_element_type=jnp.float32)
    mid = mid + bi_ref[...].astype(jnp.float32)
    mid = _gelu_exact(mid).astype(x.dtype)
    y = jnp.dot(mid, wo_ref[...], preferred_element_type=jnp.float32)
    y = y + bo_ref[...].astype(jnp.float32) + x.astype(jnp.float32)  # residual
    # LayerNorm over the feature dim, fp32 stats
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    normed = (y - mean) * jax.lax.rsqrt(var + eps)
    out_ref[...] = (
        normed * ln_scale_ref[...].astype(jnp.float32)
        + ln_bias_ref[...].astype(jnp.float32)
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "eps"))
def fused_ffn_ln(x, wi, bi, wo, bo, ln_scale, ln_bias, block_rows: int = 256,
                 eps: float = 1e-12):
    """x: [M, H] (flatten batch x seq first). Returns LayerNorm(x + MLP(x)).

    M is padded to a multiple of block_rows (junk rows computed then cropped).
    """
    m, h = x.shape
    f = wi.shape[1]
    bm = min(block_rows, max(8, m))
    pad = -m % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    grid = ((m + pad) // bm,)

    out = pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, h), lambda i: (i, 0)),
            pl.BlockSpec((h, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, h), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m + pad, h), x.dtype),
    )(x, wi, bi[None, :], wo, bo[None, :], ln_scale[None, :], ln_bias[None, :])
    return out[:m]
