"""Pallas fused int8 GEMM + requant epilogue — kept as a MEASURED NEGATIVE
RESULT (see NOTES.md round-3 log; the shipped fix lives in
models/resnet_int8.int8_backbone_apply instead).

Motivation: the int8 ResNet's 1x1 convs are plain [M, K] x [K, N] int8
GEMMs, and at the four downsample joins XLA materializes one dot's s32
accumulator to HBM (~10.5 ms/batch at B=512) because an output fusion holds
at most one dot root. These kernels keep the accumulator in VMEM and write
only int8:

    out_i8 = clip(round(relu(dot_s32(x, w) * alpha + bias [+ residual]) / s))

Three epilogue shapes cover every 1x1 site of the bottleneck stack
(models/resnet_int8.int8_backbone_apply):
  * plain          — conv1 (relu) and a no-relu variant for standalone use
  * residual       — conv3 in non-downsample blocks: residual is the block
                     input, an s8 tensor with its own scale
  * dual GEMM      — conv3 in downsample blocks: the shortcut is ITSELF a
                     1x1 int8 GEMM on the (strided) block input; both
                     products meet in the f32 epilogue without leaving VMEM

Numerics are bitwise those of the XLA formulation: the MXU s8 x s8 -> s32
product is exact, and the f32 epilogue applies the same elementwise chain
(incl. the divide-by-scale, NOT a reciprocal multiply) in the same order
(tests/test_pallas_int8_gemm.py).

MEASURED OUTCOME (v5e-1, B=512 full tower, scripts/bench_int8_tower.py
--v3): 43.4 ms vs 28.9 ms for the XLA formulation. The kernels themselves
run fine, but Pallas operands must be default/row-major-layout, and XLA's
int8 conv outputs carry tiled layouts like s8[...]{3,0,2,1} — every
4D-conv <-> 2D-GEMM boundary became a relayout copy (~7.7 ms/batch of pure
copies in the trace). The shipped alternative requantizes the downsample
shortcut at its own calibrated scale so each dot owns ONE fused XLA requant
epilogue and no layout ever changes. Lesson recorded for future kernels:
interposing Pallas between XLA convs only pays if the kernel absorbs enough
work to amortize the boundary relayouts.

Would replace the torchvision bottleneck 1x1 convs the reference serves
through torch (reference backend/ml/pipelines/training_pipeline.py:157-311).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_SCALAR = pl.BlockSpec((1, 1), lambda i: (0, 0))


def _finish(acc, out_ref, relu: bool, s_out):
    if relu:
        acc = jnp.maximum(acc, 0.0)
    y = jnp.clip(jnp.round(acc / s_out), -127, 127)
    out_ref[...] = y.astype(jnp.int8)


def _plain_kernel(x_ref, w_ref, alpha_ref, bias_ref, s_ref, out_ref, *,
                  relu: bool):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    acc = acc * alpha_ref[...] + bias_ref[...]
    _finish(acc, out_ref, relu, s_ref[0, 0])


def _res_kernel(x_ref, w_ref, alpha_ref, bias_ref, res_ref, rs_ref, s_ref,
                out_ref, *, relu: bool):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    acc = acc * alpha_ref[...] + bias_ref[...]
    acc = acc + res_ref[...].astype(jnp.float32) * rs_ref[0, 0]
    _finish(acc, out_ref, relu, s_ref[0, 0])


def _dual_kernel(x1_ref, w1_ref, a1_ref, b1_ref, x2_ref, w2_ref, a2_ref,
                 b2_ref, s_ref, out_ref, *, relu: bool):
    p1 = jax.lax.dot_general(
        x1_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * a1_ref[...] + b1_ref[...]
    p2 = jax.lax.dot_general(
        x2_ref[...], w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * a2_ref[...] + b2_ref[...]
    _finish(p1 + p2, out_ref, relu, s_ref[0, 0])


def _pick_bm(m: int, k: int, n: int, extra_rows_bytes: int = 0,
             budget: int = 10 * 1024 * 1024) -> int:
    """Largest row-block that divides m, is sublane-aligned, and keeps
    x + out + f32 acc (+ caller extra per-row bytes) under the VMEM budget
    (weights/scales are grid-invariant and counted by the caller)."""
    for bm in (4096, 3584, 2048, 1792, 1024, 896, 512, 448, 256, 128, 64,
               32, 16, 8):
        if m % bm:
            continue
        per_row = k + n + 4 * n + extra_rows_bytes
        if bm * per_row <= budget:
            return bm
    return 8


def _s11(v):
    return jnp.asarray(v, jnp.float32).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("relu",))
def int8_gemm_requant(x, w, alpha, bias, s_out, *, relu: bool = True):
    """x: s8 [M, K]; w: s8 [K, N]; alpha: f32 [N] (= in_scale * w_scale);
    bias: f32 [N]; s_out: f32 scalar output scale. Returns s8 [M, N]."""
    m, k = x.shape
    n = w.shape[1]
    bm = _pick_bm(m, k, n)
    return pl.pallas_call(
        functools.partial(_plain_kernel, relu=relu),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            _SCALAR,
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
    )(x, w, alpha[None, :], bias[None, :], _s11(s_out))


@functools.partial(jax.jit, static_argnames=("relu",))
def int8_gemm_res_requant(x, w, alpha, bias, res, res_scale, s_out, *,
                          relu: bool = True):
    """Single GEMM + s8 residual: requant(relu(x@w * alpha + bias +
    res * res_scale)).  res: s8 [M, N] at scale res_scale (f32 scalar)."""
    m, k = x.shape
    n = w.shape[1]
    bm = _pick_bm(m, k, n, extra_rows_bytes=n)
    return pl.pallas_call(
        functools.partial(_res_kernel, relu=relu),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            _SCALAR,
            _SCALAR,
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
    )(x, w, alpha[None, :], bias[None, :], res, _s11(res_scale), _s11(s_out))


@functools.partial(jax.jit, static_argnames=("relu",))
def int8_gemm_dual_requant(x1, w1, alpha1, bias1, x2, w2, alpha2, bias2,
                           s_out, *, relu: bool = True):
    """Two GEMMs meeting in one epilogue: requant(relu(x1@w1*a1 + b1 +
    x2@w2*a2 + b2)) — the downsample-block conv3 + shortcut fusion."""
    m, k1 = x1.shape
    n = w1.shape[1]
    k2 = x2.shape[1]
    bm = _pick_bm(m, k1, n, extra_rows_bytes=k2 + 4 * n)
    return pl.pallas_call(
        functools.partial(_dual_kernel, relu=relu),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k1), lambda i: (i, 0)),
            pl.BlockSpec((k1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((bm, k2), lambda i: (i, 0)),
            pl.BlockSpec((k2, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
            _SCALAR,
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
    )(x1, w1, alpha1[None, :], bias1[None, :], x2, w2, alpha2[None, :],
      bias2[None, :], _s11(s_out))
