"""Pallas fused int8 ResNet bottleneck (stride-1, identity shortcut).

Third attempt at bottleneck fusion, after round 2's two negative results
(NOTES.md "Fused ResNet bottleneck"): pltpu.roll taps were VPU-bound and
flat-layout tap slices were sublane-MISALIGNED (offsets +-(W+-1) with W=56),
making every tap a relayout copy. This kernel follows the prescription that
writeup left — an aligned-stride, K-sliced implicit GEMM:

  * Activations ride a WIDTH-PADDED flat layout [H*Wp, C] with Wp a multiple
    of the int8 sublane tile (32): 56 -> 64, 28 -> 32. Junk columns are kept
    at zero (they double as the 3x3 conv's horizontal zero padding).
  * The row offsets of the 3x3 taps are then dy*Wp (= 0 mod 32, ALIGNED);
    only the dx = +-1 shifts are misaligned, and those are hoisted into TWO
    shifted copies of the conv2 input built ONCE per block (the round-2
    design paid a misaligned relayout PER TAP).
  * The nine taps concatenate along lanes into a patches matrix
    [H*Wp, 9*M], so the 3x3 conv is ONE int8 MXU GEMM with K = 9*M
    (K-sliced implicit GEMM) instead of nine K=M matmuls.
  * conv1 / conv3 are plain int8 GEMMs over the flat tile; requant epilogues
    use pre-folded multipliers (K = s_in*ws/s_out, B = b/s_out) so the VPU
    work is one FMA + relu + round per element — no divides (the FFN sweep
    showed VPU divides/exp are what stall these kernels).
  * The whole block — conv1, conv2, conv3, residual add, final relu+requant
    — runs per grid program on G whole images resident in VMEM: ONE HBM
    read of the block input and ONE write of its output, vs ~4 activation
    round-trips on the XLA path (the stage is HBM-roofline-bound; that
    traffic ratio is the entire point).

Replaces the torchvision bottleneck stack the reference serves through
torch (reference backend/ml/pipelines/training_pipeline.py:157-311) for the
stride-1 identity-shortcut blocks of the turbo tower; stride-2/projection
blocks stay on the XLA path (models/resnet_int8.int8_backbone_apply).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _requant_mask(y_f32, mask):
    """f32 -> int8 (round, saturate) with junk columns forced to zero."""
    q = jnp.clip(jnp.round(y_f32), -127, 127) * mask
    return q.astype(jnp.int32).astype(jnp.int8)


def _kernel(x_ref, w1_ref, k1_ref, b1_ref, w2_ref, k2_ref, b2_ref,
            w3_ref, k3_ref, b3_ref, kx_ref, out_ref,
            bm1_ref, b0_ref, bp1_ref, patches_ref,
            *, g: int, rows: int, wp: int, width: int):
    """One grid program: G whole images, the full bottleneck in VMEM.

    x_ref:   [G, rows, C] s8, rows = H*Wp, junk cols (x % Wp >= width) zero
    w1:      [C, M] s8     k1/b1: [1, M] f32 folded requant (see wrapper)
    w2:      [9M, M] s8    (ky, kx, cin) tap-major — matches the patches
    w3:      [M, C] s8     kx_ref: [1, 1] f32 (s_in / s_out residual fold)
    scratch: bm1/b0/bp1 [g*(rows+wp)+wp, M] s8 — conv2 input with one zero
             pad row between images, pre-shifted by dx = -1/0/+1;
             patches [g*rows, 9M] s8.
    """
    c = x_ref.shape[-1]
    m = w1_ref.shape[-1]
    stride = rows + wp  # per-image stride inside the shifted buffers

    x = x_ref[...].reshape(g * rows, c)

    # junk-column mask (doubles as SAME zero padding for the dx taps)
    col = jax.lax.broadcasted_iota(jnp.int32, (g * rows, 1), 0) % wp
    mask = (col < width).astype(jnp.float32)

    # ---- conv1 (1x1): [G*rows, C] x [C, M] ----
    a1 = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    a1 = jnp.maximum(a1 * k1_ref[...] + b1_ref[...], 0.0)
    a1 = _requant_mask(a1, mask)  # [G*rows, M] s8

    # ---- build the three dx-shifted conv2 inputs ----
    # B_dx[base_i + j] = a1_img_i[j - dx]; base_i = wp + i*stride. The dx=0
    # writes are tile-aligned; dx=+-1 are the block's ONLY misaligned copies.
    bm1_ref[...] = jnp.zeros_like(bm1_ref)
    b0_ref[...] = jnp.zeros_like(b0_ref)
    bp1_ref[...] = jnp.zeros_like(bp1_ref)
    for i in range(g):
        seg = a1[i * rows:(i + 1) * rows]
        base = wp + i * stride
        bp1_ref[base - 1:base - 1 + rows, :] = seg  # holds x shifted dx=+1
        b0_ref[base:base + rows, :] = seg
        bm1_ref[base + 1:base + 1 + rows, :] = seg  # holds x shifted dx=-1

    # ---- patches: aligned slices, lane-concat -> [G*rows, 9M] ----
    for i in range(g):
        taps = []
        for ky in range(3):  # dy = ky - 1
            start = i * stride + ky * wp  # multiple of wp (aligned)
            # kx = 0,1,2 <-> dx = -1,0,+1: bm1[idx] = a1[p-1] (dx=-1),
            # b0 = a1[p], bp1[idx] = a1[p+1] (dx=+1) — w2flat is (ky,kx,ci)
            # tap-major, so this order must match reshape(9M, M)
            for ref in (bm1_ref, b0_ref, bp1_ref):
                taps.append(ref[start:start + rows, :])
        patches_ref[i * rows:(i + 1) * rows, :] = jnp.concatenate(taps, axis=1)

    # ---- conv2 (3x3 as ONE K=9M GEMM) ----
    a2 = jax.lax.dot_general(
        patches_ref[...], w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    a2 = jnp.maximum(a2 * k2_ref[...] + b2_ref[...], 0.0)
    a2 = _requant_mask(a2, mask)  # [G*rows, M] s8

    # ---- conv3 (1x1) + residual + relu + requant ----
    y = jax.lax.dot_general(
        a2, w3_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * k3_ref[...] + b3_ref[...] + x.astype(jnp.float32) * kx_ref[0, 0]
    y = jnp.maximum(y, 0.0)
    out_ref[...] = _requant_mask(y, mask).reshape(g, rows, c)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "wp", "g", "interpret"))
def fused_bottleneck_int8(xp, w1, k1, b1, w2flat, k2, b2, w3, k3, b3, kx,
                          *, height: int, width: int, wp: int, g: int = 1,
                          interpret: bool = False):
    """Fused stride-1 identity-shortcut int8 bottleneck over padded tiles.

    xp: [B, H*Wp, C] s8 — width-padded flat images, junk cols ZERO
        (``pad_wp`` / ``unpad_wp`` convert; chained blocks stay padded).
    w1 [C, M], w2flat [9M, M] ((ky,kx,ci) tap-major), w3 [M, C]: int8.
    k*/b* [M]/[C] f32: folded requant multipliers/offsets —
        k1 = s_in*ws1/s_a1, b1 = b1/s_a1 (relu commutes with the positive
        scale, so relu(acc*k1+b1) == relu(acc*(s_in*ws1)+bias)/s_a1);
        likewise k2/b2 (scale s_a2) and k3/b3 (scale s_out);
        kx = s_in/s_out folds the identity shortcut.
    Returns [B, H*Wp, C] s8 at scale s_out, junk cols zero.
    """
    batch, rows_in, c = xp.shape
    m = w1.shape[-1]
    rows = height * wp
    assert rows_in == rows, (rows_in, height, wp)
    # width < wp STRICTLY: the zero junk columns double as the 3x3 conv's
    # horizontal SAME padding and isolate the dx=+-1 flat-index shifts
    # across row/image boundaries; wp == width would silently corrupt the
    # conv at every row edge (ADVICE r3).
    assert wp % 32 == 0 and width < wp, (wp, width)
    assert batch % g == 0, (batch, g)
    stride = rows + wp

    grid = (batch // g,)
    out = pl.pallas_call(
        functools.partial(_kernel, g=g, rows=rows, wp=wp, width=width),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, rows, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, m), lambda i: (0, 0)),
            pl.BlockSpec((1, m), lambda i: (0, 0)),
            pl.BlockSpec((1, m), lambda i: (0, 0)),
            pl.BlockSpec((9 * m, m), lambda i: (0, 0)),
            pl.BlockSpec((1, m), lambda i: (0, 0)),
            pl.BlockSpec((1, m), lambda i: (0, 0)),
            pl.BlockSpec((m, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, rows, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, rows, c), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((g * stride + wp, m), jnp.int8),
            pltpu.VMEM((g * stride + wp, m), jnp.int8),
            pltpu.VMEM((g * stride + wp, m), jnp.int8),
            pltpu.VMEM((g * rows, 9 * m), jnp.int8),
        ],
        interpret=interpret,
    )(xp, w1, k1[None, :], b1[None, :], w2flat, k2[None, :], b2[None, :],
      w3, k3[None, :], b3[None, :], jnp.asarray(kx, jnp.float32)[None, None])
    return out


def pad_wp(x_i8, wp: int):
    """[B, H, W, C] s8 -> width-padded flat [B, H*Wp, C], junk cols zero.

    XLA-side; fuses into the producing requant epilogue (pad-of-zero is an
    output fusion) so entering a fused segment costs one slightly-wider
    write, not an extra round-trip.
    """
    b, h, w, c = x_i8.shape
    x_i8 = jnp.pad(x_i8, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
    return x_i8.reshape(b, h * wp, c)


def unpad_wp(xp_i8, height: int, width: int, wp: int):
    """Inverse of ``pad_wp`` (the slice fuses into the consumer)."""
    b = xp_i8.shape[0]
    return xp_i8.reshape(b, height, wp, -1)[:, :, :width, :]


def fold_block_epilogues(d, s_in, s1, s2, s_out):
    """Fold a stride-1 block's requant chain into kernel args.

    d: quantize_backbone's per-block tree ({conv1,conv2,conv3} each with
    int8 "w", f32 "ws" [co], f32 "b" [co]); s_in/s1/s2/s_out: the block's
    calibrated activation scales (input, post-conv1-relu, post-conv2-relu,
    block output). Relu commutes with the positive 1/s scale, so
    relu(acc*(s*ws) + b)/s_next == relu(acc*K + B) with K = s*ws/s_next,
    B = b/s_next — one fused FMA per element in the kernel, no divides.
    """
    c1, c2, c3 = d["conv1"], d["conv2"], d["conv3"]
    m = c1["w"].shape[-1]
    w2flat = c2["w"].reshape(9 * m, m)  # (ky, kx, ci) tap-major
    return dict(
        w1=c1["w"][0, 0], k1=c1["ws"] * (s_in / s1), b1=c1["b"] / s1,
        w2flat=w2flat, k2=c2["ws"] * (s1 / s2), b2=c2["b"] / s2,
        w3=c3["w"][0, 0], k3=c3["ws"] * (s2 / s_out), b3=c3["b"] / s_out,
        kx=s_in / s_out,
    )
