"""Pallas fused ResNet bottleneck block (stride-1), one image per grid step.

The early ResNet stages are HBM-bandwidth-bound: at serving batch 512 the
56x56x256 stage-1 activations are ~820MB per tensor, and the XLA op-by-op
path round-trips HBM between conv1/conv2/conv3 and the residual add
(~3.3GB per block; measured 13.1ms for stage 1, ~27% MFU, vs 83-95% for the
compute-bound stages 3-4 — see scripts/profile_components.py).

This kernel computes the whole bottleneck

    out = relu(conv3(relu(conv2(relu(conv1(x))))) + shortcut(x))

reading x once and writing out once.  One full image per grid program (a
56x56x256 bf16 image is 1.6MB — everything fits VMEM).

Layout is the key design point: all activations stay FLAT [H*W, C]
(spatial in sublanes, channels in lanes) for the whole kernel — no
reshapes, no 3D slicing (both force Mosaic relayout copies that made a
first, view-based version of this kernel slower than XLA).  The 3x3 conv
runs as 9 accumulated matmuls whose inputs are STATIC SUBLANE-OFFSET
SLICES of the flat x1 buffer written into a zero-padded VMEM scratch: tap
(dy,dx) needs x1[(y+dy)*W + (x+dx)] = xpad[P + dy*W+dx : ...+HW] with
P = W+1 (a v2 of this kernel used pltpu.roll for the taps — lane-crossing
rotates made it VPU-bound and ~17% SLOWER than XLA; static slices are
plain shifted vector loads).  Rows whose source pixel crosses an image
edge are zeroed by a per-tap destination mask computed from iota (SAME
zero padding).  BatchNorms are folded into the conv weights by the caller
(inference mode), matching the reference backbone's frozen-BN serving
semantics (reference training_pipeline.py:176-197).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, wp=None, bp=None,
                     interpret: bool = False):
    """Stride-1 bottleneck with BN pre-folded into (w, b) pairs.

    x:  [B, H, W, Cin]   (bf16/f32)
    w1: [Cin, M],  b1: [M]      (1x1 conv + folded BN1, then relu)
    w2: [3, 3, M, M], b2: [M]   (3x3 SAME conv + folded BN2, then relu)
    w3: [M, Cout], b3: [Cout]   (1x1 conv + folded BN3)
    wp/bp: optional [Cin, Cout]/[Cout] folded 1x1 projection shortcut
           (stage-1 block0); None = identity shortcut (requires Cin == Cout).
    Returns relu(main + shortcut): [B, H, W, Cout], dtype of x.
    """
    b, h, w, cin = x.shape
    m = w1.shape[1]
    cout = w3.shape[1]
    has_proj = wp is not None
    if not has_proj:
        assert cin == cout, (cin, cout)
    hw = h * w
    co_tile = min(cout, 128)
    x_flat = x.reshape(b, hw, cin)
    # [9, 1, M, M] so each tap is a clean 2D slice; tap index = (dy+1)*3+(dx+1)
    w2_flat = w2.reshape(9, 1, m, m)

    pad = w + 1  # covers the max |dy*W+dx| tap offset

    def kernel(*refs):
        if has_proj:
            (x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
             wp_ref, bp_ref, out_ref, xp_ref) = refs
        else:
            (x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
             out_ref, xp_ref) = refs
        rows = x_ref[0]  # [HW, Cin]
        x1 = jnp.dot(rows, w1_ref[...], preferred_element_type=jnp.float32)
        x1 = jnp.maximum(x1 + b1_ref[...].astype(jnp.float32), 0.0)  # [HW, M]
        # zero-padded flat scratch: taps become STATIC sublane-offset slices
        xp_ref[:pad, :] = jnp.zeros((pad, m), xp_ref.dtype)
        xp_ref[pad:pad + hw, :] = x1.astype(xp_ref.dtype)
        xp_ref[pad + hw:, :] = jnp.zeros((pad, m), xp_ref.dtype)

        # destination coordinates (for per-tap validity masks)
        r = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
        yy = r // w
        xx = r - yy * w

        acc = jnp.broadcast_to(b2_ref[...].astype(jnp.float32), (hw, m))
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                shift = dy * w + dx
                tap = xp_ref[pad + shift:pad + shift + hw, :]
                valid = ((yy + dy >= 0) & (yy + dy < h)
                         & (xx + dx >= 0) & (xx + dx < w))
                tap = jnp.where(valid, tap, 0.0)
                wtap = w2_ref[(dy + 1) * 3 + (dx + 1), 0]  # [M, M]
                acc = acc + jnp.dot(tap, wtap,
                                    preferred_element_type=jnp.float32)
        x2 = jnp.maximum(acc, 0.0).astype(x_ref.dtype)
        # conv3 + shortcut, tiled over output channels: the full-[HW, Cout]
        # f32 buffers for y and the shortcut were the VMEM peak (20.7MB > the
        # 16MB scoped limit at stage-1 shapes); per-128-lane tiles keep the
        # stack under budget with zero extra HBM traffic.
        for t0 in range(0, cout, co_tile):
            t1 = t0 + co_tile
            y = jnp.dot(x2, w3_ref[:, t0:t1], preferred_element_type=jnp.float32)
            y = y + b3_ref[:, t0:t1].astype(jnp.float32)
            if has_proj:
                sc = jnp.dot(rows, wp_ref[:, t0:t1],
                             preferred_element_type=jnp.float32)
                sc = sc + bp_ref[:, t0:t1].astype(jnp.float32)
            else:
                sc = rows[:, t0:t1].astype(jnp.float32)
            out_ref[0, :, t0:t1] = jnp.maximum(y + sc, 0.0).astype(out_ref.dtype)

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    in_specs = [
        pl.BlockSpec((1, hw, cin), lambda i: (i, 0, 0)),
        full((cin, m)), full((1, m)),
        full((9, 1, m, m)), full((1, m)),
        full((m, cout)), full((1, cout)),
    ]
    args = [x_flat, w1, b1[None], w2_flat, b2[None], w3, b3[None]]
    if has_proj:
        in_specs += [full((cin, cout)), full((1, cout))]
        args += [wp, bp[None]]

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hw, cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((hw + 2 * pad, m), x.dtype)],
        # stage-1 shapes need ~18MB of stack (in/out double-buffers + the f32
        # accumulator chain); the 16MB default scoped-vmem cap is a fraction
        # of the chip's 128MB VMEM — raise it rather than shrink the tiles
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, w, cout)


def fold_bn(kernel, scale, bias, mean, var, eps):
    """Fold an inference-mode BatchNorm into the preceding conv.

    kernel: [..., Cout] conv weights; BN params are per-Cout vectors.
    Returns (kernel * s, bias - mean * s) with s = scale / sqrt(var + eps),
    computed in f32 and cast back to the kernel dtype.
    """
    s = (scale.astype(jnp.float32)
         * jax.lax.rsqrt(var.astype(jnp.float32) + eps))
    w = kernel.astype(jnp.float32) * s
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return w.astype(kernel.dtype), b
