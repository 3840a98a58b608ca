"""Pallas fused image-preprocessing kernel: uint8 -> resize -> crop -> normalize.

One kernel per (image, channel) replaces the XLA two-einsum path
(ops/preprocess.py): the [crop, W] intermediate between the row and column
resize passes stays in VMEM instead of round-tripping through HBM (at batch
256 / 512x512 inputs that intermediate is ~100MB of HBM traffic — pure
bandwidth waste), and the uint8->float convert + ImageNet normalize fuse into
the matmul epilogues.

Layout: channel-planar (NCHW) inside the kernel so VMEM tiles are [H, W] /
[crop, crop] planes (lane dim >= 128); the NHWC <-> NCHW transposes at the
boundary are byte-sized uint8 moves XLA fuses with neighbors.

Per grid step (one image, one output channel):
    img  u8  [H, W]     -> f32
    kh   f32 [crop, H]    (fused resize+crop row matrix, ops/resize.py)
    kwT  f32 [W, crop]    (transposed column matrix)
    tmp      [crop, W]  = kh @ img                       (MXU)
    out      [crop, crop] = (tmp @ kwT) * scale - shift  (MXU + VPU epilogue)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmdx_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from mmdx_tpu.ops import resize as R


def _preproc_kernel(scale_ref, shift_ref, img_ref, kh_ref, kwt_ref, out_ref):
    """Grid (B, 3). img block [1, 1, H, W] u8; out block [1, 1, crop, crop]."""
    c = pl.program_id(1)
    # Mosaic has no direct u8->f32 cast; widen via int32 first
    img = img_ref[0, 0].astype(jnp.int32).astype(jnp.float32)  # [H, W]
    tmp = jnp.dot(kh_ref[...], img, preferred_element_type=jnp.float32)  # [crop, W]
    res = jnp.dot(tmp, kwt_ref[...], preferred_element_type=jnp.float32)  # [crop, crop]
    out_ref[0, 0] = (res * scale_ref[0, c] - shift_ref[0, c]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("img_size", "out_dtype"))
def _preproc_pallas(batch_nchw_u8, kh, kwt, scale, shift, img_size: int, out_dtype):
    b, c, h, w = batch_nchw_u8.shape
    # grayscale broadcasts its single plane to all 3 output channels
    in_ch = (
        (lambda i, j, *_: (i, 0, 0, 0)) if c == 1 else (lambda i, j, *_: (i, j, 0, 0))
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # scale, shift -> SMEM
        grid=(b, 3),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), in_ch),
            pl.BlockSpec((img_size, h), lambda *_: (0, 0)),
            pl.BlockSpec((w, img_size), lambda *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, img_size, img_size), lambda i, j, *_: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        _preproc_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 3, img_size, img_size), out_dtype),
    )(scale, shift, batch_nchw_u8, kh, kwt)
    return jnp.transpose(out, (0, 2, 3, 1))  # back to NHWC for the conv tower


def preprocess_batch_pallas(
    batch_u8,
    img_size: int = 224,
    resize_size: int = 256,
    mean: tuple[float, ...] = IMAGENET_MEAN,
    std: tuple[float, ...] = IMAGENET_STD,
    out_dtype=jnp.float32,
):
    """Drop-in fused replacement for ops.preprocess.preprocess_batch_device.

    batch_u8: NHWC uint8 [B, H, W, 1|3] -> [B, img_size, img_size, 3] normalized.
    """
    b, h, w, c = batch_u8.shape
    kh, kw = R.fused_resize_crop_matrices(h, w, resize_size, img_size)
    scale = (1.0 / (255.0 * np.asarray(std, np.float32))).astype(np.float32)
    shift = (np.asarray(mean, np.float32) / np.asarray(std, np.float32)).astype(np.float32)
    nchw = jnp.transpose(batch_u8, (0, 3, 1, 2))
    return _preproc_pallas(
        nchw, jnp.asarray(kh), jnp.asarray(kw.T.copy()),
        jnp.asarray(scale[None, :]), jnp.asarray(shift[None, :]),
        img_size=img_size, out_dtype=out_dtype,
    )
