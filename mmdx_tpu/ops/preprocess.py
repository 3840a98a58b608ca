"""Image preprocessing: resize(256, antialias) -> center-crop(224) -> scale ->
3-channel -> ImageNet normalize.

Replicates the reference transform pipeline ``image_transfom_into_tensor``
(reference ``backend/ml/pipelines/training_pipeline.py:112-119``) in two forms:

  * ``preprocess_exact``  — host-side numpy, bit-for-bit equal to the PIL /
    torchvision pipeline on uint8 images; parity oracle + strict-parity mode.
  * ``preprocess_batch_device`` — jit-compiled on-device path for serving: the
    fused resize+crop is two MXU matmuls per image (see ops/resize.py), the
    scale/normalize folds into the matmul epilogue. Accepts a fixed-size uint8
    NHWC batch (serving canonicalizes uploads to a canonical decode size).

Outputs are NHWC float32/bfloat16 — the TPU-native conv layout. (The torch
reference uses NCHW [3,224,224]; values are identical, layout differs.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mmdx_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from mmdx_tpu.ops import resize as R


def preprocess_exact(
    img_u8: np.ndarray,
    img_size: int = 224,
    resize_size: int = 256,
    mean: tuple[float, ...] = IMAGENET_MEAN,
    std: tuple[float, ...] = IMAGENET_STD,
) -> np.ndarray:
    """uint8 [H,W] or [H,W,C] -> float32 [img_size, img_size, 3] (HWC).

    Bit-exact vs PIL resize + torchvision CenterCrop/ToTensor/Normalize.
    """
    assert img_u8.dtype == np.uint8
    h, w = img_u8.shape[:2]
    new_h, new_w = R.shorter_side_target(h, w, resize_size)
    if (new_h, new_w) != (h, w):
        img_u8 = R.resize_u8_exact(img_u8, new_h, new_w)
    top, left = R.center_crop_bounds(new_h, new_w, img_size)
    if top < 0 or left < 0 or new_h < img_size or new_w < img_size:
        # torchvision pads with zeros when the crop exceeds the image
        pad_h = max(img_size - new_h, 0)
        pad_w = max(img_size - new_w, 0)
        pads = [(pad_h // 2 + (pad_h % 2), pad_h // 2), (pad_w // 2 + (pad_w % 2), pad_w // 2)]
        if img_u8.ndim == 3:
            pads.append((0, 0))
        img_u8 = np.pad(img_u8, pads)
        new_h, new_w = img_u8.shape[:2]
        top, left = R.center_crop_bounds(new_h, new_w, img_size)
    img_u8 = img_u8[top : top + img_size, left : left + img_size]

    x = img_u8.astype(np.float32) / np.float32(255.0)
    if x.ndim == 2:
        x = x[:, :, None]
    if x.shape[-1] == 1:
        x = np.repeat(x, 3, axis=-1)
    mean_a = np.asarray(mean, dtype=np.float32)
    std_a = np.asarray(std, dtype=np.float32)
    return (x - mean_a) / std_a


@functools.partial(
    jax.jit, static_argnames=("img_size", "resize_size", "out_dtype")
)
def _preprocess_device(
    batch_u8: jax.Array,
    kh: jax.Array,
    kw: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    img_size: int,
    resize_size: int,
    out_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """[B,H,W,C] uint8 -> [B,img_size,img_size,3] normalized, via two matmuls.

    kh: [img_size, H], kw: [img_size, W] fused resize+crop matrices.
    Normalization constants are folded so the epilogue is one FMA:
      out = resized * (1/(255*std)) - mean/std
    """
    x = batch_u8.astype(jnp.float32)  # [B,H,W,C]
    # rows: [B,H,W,C] -> [B,out,W,C]
    x = jnp.einsum("bhwc,oh->bowc", x, kh, preferred_element_type=jnp.float32)
    # cols: [B,out,W,C] -> [B,out,out,C]
    x = jnp.einsum("bhwc,ow->bhoc", x, kw, preferred_element_type=jnp.float32)
    if x.shape[-1] == 1:
        x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
    scale = 1.0 / (255.0 * std)
    shift = mean / std
    return (x * scale - shift).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("img_size", "resize_size", "out_dtype")
)
def _preprocess_device_gray(
    batch_u8: jax.Array,
    kh: jax.Array,
    kw: jax.Array,
    img_size: int,
    resize_size: int,
    out_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """[B,H,W,1] uint8 -> [B,img_size,img_size,1] centered raw gray.

    Emits v = u - 0.5 with u = resized/cropped gray in [0,1] — NO channel
    broadcast and NO per-channel ImageNet normalize.  The int8 turbo stem
    consumes this directly (``resnet_int8.int8_backbone_apply``): the
    normalize + 1->3 broadcast fold into pre-summed stem weights plus a
    positional bias map, so the 3x-wider f32 tensor the broadcast used to
    materialize (round-3 trace: 308 MB / 0.9 ms at B=512) never exists.
    The 0.5 centering halves |v|'s range -> a finer int8 grid than
    quantizing the normalized tensor (amax 0.5 vs 2.64*std).
    """
    x = batch_u8.astype(jnp.float32)  # [B,H,W,1]
    x = jnp.einsum("bhwc,oh->bowc", x, kh, preferred_element_type=jnp.float32)
    x = jnp.einsum("bhwc,ow->bhoc", x, kw, preferred_element_type=jnp.float32)
    return (x * jnp.float32(1.0 / 255.0) - jnp.float32(0.5)).astype(out_dtype)


def preprocess_batch_device_gray(
    batch_u8, img_size: int = 224, resize_size: int = 256,
    out_dtype=jnp.float32,
):
    """Centered-gray on-device preprocessing for 1-channel uint8 batches.

    Pairs with the int8 tower's grayscale stem (which folds the ImageNet
    normalization); NOT interchangeable with ``preprocess_batch_device``.
    """
    b, h, w, c = batch_u8.shape
    assert c == 1, f"gray preproc needs 1-channel input, got {c}"
    kh, kw = R.fused_resize_crop_matrices(h, w, resize_size, img_size)
    return _preprocess_device_gray(
        batch_u8, jnp.asarray(kh), jnp.asarray(kw),
        img_size=img_size, resize_size=resize_size, out_dtype=out_dtype,
    )


def preprocess_batch_device(
    batch_u8,
    img_size: int = 224,
    resize_size: int = 256,
    mean: tuple[float, ...] = IMAGENET_MEAN,
    std: tuple[float, ...] = IMAGENET_STD,
    out_dtype=jnp.float32,
):
    """On-device preprocessing for a fixed-shape uint8 NHWC batch.

    The resize/crop coefficient matrices depend only on (H, W, resize_size,
    img_size); they are built host-side once per shape and cached.
    """
    b, h, w, c = batch_u8.shape
    kh, kw = R.fused_resize_crop_matrices(h, w, resize_size, img_size)
    return _preprocess_device(
        batch_u8,
        jnp.asarray(kh),
        jnp.asarray(kw),
        jnp.asarray(np.asarray(mean, np.float32)),
        jnp.asarray(np.asarray(std, np.float32)),
        img_size=img_size,
        resize_size=resize_size,
        out_dtype=out_dtype,
    )
