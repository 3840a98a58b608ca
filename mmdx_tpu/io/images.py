"""Image decode helpers (host side).

The reference decodes uploads/S3 blobs with PIL (reference
``backend/api/views.py:70``, ``training_pipeline.py:146``).  We decode to numpy
uint8 and keep grayscale as a single channel so the preprocessing pipeline can
replicate the reference's grayscale->3ch repeat (``training_pipeline.py:116``).
"""
from __future__ import annotations

import io
from typing import Union

import numpy as np

from PIL import Image


def decode_image(src: Union[bytes, bytearray, "Image.Image", np.ndarray]) -> np.ndarray:
    """Decode to uint8 [H, W] (grayscale) or [H, W, 3] (color)."""
    if isinstance(src, np.ndarray):
        assert src.dtype == np.uint8
        # same gray fast path bytes/PIL inputs take: RGB-identical arrays
        # collapse to 2-D so downstream picks the 1-channel pipeline
        if src.ndim == 3 and src.shape[-1] == 3:
            return _squeeze_gray(src)
        return src
    if isinstance(src, (bytes, bytearray)):
        img = Image.open(io.BytesIO(src))
    else:
        img = src
    if img.mode == "L":
        return np.asarray(img, dtype=np.uint8)
    if img.mode in ("I", "I;16", "I;16B", "I;16L", "F"):
        # 16/32-bit grayscale (common for radiography PNGs/TIFFs): PIL's
        # convert('RGB') truncates through an 8-bit pass, clipping every
        # pixel > 255 to white. Range-scale to uint8 instead (the reference
        # inherits the clipping bug; its sample assets are 8-bit JPEG so
        # the bit-for-bit parity target is unaffected).
        arr = np.asarray(img, dtype=np.float32)
        lo, hi = float(arr.min()), float(arr.max())
        if hi <= 255.0 and lo >= 0.0:  # 8-bit data in a wide container
            return arr.astype(np.uint8)
        scale = 255.0 / (hi - lo) if hi > lo else 0.0
        return ((arr - lo) * scale + 0.5).astype(np.uint8)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return _squeeze_gray(np.asarray(img, dtype=np.uint8))


def _squeeze_gray(arr: np.ndarray) -> np.ndarray:
    """Collapse RGB arrays whose channels are IDENTICAL to 2-D grayscale.

    Radiographs are routinely exported as RGB JPEG/PNG with R==G==B; the
    preprocessing contract treats [H, W] as 'repeat to 3 channels'
    (reference ``training_pipeline.py:116``), so the squeeze is exact — and
    it ships 3x fewer bytes over the serving host->device tunnel AND rides
    the turbo tower's folded grayscale stem (models/resnet_int8._gray_stem).
    A strided probe rejects real color images without a full-array scan.
    """
    if arr.ndim != 3 or arr.shape[-1] != 3:
        return arr
    c0, c1, c2 = arr[..., 0], arr[..., 1], arr[..., 2]
    probe = (slice(None, None, 16), slice(None, None, 16))
    if not (np.array_equal(c0[probe], c1[probe])
            and np.array_equal(c0[probe], c2[probe])):
        return arr
    if np.array_equal(c0, c1) and np.array_equal(c0, c2):
        return np.ascontiguousarray(c0)
    return arr


def decode_images(sources, workers: int | None = None) -> list[np.ndarray]:
    """Threaded batch decode (PIL/libjpeg-turbo releases the GIL, ~2ms per
    512x512 JPEG per core — the host-side data plane scales with cores)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    sources = list(sources)
    if len(sources) <= 2:
        return [decode_image(s) for s in sources]
    workers = workers or min(len(sources), os.cpu_count() or 1)
    if workers <= 1:
        return [decode_image(s) for s in sources]
    with ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(decode_image, sources))


def wire_image_u8(src, resize_size: int = 256, square: bool = False) -> np.ndarray:
    """Decode + stage-1 of the reference transform (shorter-side resize to
    ``resize_size``), on the host. Grayscale stays 1-channel.

    Serving applies this in the per-request HTTP handler so what crosses the
    host->device boundary is the post-resize image (~65-196 KB) instead of
    the raw decode (~0.8 MB at 512x512x3): under remote-device serving the
    measured bottleneck is the ~50 MB/s transfer tunnel, not device compute
    (B=16 classify: 240 ms transfer vs ~3 ms compute). Uses PIL's own resize
    (the op ``ops.resize.resize_u8_exact`` replicates bit-for-bit), and the
    device preproc's same-size resize is an exact identity — so end-to-end
    preprocessing, including the uint8 rounding point after stage 1, equals
    the reference's Resize(256) -> CenterCrop(224)
    (reference ``training_pipeline.py:112-119``) exactly.

    ``square=True`` additionally center-crops to (resize_size, resize_size).
    Center crops COMPOSE exactly — round((H-256)/2) + 16 == round((H-224)/2)
    for every H since the offsets differ by the integer 16 — so the square
    wire image yields bit-identical preprocessing for ANY aspect ratio while
    pinning the serving transfer/compile shape to one value (a novel raw
    shape mid-traffic is a multi-minute remote compile).
    """
    from mmdx_tpu.ops import resize as R

    arr = decode_image(src)
    h, w = arr.shape[:2]
    nh, nw = R.shorter_side_target(h, w, resize_size)
    if (nh, nw) != (h, w):
        # C++ fixed-point core first (bit-identical to PIL, ~4x faster —
        # this runs per request in the serving handler and the released
        # cohort's handler work is serial on the host core; see
        # native/resize_u8.cc), PIL fallback otherwise
        from mmdx_tpu import native

        out = native.resize_u8(arr, nh, nw)
        if out is None:
            pil = Image.fromarray(arr)  # mode L (2-D) or RGB by array shape
            out = np.asarray(pil.resize((nw, nh), Image.BILINEAR),
                             dtype=np.uint8)
        arr = out
    if square and arr.shape[:2] != (resize_size, resize_size):
        top, left = R.center_crop_bounds(
            arr.shape[0], arr.shape[1], resize_size)
        arr = arr[top:top + resize_size, left:left + resize_size]
    return arr


def to_canonical_u8(img: np.ndarray, size: int = 512) -> np.ndarray:
    """Letterbox-free canonicalization for fixed-shape device preprocessing.

    Serving batches require a static input shape. Images whose raw size differs
    from the canonical decode size are first resized host-side (PIL-exact) so
    the on-device fused resize+crop sees one shape. Grayscale stays 1-channel.
    """
    from mmdx_tpu.ops import resize as R

    h, w = img.shape[:2]
    if (h, w) == (size, size):
        out = img
    else:
        out = R.resize_u8_exact(img, size, size)
    if out.ndim == 2:
        out = out[:, :, None]
    return out
