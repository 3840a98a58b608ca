"""Native (C++) runtime components, loaded via ctypes with pure-Python fallback."""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libmmdx_native.so"
_lib = None


def build(force: bool = False) -> Path | None:
    """Compile the native library in-tree (g++); returns the .so path or None."""
    if _LIB_PATH.exists() and not force:
        return _LIB_PATH
    try:
        subprocess.run(["make", "-C", str(_DIR)], check=True, capture_output=True)
        return _LIB_PATH if _LIB_PATH.exists() else None
    except Exception:
        return None


def load():
    """Load (building if needed) the native lib; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [ctypes.c_char_p]
    lib.wp_destroy.argtypes = [ctypes.c_void_p]
    lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
    lib.wp_vocab_size.restype = ctypes.c_int
    lib.wp_token_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.wp_token_id.restype = ctypes.c_int
    lib.wp_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.wp_encode.restype = ctypes.c_int
    lib.ug_create.restype = ctypes.c_void_p
    lib.ug_create.argtypes = [ctypes.c_char_p]
    lib.ug_destroy.argtypes = [ctypes.c_void_p]
    lib.ug_vocab_size.argtypes = [ctypes.c_void_p]
    lib.ug_vocab_size.restype = ctypes.c_int
    lib.ug_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    lib.ug_encode.restype = ctypes.c_int
    lib.mmdx_resize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
    ]
    lib.mmdx_resize_u8.restype = ctypes.c_int
    _lib = lib
    return _lib


def resize_u8(img, out_h: int, out_w: int):
    """Bit-exact PIL BILINEAR resize via the C++ core; None if unavailable.

    img: uint8 numpy [H, W] or [H, W, C<=4], C-contiguous enforced here.
    Verified bit-for-bit vs PIL and ops/resize.resize_u8_exact
    (tests/test_native_resize.py). ~4x faster than PIL on the serving host —
    this sits on the per-request serving hot path (serve/wsgi._predict_inner
    -> io/images.wire_image_u8).
    """
    lib = load()
    if lib is None or not hasattr(lib, "mmdx_resize_u8"):
        return None
    import numpy as np

    squeeze = img.ndim == 2
    src = np.ascontiguousarray(img[:, :, None] if squeeze else img)
    h, w, c = src.shape
    out = np.empty((out_h, out_w, c), np.uint8)
    rc = lib.mmdx_resize_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w,
    )
    if rc != 0:
        return None
    return out[:, :, 0] if squeeze else out
