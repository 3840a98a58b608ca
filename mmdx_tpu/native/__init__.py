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
    _lib = lib
    return _lib
