"""ctypes bindings for the native (C++) data-loader core.

Wraps ``native/libmsig_loader.so`` (see native/msig_loader.cpp): JPEG/PNG
decode, fused crop+bilinear box-resize (PIL BILINEAR semantics), k*90
rotation, threaded batch loading. Auto-builds the library with ``make`` on
first use when a toolchain is present; callers fall back to the PIL path
when unavailable (``available()`` gates).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_NAME = "libmsig_loader.so"

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _find_or_build() -> Optional[str]:
    path = os.path.abspath(os.path.join(_NATIVE_DIR, _LIB_NAME))
    if os.path.exists(path):
        return path
    makefile = os.path.abspath(os.path.join(_NATIVE_DIR, "Makefile"))
    if not os.path.exists(makefile):
        return None
    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(makefile)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception as e:  # no toolchain / libs — PIL fallback takes over
        logger.warning("native loader build failed (%s); using PIL fallback", e)
        return None
    return path if os.path.exists(path) else None


def _get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        path = _find_or_build()
        if path is None:
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:
            logger.warning("failed to load %s: %s", path, e)
            _load_failed = True
            return None
        lib.msig_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)
        ]
        lib.msig_image_size.restype = ctypes.c_int
        lib.msig_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.msig_decode_resize.restype = ctypes.c_int
        lib.msig_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.msig_load_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


def image_size(path: str) -> Tuple[int, int]:
    """(width, height) from the file header only."""
    lib = _get_lib()
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.msig_image_size(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise IOError(f"cannot read image header: {path}")
    return w.value, h.value


def decode_resize(
    path: str,
    out_size: int,
    crop: Optional[Tuple[int, int, int, int]] = None,  # (top, left, h, w)
    rot_k: int = 0,
) -> np.ndarray:
    lib = _get_lib()
    out = np.empty((out_size, out_size, 3), np.uint8)
    top, left, ch, cw = crop if crop else (0, 0, -1, -1)
    rc = lib.msig_decode_resize(
        path.encode(), out_size, top, left, ch, cw, rot_k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError(f"decode failed: {path}")
    return out


def load_batch(
    paths: Sequence[str],
    out_size: int,
    crops: Optional[Sequence[Tuple[int, int, int, int]]] = None,
    rots: Optional[Sequence[int]] = None,
    n_threads: int = 4,
) -> np.ndarray:
    """Threaded decode of a whole batch -> uint8 [N, S, S, 3]."""
    lib = _get_lib()
    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    crops_arr = None
    if crops is not None:
        crops_np = np.ascontiguousarray(np.asarray(crops, np.int32).reshape(n, 4))
        crops_arr = crops_np.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    rots_arr = None
    if rots is not None:
        rots_np = np.ascontiguousarray(np.asarray(rots, np.int32))
        rots_arr = rots_np.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    failures = lib.msig_load_batch(
        arr, n, out_size, crops_arr, rots_arr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads,
    )
    if failures:
        raise IOError(f"{failures}/{n} images failed to decode")
    return out
