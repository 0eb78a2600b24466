"""ctypes bridge to the native C++ image decoder (io/native/image_loader.cpp).

Compiled on first use with the system toolchain (g++ + libjpeg/libpng — all baked into
the image); ctypes calls release the GIL, so the dataloader's prefetch threads decode in
true parallel like the reference's native worker threads (dataset.hpp:247-259). Falls back
to the PIL path in io/image.py when the toolchain or headers are unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils.log import get_logger

log = get_logger(__name__)

_SRC = Path(__file__).parent / "native" / "image_loader.cpp"
_LIB = Path(__file__).parent / "native" / "libtpusplat_io.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-ljpeg", "-lpng", "-o", str(_LIB),
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            log.warning("native image loader build failed: %s", r.stderr[-500:])
            return False
        return True
    except Exception as e:  # toolchain missing
        log.warning("native image loader build error: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            log.warning("native image loader load failed: %s", e)
            return None
        lib.tpusplat_image_size.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.tpusplat_image_size.restype = ctypes.c_int
        lib.tpusplat_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.tpusplat_load_image.restype = ctypes.c_int
        _lib = lib
        log.debug("native image loader ready: %s", _LIB)
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_image_native(path: str, resize_factor: int = -1, max_width: int = 3840) -> np.ndarray:
    """Decode+resample via C++; returns [3,H,W] float32 in [0,1]. Raises on failure."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    rf = resize_factor if resize_factor and resize_factor > 1 else 1
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.tpusplat_image_size(path.encode(), rf, max_width, ctypes.byref(w),
                                 ctypes.byref(h))
    if rc != 0:
        raise RuntimeError(f"native size probe failed for {path} (rc={rc})")
    out = np.empty((3, h.value, w.value), np.float32)
    rc = lib.tpusplat_load_image(
        path.encode(), rf, max_width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w.value, h.value,
    )
    if rc != 0:
        raise RuntimeError(f"native decode failed for {path} (rc={rc})")
    return out
