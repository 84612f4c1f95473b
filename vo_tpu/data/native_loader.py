"""ctypes bindings for the native C++ frame loader (native/frame_loader.cc).

The native library provides PNG/JPEG -> f32 grayscale decode and a
multithreaded prefetch ring, replacing the reference's synchronous
cv2.imread-per-frame data plane (reference src/vo/primitives/loader.py:184-198)
with a C++ pipeline that decodes ahead of the device. Pure-ctypes bindings —
no pybind11. Builds on demand with `make` the first time it is imported;
callers fall back to the PIL path when the toolchain or libs are missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libvoframe.so"))

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"],
            cwd=os.path.abspath(_NATIVE_DIR),
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.vo_image_size.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vo_image_size.restype = ctypes.c_int
        lib.vo_decode_gray.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.vo_decode_gray.restype = ctypes.c_int
        lib.vo_prefetch_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.vo_prefetch_create.restype = ctypes.c_void_p
        lib.vo_prefetch_get.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.vo_prefetch_get.restype = ctypes.c_int
        lib.vo_prefetch_destroy.argtypes = [ctypes.c_void_p]
        lib.vo_prefetch_destroy.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def image_size(path: str) -> tuple[int, int]:
    """(h, w) of an image file via the native header parse."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.vo_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise IOError(f"cannot read image header: {path}")
    return h.value, w.value


def decode_gray(path: str, hw: tuple[int, int] | None = None) -> np.ndarray:
    """Decode one PNG/JPEG to (h, w) float32 grayscale in [0, 255]."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h, w = hw if hw is not None else image_size(path)
    out = np.empty((h, w), np.float32)
    rc = lib.vo_decode_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w
    )
    if rc != 0:
        raise IOError(f"native decode failed: {path}")
    return out


class FramePrefetcher:
    """Decode-ahead iterator over equally-sized frames.

    A C++ thread pool keeps up to `ring` decoded frames buffered; `get(i)`
    (strictly sequential) blocks only if decode is behind the consumer.
    """

    def __init__(self, paths: list[str], n_threads: int = 4, ring: int = 8):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        if not paths:
            raise ValueError("no paths")
        self._lib = lib
        self.h, self.w = image_size(paths[0])
        self.n = len(paths)
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.vo_prefetch_create(
            arr, len(paths), self.h, self.w, n_threads, ring
        )
        if not self._handle:
            raise RuntimeError("vo_prefetch_create failed")
        self._next = 0

    def get(self, idx: int) -> np.ndarray:
        if idx != self._next:
            raise ValueError(
                f"prefetcher is sequential: expected index {self._next}, got {idx}"
            )
        out = np.empty((self.h, self.w), np.float32)
        rc = self._lib.vo_prefetch_get(
            self._handle, idx, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        # The C++ consumer cursor advances past the frame whether or not its
        # decode succeeded — mirror that before raising, so one bad frame
        # surfaces as one error instead of desynchronizing every later get().
        self._next = idx + 1
        if rc != 0:
            raise IOError(f"prefetch decode failed at frame {idx}")
        return out

    def __iter__(self):
        while self._next < self.n:
            yield self.get(self._next)

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.vo_prefetch_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
