"""ctypes bindings for the native (C++) data-loading runtime.

Reference counterpart: torch ``DataLoader(num_workers=N)`` forked-process
decode in the zoo's training path [R: builders/dataset_builder.py]. Here the
native layer is ``native/esn_native.cc`` (libpng/libjpeg decode, cv2-matching
resize, threaded bounded-ring prefetch) built on demand with ``make``; every
entry point degrades gracefully to the cv2/PIL path when the toolchain or
libraries are missing, so the framework never hard-requires the .so.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libesn_native.so")

_lib = None
_lib_failed = False  # remember dlopen/build failure: don't retry per item
_lib_lock = threading.Lock()
_build_attempted = False


def _try_build() -> bool:
    global _build_attempted
    if _build_attempted:
        return os.path.exists(_LIB_PATH)
    _build_attempted = True
    src = os.path.join(_NATIVE_DIR, "esn_native.cc")
    if not os.path.exists(src):
        return False
    stale = (not os.path.exists(_LIB_PATH)
             or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
    if not stale:
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        pass  # no toolchain: a stale-but-working .so still beats cv2
    return os.path.exists(_LIB_PATH)


def _load():
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _lib_failed:
            return None
        if os.environ.get("ESN_TPU_NATIVE", "auto").lower() in ("0", "off"):
            return None
        if not _try_build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.esn_image_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.esn_image_info.restype = ctypes.c_int
        for name in ("esn_decode_bgr", "esn_decode_grey"):
            fn = getattr(lib, name)
            fn.argtypes = [ctypes.c_char_p,
                           ctypes.POINTER(ctypes.c_uint8),
                           ctypes.c_int, ctypes.c_int]
            fn.restype = ctypes.c_int
        lib.esn_pipe_create.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.esn_pipe_create.restype = ctypes.c_void_p
        lib.esn_pipe_epoch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_int]
        lib.esn_pipe_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int)]
        lib.esn_pipe_next.restype = ctypes.c_int
        lib.esn_pipe_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def image_info(path: str) -> Optional[Tuple[int, int]]:
    lib = _load()
    if lib is None:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.esn_image_info(path.encode(), ctypes.byref(h),
                          ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def _as_u8_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_bgr(path: str,
               resize_hw: Optional[Tuple[int, int]] = None
               ) -> Optional[np.ndarray]:
    """Decode PNG/JPEG to HWC uint8 BGR (cv2.imread-compatible)."""
    lib = _load()
    if lib is None:
        return None
    if resize_hw is None:
        info = image_info(path)
        if info is None:
            return None
        resize_hw = info
        th, tw = -1, -1
    else:
        th, tw = resize_hw
    out = np.empty((resize_hw[0], resize_hw[1], 3), np.uint8)
    n = lib.esn_decode_bgr(path.encode(), _as_u8_ptr(out), th, tw)
    return out if n > 0 else None


def decode_grey(path: str,
                resize_hw: Optional[Tuple[int, int]] = None
                ) -> Optional[np.ndarray]:
    """Decode PNG/JPEG to HW uint8 grayscale (label maps)."""
    lib = _load()
    if lib is None:
        return None
    if resize_hw is None:
        info = image_info(path)
        if info is None:
            return None
        resize_hw = info
        th, tw = -1, -1
    else:
        th, tw = resize_hw
    out = np.empty((resize_hw[0], resize_hw[1]), np.uint8)
    n = lib.esn_decode_grey(path.encode(), _as_u8_ptr(out), th, tw)
    return out if n > 0 else None


class NativePipeline:
    """Threaded decode+prefetch over a manifest, in-order delivery.

    Yields ``(record_index, image_bgr_u8, label_u8_or_None)`` per
    :meth:`epoch`. The visiting order comes from the caller (keeps shuffling
    under the framework's PRNG, reproducible across runs).
    """

    def __init__(self, records: Sequence[Tuple[str, Optional[str]]],
                 target_hw: Tuple[int, int], *, threads: Optional[int] = None,
                 capacity: int = 16):
        if threads is None:  # decode threads scale with host cores
            threads = max(1, min(8, os.cpu_count() or 1))
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._records = list(records)
        self._hw = tuple(target_hw)
        self._threads = threads
        n = len(self._records)
        self._img_paths = (ctypes.c_char_p * n)(
            *[r[0].encode() for r in self._records])
        self._lab_paths = (ctypes.c_char_p * n)(
            *[r[1].encode() if r[1] else None for r in self._records])
        self._handle = lib.esn_pipe_create(
            n, self._img_paths, self._lab_paths,
            self._hw[0], self._hw[1], threads, capacity)
        if not self._handle:
            raise RuntimeError("esn_pipe_create failed")

    def epoch(self, order: Optional[Sequence[int]] = None):
        if order is None:
            order = range(len(self._records))
        order = np.asarray(list(order), np.int32)
        c_order = order.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
        self._lib.esn_pipe_epoch(self._handle, c_order, len(order),
                                 self._threads)
        h, w = self._hw
        for _ in range(len(order)):
            img = np.empty((h, w, 3), np.uint8)
            lab = np.empty((h, w), np.uint8)
            has_lab = ctypes.c_int(0)
            rec = self._lib.esn_pipe_next(
                self._handle, _as_u8_ptr(img), _as_u8_ptr(lab),
                ctypes.byref(has_lab))
            if rec == -2:
                raise IOError("native decode failed mid-epoch")
            if rec < 0:
                return
            yield rec, img, (lab if has_lab.value else None)

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.esn_pipe_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
