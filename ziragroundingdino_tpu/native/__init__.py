"""ctypes bindings for the native host runtime (native/zgdino_native.cpp).

The reference's host runtime is native (torch C++ DataLoader workers, HF's
compiled tokenizer); ours is this small C++ library: WordPiece tokenization
and the image resize/normalize/pad hot path. Built lazily with g++ on first
use; every entry point has a pure-Python fallback (text/tokenizer.py,
data/transforms.py), so the native layer is a strict accelerator, never a
dependency.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger("ziragroundingdino_tpu")

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "zgdino_native.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libzgdino_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain missing: fall back to python
        logger.info("native build failed (%s); using python fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.zg_tokenizer_create.restype = ctypes.c_void_p
    lib.zg_tokenizer_create.argtypes = [ctypes.c_char_p]
    lib.zg_tokenizer_destroy.argtypes = [ctypes.c_void_p]
    lib.zg_tokenize.restype = ctypes.c_int32
    lib.zg_tokenize.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.zg_resize_bilinear_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
    ]
    lib.zg_normalize_pad.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32, ctypes.c_int32,
    ]
    _lib = lib
    return _lib


class NativeTokenizer:
    """Drop-in for `WordPieceTokenizer.encode` backed by the C++ library."""

    def __init__(self, vocab_path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.zg_tokenizer_create(vocab_path.encode())
        if not self._h:
            raise FileNotFoundError(vocab_path)

    def encode(self, text: str, max_len: int = 512):
        buf = (ctypes.c_int32 * max_len)()
        n = self._lib.zg_tokenize(self._h, text.encode(), buf, max_len)
        return list(buf[:n])

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.zg_tokenizer_destroy(self._h)
        except Exception:
            pass


def resize_bilinear_u8(src: np.ndarray, dh: int, dw: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.uint8)
    h, w, c = src.shape
    dst = np.empty((dh, dw, c), np.uint8)
    lib.zg_resize_bilinear_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw,
    )
    return dst


def normalize_pad(
    src: np.ndarray, mean, std, bh: int, bw: int
) -> Optional[tuple]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.uint8)
    h, w, _ = src.shape
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    dst = np.empty((bh, bw, 3), np.float32)
    mask = np.empty((bh, bw), np.uint8)
    lib.zg_normalize_pad(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), bh, bw,
    )
    return dst, mask.astype(bool)
