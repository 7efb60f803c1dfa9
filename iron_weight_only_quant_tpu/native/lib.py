"""ctypes loader + typed wrappers for libiwoq.so."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libiwoq.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    i64, f32p, u8p, i32p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_uint8),
                            ctypes.POINTER(ctypes.c_int32))
    lib.iwoq_version.restype = ctypes.c_int
    for name in ("iwoq_quantize_int4", "iwoq_quantize_int8"):
        fn = getattr(lib, name)
        fn.argtypes = [f32p, i64, i64, i64, ctypes.c_int, u8p, f32p, f32p]
        fn.restype = ctypes.c_int
    lib.iwoq_pack_int4.argtypes = [i32p, i64, i64, u8p]
    lib.iwoq_pack_int4.restype = ctypes.c_int
    lib.iwoq_unpack_int4.argtypes = [u8p, i64, i64, i32p]
    lib.iwoq_unpack_int4.restype = ctypes.c_int
    lib.iwoq_shard_open.argtypes = [ctypes.c_char_p]
    lib.iwoq_shard_open.restype = ctypes.c_void_p
    lib.iwoq_shard_len.argtypes = [ctypes.c_void_p]
    lib.iwoq_shard_len.restype = i64
    lib.iwoq_shard_batch.argtypes = [ctypes.c_void_p, ctypes.POINTER(i64),
                                     i64, i64, i32p]
    lib.iwoq_shard_batch.restype = ctypes.c_int
    lib.iwoq_shard_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def native_quantize_int4(
    w: np.ndarray, group: int, symmetric: bool
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[K, N] f32 -> (packed u8 [K/2, N], scales f32 [K/G, N], zeros f32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    packed = np.empty((k // 2, n), np.uint8)
    scales = np.empty((k // group, n), np.float32)
    zeros = np.empty((k // group, n), np.float32)
    rc = lib.iwoq_quantize_int4(
        _ptr(w, ctypes.c_float), k, n, group, int(symmetric),
        _ptr(packed, ctypes.c_uint8), _ptr(scales, ctypes.c_float),
        _ptr(zeros, ctypes.c_float))
    if rc != 0:
        raise ValueError(f"iwoq_quantize_int4 failed: {rc}")
    return packed, scales, zeros


def native_quantize_int8(
    w: np.ndarray, group: int, symmetric: bool
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    packed = np.empty((k, n), np.uint8)
    scales = np.empty((k // group, n), np.float32)
    zeros = np.empty((k // group, n), np.float32)
    rc = lib.iwoq_quantize_int8(
        _ptr(w, ctypes.c_float), k, n, group, int(symmetric),
        _ptr(packed, ctypes.c_uint8), _ptr(scales, ctypes.c_float),
        _ptr(zeros, ctypes.c_float))
    if rc != 0:
        raise ValueError(f"iwoq_quantize_int8 failed: {rc}")
    return packed, scales, zeros


def native_pack_int4(codes: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    codes = np.ascontiguousarray(codes, np.int32)
    k, n = codes.shape
    packed = np.empty((k // 2, n), np.uint8)
    rc = lib.iwoq_pack_int4(_ptr(codes, ctypes.c_int32), k, n,
                            _ptr(packed, ctypes.c_uint8))
    if rc != 0:
        raise ValueError(f"pack failed: {rc}")
    return packed


def native_unpack_int4(packed: np.ndarray, k: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    packed = np.ascontiguousarray(packed, np.uint8)
    n = packed.shape[1]
    codes = np.empty((k, n), np.int32)
    rc = lib.iwoq_unpack_int4(_ptr(packed, ctypes.c_uint8), k, n,
                              _ptr(codes, ctypes.c_int32))
    if rc != 0:
        raise ValueError(f"unpack failed: {rc}")
    return codes


class TokenShardReader:
    """Memory-mapped raw-int32 token shard with batched window fetches."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.iwoq_shard_open(str(path).encode())
        if not self._h:
            raise OSError(f"cannot open token shard {path}")

    def __len__(self) -> int:
        return int(self._lib.iwoq_shard_len(self._h))

    def batch(self, offsets, seqlen: int) -> np.ndarray:
        offs = np.ascontiguousarray(offsets, np.int64)
        out = np.empty((len(offs), seqlen), np.int32)
        rc = self._lib.iwoq_shard_batch(
            self._h, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(offs), seqlen, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            raise ValueError(f"shard batch failed: {rc}")
        return out

    def close(self):
        if self._h:
            self._lib.iwoq_shard_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
