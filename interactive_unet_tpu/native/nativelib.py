"""ctypes bindings for the native host runtime (libiunet.so).

Auto-builds with g++ on first import when the shared object is missing;
every caller has a pure-Python/numpy fallback, so the library is an
accelerator, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libiunet.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        try:
            subprocess.run(["sh", str(_DIR / "build.sh")], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    lib.iunet_crc32c.restype = ctypes.c_uint32
    lib.iunet_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]

    lib.iunet_zstd_compress_batch.restype = ctypes.c_int
    lib.iunet_zstd_compress_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int, ctypes.c_int,
        ctypes.c_int]

    lib.iunet_zstd_decompress_batch.restype = ctypes.c_int
    lib.iunet_zstd_decompress_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int]

    lib.iunet_downsample0_u8.restype = None
    lib.iunet_downsample0_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]

    lib.iunet_colored_to_categorical.restype = None
    lib.iunet_colored_to_categorical.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p]

    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def crc32c(data: bytes) -> int:
    lib = _load()
    return int(lib.iunet_crc32c(data, len(data)))


def zstd_compress_batch(chunks: list[bytes], level: int = 1,
                        n_threads: int = 0) -> list[bytes]:
    """Compress equal-size raw chunks; returns list of compressed blobs."""
    lib = _load()
    n = len(chunks)
    if n == 0:
        return []
    src_size = len(chunks[0])
    n_threads = n_threads or min(4, os.cpu_count() or 1)
    dst_cap = src_size + (src_size >> 8) + 512
    dst = np.empty(n * dst_cap, dtype=np.uint8)
    out_sizes = (ctypes.c_uint64 * n)()
    src_arr = (ctypes.c_char_p * n)(*chunks)
    rc = lib.iunet_zstd_compress_batch(
        src_arr, src_size, dst.ctypes.data_as(ctypes.c_void_p), dst_cap,
        out_sizes, n, level, n_threads)
    if rc:
        raise RuntimeError("zstd batch compression failed")
    return [dst[i * dst_cap:i * dst_cap + out_sizes[i]].tobytes()
            for i in range(n)]


def zstd_decompress_batch(blobs: list[bytes], dst_size: int,
                          n_threads: int = 0) -> np.ndarray:
    """Decompress blobs (all expanding to dst_size bytes) -> (n, dst_size)."""
    lib = _load()
    n = len(blobs)
    if n == 0:
        return np.empty((0, dst_size), dtype=np.uint8)
    n_threads = n_threads or min(4, os.cpu_count() or 1)
    dst = np.empty((n, dst_size), dtype=np.uint8)
    src_arr = (ctypes.c_char_p * n)(*blobs)
    sizes = (ctypes.c_uint64 * n)(*[len(b) for b in blobs])
    rc = lib.iunet_zstd_decompress_batch(
        src_arr, sizes, dst.ctypes.data_as(ctypes.c_void_p), dst_size, n,
        n_threads)
    if rc:
        raise RuntimeError("zstd batch decompression failed")
    return dst


def downsample0_u8(src: np.ndarray, out_shape) -> np.ndarray:
    """Order-0 downsample with scipy.ndimage.zoom index mapping."""
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.uint8)
    dst = np.empty(out_shape, dtype=np.uint8)
    lib.iunet_downsample0_u8(
        src.ctypes.data_as(ctypes.c_void_p), *[int(s) for s in src.shape],
        dst.ctypes.data_as(ctypes.c_void_p), *[int(s) for s in out_shape])
    return dst


def colored_to_categorical(mask: np.ndarray, colors: np.ndarray):
    """First-match palette one-hot; returns (onehot[..., :], weight)."""
    lib = _load()
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    colors = np.ascontiguousarray(colors, dtype=np.uint8)
    h, w, _ = mask.shape
    n_colors = len(colors)
    onehot = np.empty((h, w, n_colors), dtype=np.uint8)
    weight = np.empty((h, w), dtype=np.uint8)
    lib.iunet_colored_to_categorical(
        mask.ctypes.data_as(ctypes.c_void_p), h, w,
        colors.ctypes.data_as(ctypes.c_void_p), n_colors,
        onehot.ctypes.data_as(ctypes.c_void_p),
        weight.ctypes.data_as(ctypes.c_void_p))
    return onehot, weight
