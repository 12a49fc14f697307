"""Multiscale zarr pyramids (reference utils.py:18-98 semantics).

- ``create_multiscale_zarr``: level '0' full-res, chunk 128 / shard 256
  defaults, then repeated x0.5 downscales until a level fits one chunk.
- ``resize_volume``: blockwise nearest (order=0) downscale, block-aligned to
  the shard size so every write touches exactly one shard file.
- ``read_volume``: open a level with clamping (utils.py:18-27).

The nearest downscale matches ``scipy.ndimage.zoom(block, scale, order=0)``
per block exactly — used host-side during pyramid construction; inference
writeback has a device variant in ops.blending.
"""

from __future__ import annotations

import math

import numpy as np
from scipy import ndimage

from . import zarr3

_NATIVE = None
try:
    from ..native import nativelib as _nl

    if _nl.available():
        _NATIVE = _nl
except Exception:  # pragma: no cover
    pass


def read_volume(path, level: int = 0) -> zarr3.Array:
    root = zarr3.open_group(path, mode="r")
    keys = root.array_keys()
    # clamp to the last existing level (the reference clamps to num_scales,
    # utils.py:24-26, which over-runs by one — defect not replicated)
    level = int(np.clip(level, 0, len(keys) - 1))
    return root[str(level)]


def resize_volume(src_vol, dst_vol, scale: float = 0.5, block_size: int = 512,
                  order: int = 0):
    """Blockwise downscale src -> dst (both array-likes with __getitem__)."""
    src_shape = np.array(src_vol.shape[:3]).astype(int)
    for i in range(0, src_shape[0], block_size):
        i0, i1 = i, min(i + block_size, src_shape[0])
        t_i0, t_i1 = int(i0 * scale), int(i1 * scale)
        for j in range(0, src_shape[1], block_size):
            j0, j1 = j, min(j + block_size, src_shape[1])
            t_j0, t_j1 = int(j0 * scale), int(j1 * scale)
            for k in range(0, src_shape[2], block_size):
                k0, k1 = k, min(k + block_size, src_shape[2])
                t_k0, t_k1 = int(k0 * scale), int(k1 * scale)
                block = src_vol[i0:i1, j0:j1, k0:k1]
                if block.ndim == 3:
                    out_shape = (t_i1 - t_i0, t_j1 - t_j0, t_k1 - t_k0)
                    if (_NATIVE is not None and order == 0
                            and block.dtype == np.uint8):
                        zoomed = _NATIVE.downsample0_u8(block, out_shape)
                    else:
                        zoomed = ndimage.zoom(block, scale, order=order)
                    dst_vol[t_i0:t_i1, t_j0:t_j1, t_k0:t_k1] = zoomed
                else:  # trailing channel axis (predicted volumes): keep channels
                    zoomed = ndimage.zoom(block, (scale, scale, scale, 1), order=order)
                    dst_vol[t_i0:t_i1, t_j0:t_j1, t_k0:t_k1, :] = zoomed


def add_multiscales(src_file, scale: float = 0.5):
    """Append x``scale`` levels until the coarsest fits one chunk."""
    root = zarr3.open_group(src_file, mode="r+")
    z0 = root["0"]
    volume_shape = z0.shape
    chunk_shape = z0.chunks
    shard_shape = z0.shards if z0.shards is not None else chunk_shape

    ratio = float(np.max(np.array(volume_shape[:3]) / np.array(chunk_shape[:3])))
    num_steps = int(math.floor(math.log(ratio) / math.log(1 / scale))) if ratio > 1 else 0

    for i in range(num_steps):
        zi = root[str(i)]
        z1_shape = tuple(int(x * scale) for x in zi.shape[:3]) + tuple(zi.shape[3:])
        z1 = root.create_array(name=str(i + 1), shape=z1_shape,
                               chunks=chunk_shape, shards=z0.shards,
                               dtype=zi.dtype, overwrite=True)
        resize_volume(zi, z1, scale=scale, block_size=shard_shape[0], order=0)


def create_multiscale_zarr(volume: np.ndarray, dst_file, scale: float = 0.5,
                           chunk_size: int = 128, shard_size: int = 256):
    """Write a full multiscale store from an in-memory volume."""
    nd = volume.ndim
    chunk_shape = (chunk_size,) * 3 + tuple(volume.shape[3:]) if nd == 4 else (chunk_size,) * 3
    shard_shape = (shard_size,) * 3 + tuple(volume.shape[3:]) if nd == 4 else (shard_size,) * 3

    root = zarr3.open_group(dst_file, mode="w")
    z0 = root.create_array(name="0", shape=volume.shape, chunks=chunk_shape,
                           shards=shard_shape, dtype=volume.dtype, overwrite=True)
    # shard-aligned writes
    ss = shard_shape[0]
    for i in range(0, volume.shape[0], ss):
        z0[i:i + ss] = volume[i:i + ss]
    add_multiscales(dst_file, scale=scale)
