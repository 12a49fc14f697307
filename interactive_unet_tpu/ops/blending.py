"""Block tiling, windows, and reflect padding for full-volume inference
(reference predict.py:270-411 math, reimplemented).

Pure host-side geometry (tiling/coords) + small numpy windows; the heavy
blending multiply-accumulate runs on device in engine.predict.
"""

from __future__ import annotations

import numpy as np


def gaussian_3d(input_size: int, sigma: float = 0.125, eps: float = 1e-3):
    """3-D separable Gaussian blending window, max 1, clipped below at eps
    (reference predict.py:327-347)."""
    sigma = sigma * input_size
    coords = np.arange(input_size, dtype=np.float32) - (input_size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2)).astype(np.float32)
    g /= g.max()
    w = g[:, None, None] * g[None, :, None] * g[None, None, :]
    w /= w.max()
    return np.clip(w, max(w.min(), eps), 1.0)


def hanning_3d(input_size: int, eps: float = 1e-3):
    """3-D Hanning alternative (reference predict.py:349-360)."""
    h = np.hanning(input_size)
    w = h[:, None, None] * h[None, :, None] * h[None, None, :]
    w /= w.max()
    return np.clip(w, max(w.min(), eps), 1.0).astype("float32")


def get_block_coordinates(volume_shape, input_size: int = 256,
                          overlap: float = 0.25):
    """Overlapping block decomposition; returns (clipped, padded, local)
    coordinate triples per block (reference predict.py:362-411 semantics)."""
    volume_shape = np.asarray(volume_shape[:3])
    blocks_per_axis = np.ceil(
        (volume_shape - overlap * input_size)
        / (input_size - overlap * input_size)).astype(int)
    blocks_per_axis = np.maximum(blocks_per_axis, 1)
    padded_shape = np.round(
        blocks_per_axis * input_size
        - (blocks_per_axis - 1) * input_size * overlap).astype(int)
    shift = (padded_shape - volume_shape) // 2
    shift = np.array(list(shift) + list(shift))

    block_coords, padded_coords, local_coords = [], [], []
    step = input_size * (1 - overlap)
    for i in range(blocks_per_axis[0]):
        for j in range(blocks_per_axis[1]):
            for k in range(blocks_per_axis[2]):
                p0 = np.array([i * step, j * step, k * step])
                coords = np.concatenate([p0, p0 + input_size]) - shift
                coords = coords.astype(int)
                padded_coords.append(coords)
                i0, j0, k0, i1, j1, k1 = coords
                c = [max(0, i0), max(0, j0), max(0, k0),
                     min(volume_shape[0], i1), min(volume_shape[1], j1),
                     min(volume_shape[2], k1)]
                block_coords.append([c[0], c[1], c[2], c[3], c[4], c[5]])
                local_coords.append([c[0] - i0, c[1] - j0, c[2] - k0,
                                     c[3] - i0, c[4] - j0, c[5] - k0])
    return (np.array(block_coords), np.array(padded_coords),
            np.array(local_coords))


def get_shard_coordinates(volume_shape, shard_size: int = 128):
    """Start/end coords of every shard tile (reference predict.py:318-325)."""
    volume_shape = np.asarray(volume_shape[:3])
    starts = [np.arange(0, s, shard_size) for s in volume_shape]
    coords = np.stack(np.meshgrid(*starts, indexing="ij"), -1).reshape(-1, 3)
    return np.concatenate(
        [coords, np.minimum(coords + shard_size, volume_shape)], axis=1)


def get_padded_block(volume, i0, j0, k0, i1, j1, k1):
    """Fetch [i0:i1, j0:j1, k0:k1] with reflect padding beyond the volume
    (reference predict.py:291-316; only the needed zarr region is read)."""
    vs = volume.shape
    pad_before = [max(0, -i0), max(0, -j0), max(0, -k0)]
    pad_after = [max(0, i1 - vs[0]), max(0, j1 - vs[1]), max(0, k1 - vs[2])]
    c = [max(i0, 0), min(i1, vs[0]), max(j0, 0), min(j1, vs[1]),
         max(k0, 0), min(k1, vs[2])]
    block = volume[c[0]:c[1], c[2]:c[3], c[4]:c[5]]
    padding = tuple(zip(pad_before, pad_after))
    if any(p or q for p, q in padding):
        block = np.pad(block, padding, mode="reflect")
    return block
