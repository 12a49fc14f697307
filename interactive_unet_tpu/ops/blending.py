"""Block tiling, blending windows, and reflect padding for full-volume
inference.

Host-side geometry only (the blending multiply-accumulate itself runs on
device in engine.predict).  The *math* matches the reference inference
contract (predict.py:270-411) — overlap-tiled blocks, separable clipped
windows, shard partition, reflect fetch — but everything here is computed as
vectorized numpy over the whole tiling at once rather than per-block loops.
"""

from __future__ import annotations

import numpy as np


# -- separable blending windows ------------------------------------------------

def _separable_window(profile: np.ndarray, eps: float) -> np.ndarray:
    """Outer-product a 1-D profile into a normalized, eps-clipped 3-D window."""
    p = np.asarray(profile, dtype=np.float32)
    w = np.einsum("i,j,k->ijk", p, p, p)
    w /= w.max()
    return np.clip(w, max(float(w.min()), eps), 1.0)


def gaussian_3d(input_size: int, sigma: float = 0.125,
                eps: float = 1e-3) -> np.ndarray:
    """Gaussian blending window, sigma relative to the block size, peak 1,
    floor eps (reference predict.py:327-347 contract)."""
    x = np.arange(input_size, dtype=np.float32) - (input_size - 1) / 2.0
    g = np.exp(-0.5 * (x / (sigma * input_size)) ** 2)
    g /= g.max()
    return _separable_window(g, eps)


def hanning_3d(input_size: int, eps: float = 1e-3) -> np.ndarray:
    """Hanning alternative (reference predict.py:349-360 contract)."""
    return _separable_window(np.hanning(input_size), eps)


# -- tiling geometry -----------------------------------------------------------

def _grid_starts(counts: np.ndarray) -> np.ndarray:
    """All 3-D integer grid indices for the given per-axis counts, (N, 3)."""
    grids = np.meshgrid(*(np.arange(int(c)) for c in counts), indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=1)


def get_block_coordinates(volume_shape, input_size: int = 256,
                          overlap: float = 0.25):
    """Overlapping block decomposition of a volume.

    Returns three (N, 6) arrays of [i0, j0, k0, i1, j1, k1]:
      clipped  — the in-volume extent of each block,
      padded   — the full input_size³ extent (may poke outside the volume),
      local    — where the clipped region lands inside the padded block.

    Blocks overlap by ``overlap``·input_size and the tiling is centered so
    overhang is split evenly (reference predict.py:362-411 contract).
    """
    shape = np.asarray(volume_shape[:3], dtype=np.int64)
    stride = input_size * (1.0 - overlap)
    n_blocks = np.maximum(
        np.ceil((shape - overlap * input_size) / stride), 1).astype(np.int64)
    tiled_extent = np.round(
        n_blocks * input_size - (n_blocks - 1) * input_size * overlap
    ).astype(np.int64)
    shift = (tiled_extent - shape) // 2

    start = (_grid_starts(n_blocks) * stride).astype(np.int64) - shift
    stop = start + input_size
    lo = np.maximum(start, 0)
    hi = np.minimum(stop, shape)

    padded = np.concatenate([start, stop], axis=1)
    clipped = np.concatenate([lo, hi], axis=1)
    local = np.concatenate([lo - start, hi - start], axis=1)
    return clipped, padded, local


def get_shard_coordinates(volume_shape, shard_size: int = 128) -> np.ndarray:
    """Exact (non-overlapping) shard partition of a volume: (N, 6) array of
    [start, end) coords per shard tile (reference predict.py:318-325
    contract — one tile per output shard file)."""
    shape = np.asarray(volume_shape[:3], dtype=np.int64)
    counts = -(-shape // shard_size)  # ceil division
    lo = _grid_starts(counts) * shard_size
    hi = np.minimum(lo + shard_size, shape)
    return np.concatenate([lo, hi], axis=1)


def get_padded_block(volume, i0, j0, k0, i1, j1, k1) -> np.ndarray:
    """Fetch volume[i0:i1, j0:j1, k0:k1], reflect-padding any part of the
    range that falls outside the volume (reference predict.py:291-316
    contract; only the in-volume region is actually read)."""
    lo = np.array([i0, j0, k0], dtype=np.int64)
    hi = np.array([i1, j1, k1], dtype=np.int64)
    extent = np.asarray(volume.shape[:3], dtype=np.int64)
    lo_c = np.clip(lo, 0, extent)
    hi_c = np.clip(hi, 0, extent)
    block = np.asarray(volume[lo_c[0]:hi_c[0], lo_c[1]:hi_c[1],
                              lo_c[2]:hi_c[2]])
    pad = np.stack([lo_c - lo, hi - hi_c], axis=1)
    if pad.any():
        # trailing (channel) axes pass through unpadded
        full = np.concatenate(
            [pad, np.zeros((block.ndim - 3, 2), np.int64)], axis=0)
        block = np.pad(block, full, mode="reflect")
    return block
