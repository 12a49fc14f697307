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


def block_shard_intersections(padded_coords, shard_coords) -> np.ndarray:
    """(n_shards, n_blocks) bool: does block b's padded extent overlap shard
    s?  Both coordinate sets live in the same output/volume frame
    (``get_block_coordinates`` padded extents and ``get_shard_coordinates``
    tiles), so this is a plain interval-overlap test per axis."""
    P = np.asarray(padded_coords)
    S = np.asarray(shard_coords)
    lo_s, hi_s = S[:, None, :3], S[:, None, 3:]
    lo_b, hi_b = P[None, :, :3], P[None, :, 3:]
    return ((lo_b < hi_s) & (hi_b > lo_s)).all(axis=2)


def shard_major_block_order(padded_coords, shard_coords) -> np.ndarray:
    """Block traversal permutation that completes output shards early and
    evenly: walk shards in raster order and visit each shard's not-yet-seen
    intersecting blocks consecutively.  After the last block of shard s's
    group, every block touching s has run, so s can be normalized and
    shipped device->host immediately — the d2h stream then rides behind the
    remaining blocks' accumulation instead of draining serially at the end
    (round-4 profile: raster order left a 42 s serial drain on 512^3
    because most shards only became complete near the final blocks).

    Returns an (n_blocks,) int64 permutation of block indices.  The
    reference imposes no traversal order (predict.py:362-411), so any
    permutation preserves output parity exactly — blending is a sum.
    """
    inter = block_shard_intersections(padded_coords, shard_coords)
    n = inter.shape[1]
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    for s in range(inter.shape[0]):
        new = np.nonzero(inter[s] & ~visited)[0]
        visited[new] = True
        order[pos:pos + len(new)] = new
        pos += len(new)
    rest = np.nonzero(~visited)[0]  # blocks outside every shard: impossible
    order[pos:] = rest              # for a covering tiling, but keep total
    return order


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
