"""Fast oriented-slice extraction via packed-neighborhood single gather.

Motivation (measured on TPU v5e): XLA gather costs ~14 ns *per index*
regardless of how many bytes each index pulls, so the naive trilinear
formulation (8 scalar gathers per sample, ops/resample.py) is index-bound at
~30 ms per 512^2 slice — slower than scipy on CPU.  This module removes 7 of
the 8 gathers:

The volume is repacked once into a table whose row (x, y, zb) holds the full
2x2x(B+1) interpolation neighborhood:

    row = [ V[x,   y,   zb*B : zb*B+B+1],     # segment 0  (31 lanes)
            V[x,   y+1, ...],                 # segment 1
            V[x+1, y,   ...],                 # segment 2
            V[x+1, y+1, ...] ]                # segment 3  -> 124 lanes, pad 128

A trilinear sample then needs exactly ONE 128-lane row gather; the 8 corner
values live in known lanes (seg*31 + z0%B and +1) and are combined with a
VPU one-hot weighted reduction.  Cost per 512^2 slice: 262K indices (~4 ms)
+ ~0.5 ms VPU — ~25x fewer indices than the naive path, at 4.6x the volume's
memory (uint8 table).

Exact scipy.ndimage.map_coordinates parity (orders 0/1, constant cval=0):
nearest is trilinear with binarized weights (floor(x+0.5) == x0 + (fx>=0.5)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B = 30          # z values per block (stride)
SEG = B + 1     # lanes per segment (B+1 for the +1 z neighbor)
LANES = 128     # 4 segments * 31 = 124, padded to the TPU lane width


def packed_nbytes(shape) -> int:
    """Device bytes the packed table for a (D,H,W)[,C] volume will occupy
    (~4.6x the uint8 volume, x C for multi-channel) — for HBM-capacity
    guards before packing."""
    D, H, W = (int(s) for s in shape[:3])
    C = int(shape[3]) if len(shape) == 4 else 1
    nzb = max(1, -(-(W - 1) // B))
    return max(D - 1, 0) * max(H - 1, 0) * nzb * LANES * C


def _pack_body(vol):
    """(D,H,W) uint8-castable -> ((D-1)*(H-1)*NZB, 128) uint8 table."""
    if vol.dtype != jnp.uint8:
        vol = jnp.clip(jnp.round(vol.astype(jnp.float32)),
                       0, 255).astype(jnp.uint8)
    D, H, W = vol.shape
    nzb = max(1, -(-(W - 1) // B))  # blocks covering z0 in [0, W-2]
    zidx = jnp.clip(
        jnp.arange(nzb)[:, None] * B + jnp.arange(SEG)[None, :], 0, W - 1)

    segs = []
    for dx in (0, 1):
        for dy in (0, 1):
            # order: (dx,dy) = (0,0),(0,1),(1,0),(1,1)
            shifted = vol[dx:dx + D - 1, dy:dy + H - 1, :]
            segs.append(shifted[:, :, zidx])  # (D-1, H-1, nzb, SEG)
    packed = jnp.concatenate(segs, axis=-1)   # (D-1, H-1, nzb, 124)
    packed = jnp.pad(packed, ((0, 0), (0, 0), (0, 0), (0, LANES - 4 * SEG)))
    return packed.reshape(-1, LANES)


_pack3 = jax.jit(_pack_body)
_pack4 = jax.jit(jax.vmap(_pack_body, in_axes=-1))


def pack_volume(volume) -> jax.Array:
    """(D,H,W) -> packed uint8 table ((D-1)*(H-1)*NZB, 128);
    (D,H,W,C) -> (C, rows, 128) per-channel tables.

    Rows are indexed by (x0 * (H-1) + y0) * NZB + z0 // B.  The whole pack
    is ONE jit-compiled program: the eager op-by-op version paid ~12
    dispatch round-trips through the remote-device tunnel per volume plus
    HBM writes for every intermediate.  Accepts host arrays or an
    already-device-resident jax.Array (no second h2d in that case)."""
    vol = jnp.asarray(volume)
    return _pack4(vol) if vol.ndim == 4 else _pack3(vol)


def _extract_one(packed, coords, order, D, H, W):
    """Edge semantics are EXACTLY scipy map_coordinates(mode='constant',
    cval=0): a sample whose coordinate leaves [0, n-1] on any axis is cval —
    scipy does not blend cval into boundary-grazing samples (verified;
    bench.py asserts voxel-exactness on TPU)."""
    x, y, z = coords[0], coords[1], coords[2]
    valid = ((x >= 0) & (x <= D - 1) & (y >= 0) & (y <= H - 1)
             & (z >= 0) & (z <= W - 1))

    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(D - 2, 0))
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(H - 2, 0))
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, max(W - 2, 0))
    fx = x - x0
    fy = y - y0
    fz = z - z0
    if order == 0:
        # nearest == trilinear with binarized weights: floor(v+0.5)
        fx = (fx >= 0.5).astype(jnp.float32)
        fy = (fy >= 0.5).astype(jnp.float32)
        fz = (fz >= 0.5).astype(jnp.float32)

    nzb = max(1, -(-(W - 1) // B))
    zb = z0 // B
    zloc = z0 - zb * B

    row_idx = (x0 * (H - 1) + y0) * nzb + zb
    rows = packed[row_idx].astype(jnp.float32)          # (..., 128)

    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1)
    zl = zloc[..., None]
    w = jnp.zeros_like(rows)
    wx = (1 - fx, fx)
    wy = (1 - fy, fy)
    for seg, (dx, dy) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        wxy = (wx[dx] * wy[dy])[..., None]
        base = seg * SEG + zl
        w = w + jnp.where(lane == base, wxy * (1 - fz)[..., None], 0.0)
        w = w + jnp.where(lane == base + 1, wxy * fz[..., None], 0.0)

    out = jnp.sum(rows * w, axis=-1)
    return jnp.where(valid, out, 0.0)


def _extract_any(packed, coords, order, D, H, W):
    """Single-table (rows, 128) -> (...); per-channel (C, rows, 128) ->
    (..., C) — channel count is static at trace time, so the vmap costs
    nothing for plain 3-D volumes."""
    if packed.ndim == 3:
        out = jax.vmap(lambda p: _extract_one(p, coords, order, D, H, W)
                       )(packed)
        return jnp.moveaxis(out, 0, -1)
    return _extract_one(packed, coords, order, D, H, W)


_extract = partial(jax.jit, static_argnames=("order", "D", "H", "W"))(
    _extract_any)


def _oriented_coords(basis_a, basis_b, origin, slice_width):
    """(3,S,S) affine grid from 9 floats (reference coordinate convention:
    slicer.py:94-115, start = -floor(S/2))."""
    S = slice_width
    start = -(S // 2) if S % 2 == 0 else -((S - 1) // 2)
    r = jnp.arange(S, dtype=jnp.float32) + start
    ii = r[None, :, None]
    jj = r[None, None, :]
    return (basis_a[:, None, None] * ii + basis_b[:, None, None] * jj
            + origin[:, None, None])


@partial(jax.jit, static_argnames=("order", "D", "H", "W", "slice_width"))
def _extract_oriented(packed, basis_a, basis_b, origin, order, D, H, W,
                      slice_width):
    """Build the grid on device and extract — avoids uploading megabytes of
    precomputed coordinates per slice; the host ships only 9 floats."""
    coords = _oriented_coords(basis_a, basis_b, origin, slice_width)
    return _extract(packed, coords, order, D, H, W)


@partial(jax.jit, static_argnames=("order", "D", "H", "W", "slice_width",
                                   "as_uint8"))
def _extract_oriented_batch(packed, basis_a, basis_b, origin, order, D, H, W,
                            slice_width, as_uint8=False):
    """K oriented slices in ONE device program: basis/origin are (K,3).

    This is the batched reslice-sampling path (reference loader.py:48-82 does
    host bbox reads + one scipy call per slice x3 volumes; here K slices of a
    volume cost one gather dispatch)."""
    def one(a, b, o):
        coords = _oriented_coords(a, b, o, slice_width)
        return _extract(packed, coords, order, D, H, W)

    out = jax.vmap(one)(basis_a, basis_b, origin)
    if as_uint8:
        out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out


class PackedVolume:
    """Device-resident packed volume for repeated fast slice extraction.

    A (D,H,W,C) volume packs one table per channel; every extraction then
    returns a trailing channel axis ((..., C))."""

    def __init__(self, volume):
        self.shape = tuple(int(s) for s in volume.shape[:3])
        self.channels = (int(volume.shape[3])
                         if getattr(volume, "ndim", len(volume.shape)) == 4
                         else None)
        self.packed = pack_volume(volume)
        self.packed.block_until_ready()

    def extract(self, coords, order: int = 1) -> jax.Array:
        """coords (3, ...) float32 -> (...) float32, scipy-parity cval=0."""
        D, H, W = self.shape
        return _extract(self.packed, jnp.asarray(coords, jnp.float32),
                        order, D, H, W)

    def extract_oriented(self, basis_a, basis_b, origin, slice_width: int,
                         order: int = 1) -> jax.Array:
        """Oriented-plane extraction with on-device grid construction."""
        D, H, W = self.shape
        return _extract_oriented(
            self.packed,
            jnp.asarray(basis_a, jnp.float32),
            jnp.asarray(basis_b, jnp.float32),
            jnp.asarray(origin, jnp.float32),
            order, D, H, W, int(slice_width))

    def extract_oriented_batch(self, basis_a, basis_b, origin,
                               slice_width: int, order: int = 1,
                               as_uint8: bool = False) -> jax.Array:
        """(K,3) basis/origin stacks -> (K,S,S) slices in one dispatch."""
        D, H, W = self.shape
        return _extract_oriented_batch(
            self.packed,
            jnp.asarray(basis_a, jnp.float32),
            jnp.asarray(basis_b, jnp.float32),
            jnp.asarray(origin, jnp.float32),
            order, D, H, W, int(slice_width), as_uint8)

    def extract_slicer(self, slicer, axis: int = 0, slice_width: int = 256,
                       order: int = 1, as_uint8: bool = False) -> jax.Array:
        """Extract using a Slicer's current frame (axis convention of
        slicer.get_interpolation_coords: 0->(v,w), 1->(u,w), 2->(u,v)).

        ``as_uint8`` rounds on device (scipy casts interpolated values back
        to the uint8 input dtype the same way) — and ships 4x fewer bytes."""
        pairs = ((slicer.v, slicer.w), (slicer.u, slicer.w), (slicer.u, slicer.v))
        a, b = pairs[axis]
        out = self.extract_oriented(a, b, slicer.origin, slice_width, order)
        if as_uint8:
            out = _round_u8(out)
        return out


@jax.jit
def _round_u8(x):
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
