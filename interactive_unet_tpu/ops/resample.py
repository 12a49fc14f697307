"""Device-side coordinate resampling — the framework's north-star kernel.

Replaces ``scipy.ndimage.map_coordinates`` (reference slicer.py:224,
annotator.py:267) with jit-compiled XLA gathers.  Exact parity semantics for
``mode='constant', cval=0`` at spline orders 0 and 1 (verified empirically
against scipy and enforced by tests):

- A sample whose coordinate is outside ``[0, size-1]`` on *any* axis yields
  ``cval`` outright — scipy does no partial interpolation with cval.
- order=0 rounds half-up: ``index = floor(x + 0.5)``.
- order=1 is plain trilinear inside the valid region.
- Integer input dtypes round-trip through float32 with round-half-even on the
  way back (matching scipy's cast).

TPU-first design
----------------
The volume block is treated as a **flat HBM buffer plus dynamic strides**.
All index arithmetic is done on flat int32 offsets, so the whole sample is a
single 1-D gather (8 gathers for trilinear) — the layout XLA lowers best on
TPU.  Because strides/extents are *traced scalars*, one compilation serves
every block whose padded flat length falls in the same power-of-two bucket:
arbitrarily-shaped zarr bounding boxes never retrace (SURVEY hard part #2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_back(values, dtype):
    """Cast interpolated float32 back to the input dtype like scipy does."""
    if jnp.issubdtype(dtype, jnp.integer):
        info = jnp.iinfo(dtype)
        return jnp.clip(jnp.round(values), info.min, info.max).astype(dtype)
    return values.astype(dtype)


@partial(jax.jit, static_argnames=("order",))
def _resample3d_flat(flat, shape_dyn, coords, order):
    """Core gather: flat (padded 1-D) volume + dynamic (3,) extents.

    flat      : (L,) float32 — row-major volume data, L may exceed prod(shape)
    shape_dyn : (3,) int32   — actual extents (traced, no retrace on change)
    coords    : (3, ...) float32 sample coordinates
    returns   : (...) float32 with cval=0 outside
    """
    D = shape_dyn[0]
    H = shape_dyn[1]
    W = shape_dyn[2]
    x, y, z = coords[0], coords[1], coords[2]

    valid = (
        (x >= 0) & (x <= (D - 1).astype(jnp.float32))
        & (y >= 0) & (y <= (H - 1).astype(jnp.float32))
        & (z >= 0) & (z <= (W - 1).astype(jnp.float32))
    )

    sy = W            # stride of axis 1
    sx = H * W        # stride of axis 0

    if order == 0:
        xi = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, D - 1)
        yi = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, H - 1)
        zi = jnp.clip(jnp.floor(z + 0.5).astype(jnp.int32), 0, W - 1)
        vals = flat[xi * sx + yi * sy + zi]
    else:
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, jnp.maximum(D - 2, 0))
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, jnp.maximum(H - 2, 0))
        z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, jnp.maximum(W - 2, 0))
        fx = x - x0.astype(jnp.float32)
        fy = y - y0.astype(jnp.float32)
        fz = z - z0.astype(jnp.float32)
        x1 = jnp.minimum(x0 + 1, D - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        z1 = jnp.minimum(z0 + 1, W - 1)

        b000 = x0 * sx + y0 * sy
        b010 = x0 * sx + y1 * sy
        b100 = x1 * sx + y0 * sy
        b110 = x1 * sx + y1 * sy

        c00 = flat[b000 + z0] * (1 - fz) + flat[b000 + z1] * fz
        c01 = flat[b010 + z0] * (1 - fz) + flat[b010 + z1] * fz
        c10 = flat[b100 + z0] * (1 - fz) + flat[b100 + z1] * fz
        c11 = flat[b110 + z0] * (1 - fz) + flat[b110 + z1] * fz
        c0 = c00 * (1 - fy) + c01 * fy
        c1 = c10 * (1 - fy) + c11 * fy
        vals = c0 * (1 - fx) + c1 * fx

    return jnp.where(valid, vals, 0.0)


def _pow2_bucket(n: int, minimum: int = 4096) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def map_coordinates_3d(volume, coords, order: int = 1):
    """scipy.ndimage.map_coordinates parity for 3-D volumes (orders 0/1).

    ``volume`` may be numpy or jax; output matches input dtype.  Host entry
    point: pads the flat buffer to a pow2 bucket so arbitrary block shapes
    reuse one compilation per bucket.
    """
    vol = np.asarray(volume)
    dtype = vol.dtype
    flat = np.ravel(vol).astype(np.float32)
    bucket = _pow2_bucket(flat.size)
    if bucket != flat.size:
        flat = np.pad(flat, (0, bucket - flat.size))
    shape_dyn = jnp.asarray(vol.shape, dtype=jnp.int32)
    out = _resample3d_flat(jnp.asarray(flat), shape_dyn,
                           jnp.asarray(coords, dtype=jnp.float32), order)
    return np.asarray(_round_back(out, dtype))


def resample3d_device(flat_f32, shape_dyn, coords, order: int = 1):
    """Device-resident variant: flat float32 buffer already on device."""
    return _resample3d_flat(flat_f32, shape_dyn, coords, order)


# ---------------------------------------------------------------------------
# 2-D variant (annotator ROI resample, reference annotator.py:254-271, and
# the fused nearest-affine augmentation pipeline).
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("order",))
def _resample2d_flat(flat, shape_dyn, coords, order):
    H = shape_dyn[0]
    W = shape_dyn[1]
    y, x = coords[0], coords[1]
    valid = (
        (y >= 0) & (y <= (H - 1).astype(jnp.float32))
        & (x >= 0) & (x <= (W - 1).astype(jnp.float32))
    )
    if order == 0:
        yi = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, W - 1)
        vals = flat[yi * W + xi]
    else:
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, jnp.maximum(H - 2, 0))
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, jnp.maximum(W - 2, 0))
        fy = y - y0.astype(jnp.float32)
        fx = x - x0.astype(jnp.float32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        c0 = flat[y0 * W + x0] * (1 - fx) + flat[y0 * W + x1] * fx
        c1 = flat[y1 * W + x0] * (1 - fx) + flat[y1 * W + x1] * fx
        vals = c0 * (1 - fy) + c1 * fy
    return jnp.where(valid, vals, 0.0)


def map_coordinates_2d(image, coords, order: int = 0):
    """scipy parity for 2-D planes (orders 0/1), constant cval=0."""
    img = np.asarray(image)
    dtype = img.dtype
    flat = np.ravel(img).astype(np.float32)
    bucket = _pow2_bucket(flat.size)
    if bucket != flat.size:
        flat = np.pad(flat, (0, bucket - flat.size))
    shape_dyn = jnp.asarray(img.shape, dtype=jnp.int32)
    out = _resample2d_flat(jnp.asarray(flat), shape_dyn,
                           jnp.asarray(coords, dtype=jnp.float32), order)
    return np.asarray(_round_back(out, dtype))
