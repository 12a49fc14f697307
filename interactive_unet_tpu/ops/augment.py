"""Fused on-device augmentation (reference loader.py:125-133 pipeline).

The reference chains torchvision v2 CPU transforms per sample:
HFlip(0.5) -> VFlip(0.5) -> RandomRotation(±360°, NEAREST) ->
RandomResizedCrop(512², scale=(0.3,1), NEAREST).

All four are affine maps, so here they compose into ONE 2x3 affine per sample
and execute as a single nearest-neighbor gather on device, jointly for
image/mask/weight (identical geometry), batched with vmap under jit — zero
host round-trips inside the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _affine_chain(key, h, w):
    """Sample per-example aug params; return the OUTPUT->INPUT coordinate map
    as a 2x2 matrix + offset acting on (y, x) pixel coordinates."""
    k_hf, k_vf, k_rot, k_scale, k_ratio, k_pos = jax.random.split(key, 6)

    # output pixel -> input pixel of the *cropped/resized* stage first;
    # build the inverse chain: out -> crop -> rotate -> flips -> input.

    # RandomResizedCrop: area scale U(0.3, 1), log-uniform aspect in (3/4, 4/3)
    area = jax.random.uniform(k_scale, (), minval=0.3, maxval=1.0) * (h * w)
    log_r = jax.random.uniform(k_ratio, (), minval=jnp.log(3.0 / 4.0),
                               maxval=jnp.log(4.0 / 3.0))
    ratio = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * ratio), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / ratio), 1.0, h)
    ty = jax.random.uniform(k_pos, ()) * (h - ch)
    tx = jax.random.uniform(jax.random.fold_in(k_pos, 1), ()) * (w - cw)
    # output (i,j) in [0,h)x[0,w) -> crop coords
    sy = ch / h
    sx = cw / w

    # rotation about image center, angle U(-360, 360)
    ang = jax.random.uniform(k_rot, (), minval=-360.0, maxval=360.0)
    th = jnp.deg2rad(ang)
    cos, sin = jnp.cos(th), jnp.sin(th)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    # flips
    hflip = jax.random.bernoulli(k_hf)
    vflip = jax.random.bernoulli(k_vf)

    def out2in(py, px):
        # crop/resize stage (nearest): map to crop box
        y = ty + py * sy
        x = tx + px * sx
        # inverse rotation (rotate image by ang == sample input at -ang)
        yr = cy + (y - cy) * cos - (x - cx) * sin
        xr = cx + (y - cy) * sin + (x - cx) * cos
        # flips
        yr = jnp.where(vflip, (h - 1) - yr, yr)
        xr = jnp.where(hflip, (w - 1) - xr, xr)
        return yr, xr

    return out2in


def _nearest_gather(img, yy, xx):
    """img (H,W,C); coords same leading shape; zero outside (constant mode).

    ONE row-gather for all C channels: gather cost on TPU is per-index, so
    packing image/mask/weight channels into the lane dimension makes the
    joint transform ~C times cheaper than per-plane gathers."""
    h, w = img.shape[0], img.shape[1]
    valid = (yy >= -0.5) & (yy < h - 0.5) & (xx >= -0.5) & (xx < w - 0.5)
    yi = jnp.clip(jnp.round(yy).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(xx).astype(jnp.int32), 0, w - 1)
    flat = img.reshape(-1, img.shape[-1])
    out = flat[yi * w + xi]
    return jnp.where(valid[..., None], out, 0.0)


def _augment_one(key, image, mask, weight):
    h, w = image.shape[0], image.shape[1]
    out2in = _affine_chain(key, h, w)
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    yy, xx = out2in(py, px)
    stacked = jnp.concatenate([image, mask, weight], axis=-1)
    out = _nearest_gather(stacked, yy, xx)
    ci, cm = image.shape[-1], mask.shape[-1]
    return out[..., :ci], out[..., ci:ci + cm], out[..., ci + cm:]


@jax.jit
def augment_batch(key, images, masks, weights):
    """Jointly augment a batch: (B,H,W,C*) arrays, per-sample random affines."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(_augment_one)(keys, images, masks, weights)


@jax.jit
def flip_rotate_batch(key, images, masks, weights):
    """Suggestor-grade augmentation: flips + free rotation only (reference
    suggestor.py:76-79 transform chain, no crop)."""

    def one(k, image, mask, weight):
        h, w = image.shape[0], image.shape[1]
        k_hf, k_vf, k_rot = jax.random.split(k, 3)
        ang = jax.random.uniform(k_rot, (), minval=-360.0, maxval=360.0)
        th = jnp.deg2rad(ang)
        cos, sin = jnp.cos(th), jnp.sin(th)
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        hflip = jax.random.bernoulli(k_hf)
        vflip = jax.random.bernoulli(k_vf)
        py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        yy = cy + (py - cy) * cos - (px - cx) * sin
        xx = cx + (py - cy) * sin + (px - cx) * cos
        yy = jnp.where(vflip, (h - 1) - yy, yy)
        xx = jnp.where(hflip, (w - 1) - xx, xx)
        stacked = jnp.concatenate([image, mask, weight], axis=-1)
        out = _nearest_gather(stacked, yy, xx)
        ci, cm = image.shape[-1], mask.shape[-1]
        return out[..., :ci], out[..., ci:ci + cm], out[..., ci + cm:]

    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(one)(keys, images, masks, weights)
