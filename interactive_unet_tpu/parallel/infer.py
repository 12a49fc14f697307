"""Mesh-sharded full-volume inference.

The reference's multi-GPU inference is a dead commented sketch (one block per
GPU via torch.multiprocessing, predict.py:137-147, 204-232).  The TPU-native
equivalent shards the per-block 2.5D slice batches across the ``data`` mesh
axis: the block lives replicated in HBM, each sweep's (batch, S, S, 1) slab
is sharding-constrained, and GSPMD splits the conv forward across chips with
no host involvement.  Blending/accumulation stays identical to the
single-chip path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh import batch_sharding, replicated


def make_sharded_block_predictor(model, params, input_size: int,
                                 num_classes: int, mesh,
                                 batch_size: int | None = None,
                                 axes=(0, 1, 2), window=None):
    """Returns (fn: (S,S,S) block -> (S,S,S,C) windowed 2.5D prediction, bs).

    ``batch_size`` defaults to one slice per device per step times 8 —
    and is rounded to divide input_size."""
    S = input_size
    n_dev = mesh.devices.size
    bs = batch_size or max(n_dev, min(S, 8 * n_dev))
    while S % bs:
        bs -= 1
    if bs % n_dev:
        # keep per-device batch equal; fall back to n_dev divisor
        bs = n_dev if S % n_dev == 0 else 1

    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    window_d = jnp.asarray(window)[..., None] if window is not None else None

    def sweep(p, vol):
        def body(i, acc):
            sl = jax.lax.dynamic_slice_in_dim(vol, i * bs, bs, 0)
            sl = jax.lax.with_sharding_constraint(sl, bsh)
            pred = model.apply(p, sl)
            return jax.lax.dynamic_update_slice_in_dim(acc, pred, i * bs, 0)

        acc = jnp.zeros((S, S, S, num_classes), jnp.float32)
        return jax.lax.fori_loop(0, S // bs, body, acc)

    def predict_block(p, block_u8):
        # same wire contract as the single-chip path: uint8 in, float16 out
        block = block_u8.astype(jnp.float32) / 255.0
        if block.ndim == 3:
            block = block[..., None]
        acc = jnp.zeros((S, S, S, num_classes), jnp.float32)
        if 0 in axes:
            acc = acc + sweep(p, block)
        if 1 in axes:
            acc = acc + sweep(p, block.transpose(1, 0, 2, 3)
                              ).transpose(1, 0, 2, 3)
        if 2 in axes:
            acc = acc + sweep(p, block.transpose(2, 0, 1, 3)
                              ).transpose(1, 2, 0, 3)
        acc = acc / len(axes)
        if window_d is not None:
            acc = acc * window_d
        return acc.astype(jnp.float16)

    fn = jax.jit(predict_block, in_shardings=(rep, rep))
    params_r = jax.device_put(params, rep)
    return (lambda block: fn(params_r,
                             jax.device_put(jnp.asarray(block, jnp.uint8),
                                            rep)),
            bs)
