"""Mesh-sharded full-volume inference.

The reference's multi-GPU inference is a dead commented sketch (one block per
GPU via torch.multiprocessing, predict.py:137-147, 204-232).  The TPU-native
equivalent shards the per-block 2.5D slice batches across the ``data`` mesh
axis: the block lives replicated in HBM, each sweep's (batch, S, S, C) slab
is sharding-constrained, and GSPMD splits the conv forward across chips with
no host involvement.  The block function itself is the single-chip one
(engine.predict.make_block_predict_fn) with a sharding slice-hook — one body,
two placements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..engine.predict import make_block_predict_fn
from .mesh import batch_sharding, replicated


def make_sharded_block_predictor(model, params, input_size: int,
                                 num_classes: int, mesh,
                                 batch_size: int | None = None,
                                 axes=(0, 1, 2), window=None):
    """Returns (fn: (S,S,S[,C]) block -> (S,S,S,classes) windowed 2.5D
    prediction, bs).

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

    predict_block = make_block_predict_fn(
        model, S, num_classes, bs, axes, window,
        slice_hook=lambda sl: jax.lax.with_sharding_constraint(sl, bsh))

    fn = jax.jit(predict_block, in_shardings=(rep, rep))
    params_r = jax.device_put(params, rep)
    return (lambda block: fn(params_r,
                             jax.device_put(jnp.asarray(block, jnp.uint8),
                                            rep)),
            bs)
