"""Sharded training step: batch-DP (+ optional spatial sharding) under jit.

Params/opt-state are replicated, batches are sharded; XLA's GSPMD partitioner
emits the psum gradient all-reduce over ICI.  This is the mesh-aware twin of
engine.trainer.make_train_step — one code path for 1..N chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..ops import augment as aug
from ..ops import metrics as M
from .mesh import batch_sharding, replicated

AXES = (0, 1, 2)


def make_sharded_train_step(model, loss_fn, optimizer, mesh):
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def step(params, opt_state, key, x, y, w):
        xa, ya, wa = aug.augment_batch(key, x, y, w)

        def lfn(p):
            pred = model.apply(p, xa)
            return loss_fn(pred, ya, wa, AXES), pred

        (loss, pred), grads = jax.value_and_grad(lfn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        yr, pr = jnp.round(ya), jnp.round(pred)
        metrics = {
            "Dice": M.dice(pr, yr, wa, AXES),
            "IoU": M.iou(pr, yr, wa, AXES),
            "MCC": M.mcc(pr, yr, wa, AXES),
        }
        return params, opt_state, loss, metrics

    return jax.jit(
        step,
        in_shardings=(rep, rep, None, bsh, bsh, bsh),
        out_shardings=(rep, rep, None, None),
        donate_argnums=(0, 1),
    )
